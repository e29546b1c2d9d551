"""Text analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, fingerprinting.

All pure Catalyst (no Python in the hot path): tokenization via split,
set ops via array_intersect/filter, hashing via md5/xxhash64. Each has an
exact ANSI-SQL oracle (see __spark_entry__.oracle_sql). The one exception
is ``subword_token_count`` — a genuinely iterative tokenizer loop, run as
an Arrow-batched pandas UDF with a broadcast vocab and a per-batch memo.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists (heuristic n-gram/stopword language ID)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "los", "que", "y"],
    "fr": ["le", "la", "les", "des", "et", "un"],
    "de": ["der", "die", "das", "und", "ein", "ist"],
}


def tokens_of(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens_of(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count of word pieces + digits + punctuation runs.

    regexp-based segmentation (letters runs, digit runs, single punct),
    the standard cheap stand-in for a real tokenizer when budgeting
    training tokens at corpus scale.
    """
    pieces = F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def load_subword_vocab() -> tuple:
    """The checked-in subword vocabulary (functions/subword_vocab.txt):
    multi-char merges + every [a-z0-9] single char, so greedy matching
    always makes progress on the corpus alphabet."""
    from pathlib import Path

    p = Path(__file__).resolve().parents[1] / "functions" / "subword_vocab.txt"
    return tuple(t for t in p.read_text().splitlines() if t.strip())


def subword_segment_word(word: str, vocab: frozenset, max_len: int) -> list:
    """Greedy longest-prefix-match segmentation of one word — the
    WordPiece/BPE *inference* rule (maximal munch); an out-of-vocabulary
    char consumes itself as one UNK token. The pieces always concatenate
    back to the word (property-tested)."""
    i, n, out = 0, len(word), []
    while i < n:
        for ln in range(min(max_len, n - i), 0, -1):
            if word[i : i + ln] in vocab:
                out.append(word[i : i + ln])
                i += ln
                break
        else:
            out.append(word[i])
            i += 1
    return out


def subword_count_word(word: str, vocab: frozenset, max_len: int) -> int:
    """Segment count of :func:`subword_segment_word` without building the
    list (the hot-path form used inside the pandas UDF)."""
    i, n, c = 0, len(word), 0
    while i < n:
        for ln in range(min(max_len, n - i), 0, -1):
            if word[i : i + ln] in vocab:
                i += ln
                break
        else:
            i += 1
        c += 1
    return c


def subword_token_count(text: Column, vocab: list | None = None) -> Column:
    """REAL subword token count (vs the ``bpe_ish_token_count`` regex
    proxy): lowercase, split on ``[^a-z0-9]+``, then greedy longest-match
    segmentation of each word against a broadcast vocabulary.

    Spark shape: an Arrow-batched pandas UDF (the tokenizer loop is
    genuinely iterative — not expressible as built-in expressions). The
    vocabulary ships in the UDF closure (tiny; for production-size 50k
    vocabs hand it to ``sparkContext.broadcast`` and look it up in the
    UDF). A per-batch word->count memo exploits Zipf repetition, so the
    inner loop runs roughly once per distinct word per batch, not once
    per occurrence. Oracle-checked cross-engine: the DuckDB replica
    (``subword_token_count`` query) re-implements maximal munch as a
    recursive CTE over the same checked-in vocab.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    toks = tuple(vocab) if vocab is not None else load_subword_vocab()
    vs = frozenset(toks)
    ml = max(map(len, toks))
    split_re = re.compile(r"[^a-z0-9]+")

    @pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        cache: dict = {}

        def doc_count(t):
            if t is None:
                return 0
            total = 0
            for w in split_re.split(t.lower()):
                if not w:
                    continue
                c = cache.get(w)
                if c is None:
                    c = subword_count_word(w, vs, ml)
                    cache[w] = c
                total += c
            return total

        return s.map(doc_count)

    return _count(text)


def stopword_score(text: Column, lang: str) -> Column:
    """# tokens that are stopwords of `lang` (vectorized set intersect
    against a literal array — no UDF, no join)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens_of(F.lower(text)), lambda t: F.array_contains(sw, t)))


def language_id(text: Column) -> Column:
    """Argmax of per-language stopword hit counts; 'und' when all zero.

    Deterministic tiebreak: language order en > es > fr > de (first max
    wins).

    Perf shape (r6, replacing the r5 single-``aggregate`` HOF pass): the
    token array is bound ONCE via a single-element transform, each
    language's score is a flat ``size(filter(tokens, contains))`` over
    the BOUND array, and the first-max pick is a when-chain over the
    bound score struct. The r5 accumulator built a 4-int array plus a
    zip_with result array PER TOKEN (all interpreted allocations);
    measured at sf1.0 (50k docs): 2.32s old, 1.64s this form.
    (An anchored ``regexp_count`` per language was also measured — 4.4 to
    5.0s; Java-regex scanning every char position loses to one split +
    set membership.) NULL text scores NULL and falls through to 'und'
    exactly like the old NULL-propagating aggregate.
    """
    langs = list(STOPWORDS)
    sw_arrs = [F.array(*[F.lit(w) for w in STOPWORDS[lang]]) for lang in langs]

    def scores_of(tk):
        return F.struct(
            *[
                F.size(F.filter(tk, lambda x: F.array_contains(sw, x))).alias(
                    f"s{i}"
                )
                for i, sw in enumerate(sw_arrs)
            ]
        )

    def pick_of(s):
        scores = [s[f"s{i}"] for i in range(len(langs))]
        mx = F.greatest(*scores)
        pick = None
        for lang, sc in zip(langs[:-1], scores[:-1]):
            pick = (pick.when if pick is not None else F.when)(sc == mx, F.lit(lang))
        return F.when(mx > 0, pick.otherwise(F.lit(langs[-1]))).otherwise(
            F.lit("und")
        )

    bound_scores = F.get(
        F.transform(F.array(tokens_of(F.lower(text))), scores_of), 0
    )
    return F.get(F.transform(F.array(bound_scores), pick_of), 0)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a single
    [0,1] quality score (monotone, documented formula)."""
    t = F.col(text_col)
    toks = tokens_of(t)
    n_tok = token_count(t)
    n_chars = F.length(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = stopword_score(t, "en")
    mean_tok_len = F.when(n_tok > 0, (F.length(F.regexp_replace(t, r"\s+", ""))) / n_tok)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        n_punct.alias("n_punct"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(quality, 4).alias("quality"),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition filters for training-data quality (the Gopher-rules
    family): documents dominated by repeated lines or n-grams are
    boilerplate/spam and get filtered before training.

    Emitted per doc, all pure Catalyst (array ops over the token list —
    the text never leaves the JVM):
      - ``dup_line_ratio``    1 - distinct_lines / lines
      - ``dup_2gram_ratio``   1 - distinct_2grams / total_2grams
      - ``dup_3gram_ratio``   1 - distinct_3grams / total_3grams

    Ratios are 0 for degenerate inputs (empty text, fewer tokens than n).
    At 100 TB this is a narrow map-only projection: no shuffle, no UDF,
    scan-bound.

    Perf shape (r6): the token and line arrays are bound ONCE through a
    single-element transform and every ``element_at`` in the n-gram
    lambdas indexes the BOUND arrays. Interpreted HOF lambdas re-evaluate
    captured outer expressions per invocation — the r5 form re-ran the
    regex ``split`` for every element of every gram (O(k^2) regex work
    per row; measured 1.9s for 500 docs). ``n - (n-1)`` totals use
    size(toks), which differs from token_count only on blank text where
    both paths yield ratio 0.0 — outputs are value-identical."""
    t = F.col(text_col)
    toks = tokens_of(t)
    lines_arr = F.filter(F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0)

    def build(tk, ln):
        n = F.size(tk)

        def dup_ngram(nn: int) -> Column:
            total = n - (nn - 1)
            grams = F.transform(
                F.sequence(F.lit(1), F.greatest(total, F.lit(0))),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + j) for j in range(nn)]
                ),
            )
            return F.when(
                total > 0, 1 - F.size(F.array_distinct(grams)) / total
            ).otherwise(F.lit(0.0))

        n_lines = F.size(ln)
        dup_line = F.when(
            n_lines > 0,
            1 - F.size(F.array_distinct(ln)) / n_lines,
        ).otherwise(F.lit(0.0))
        return F.struct(
            F.round(dup_line, 4).alias("dup_line_ratio"),
            F.round(dup_ngram(2), 4).alias("dup_2gram_ratio"),
            F.round(dup_ngram(3), 4).alias("dup_3gram_ratio"),
        )

    bound = F.get(
        F.transform(
            F.array(F.struct(toks.alias("tk"), lines_arr.alias("ln"))),
            lambda s: build(s["tk"], s["ln"]),
        ),
        0,
    )
    # two-step select: CollapseProject keeps a multiply-referenced
    # non-trivial alias materialized instead of inlining it three times
    return df.select("*", bound.alias("__rep")).select(
        *df.columns,
        F.col("__rep.dup_line_ratio").alias("dup_line_ratio"),
        F.col("__rep.dup_2gram_ratio").alias("dup_2gram_ratio"),
        F.col("__rep.dup_3gram_ratio").alias("dup_3gram_ratio"),
    )


# PII patterns: kept lookaround-free so the SAME pattern text runs under
# Java regex (Spark) and RE2 (DuckDB oracle). Order matters only for
# overlapping families; these are mutually disjoint shapes (3-2-4 SSN vs
# 3-3-4 phone, dotted IPv4, @-anchored email).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora: replace emails / SSNs / phone
    numbers / IPv4 addresses with typed placeholders (``<EMAIL>`` etc.)
    and count redactions per category — the counts feed corpus-level PII
    rate metrics, the scrubbed text feeds training.

    Pure Catalyst ``regexp_replace``/``regexp_extract_all`` chain: no
    Python touches the text, the plan stays map-only (scan-bound at
    100 TB). Patterns are deliberately conservative (precision over
    recall) and shared with the SQL oracle verbatim."""
    scrubbed = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0)).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return df.select("*", *counts, scrubbed.alias("scrubbed"))


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-doc top-k TF-IDF terms — corpus-level keyword extraction.

    Spark shape (two shuffles, both map-side combined, no UDF):
      1. explode lowercased tokens -> (doc, token) term counts;
      2. document frequency per token (count over distinct doc-token
         pairs, which step 1 already materialized);
      3. idf = ln((N+1)/(df+1)) + 1 (smoothed), tfidf = tf * idf, top-k
         per doc by (tfidf desc, token asc) window rank.

    The token-df join broadcasts when the vocabulary is small; at corpus
    scale it is a shuffle join on the token key — both sides are already
    aggregates, so rows are vocabulary/doc-term sized, never raw text.
    Output keeps integer columns (tf, df) + rank so cross-engine float
    comparison never depends on ln() ulp differences."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens_of(F.lower(F.col(text_col)))).alias("token"),
    ).filter(F.length("token") > 0)
    tf = toks.groupBy("doc", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("doc").alias(id_col), "token", "tf", "df", "rank")
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (Rolling/winnowed variants live in dedup.minhash — this is the exact-
    dup key, cheap enough to compute inline at ingest.)"""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)
