"""Mention / triple extraction from transcript text — the triple factory.

Generalization of the reference's "extract metadata facts from each record"
pattern (/root/reference/utils/model_output_smh.py:65-72 +
/root/reference/utils/jsonld.py:77-108) to free text. The hot path is pure
Catalyst since round 3: anchored patterns via a CASE WHEN rlike chain +
``regexp_extract`` (mutually-exclusive heads), dictionary spotting via
``regexp_extract_all`` + posexplode — everything stays inside whole-stage
codegen, no Python and no Arrow transfer of raw text. The round-2
Arrow-batched pandas implementations are retained (``*_pandas``) as
semantic references pinned by an equivalence test, and as the fallback
shape for patterns Java regex can't express.

Output schema (long form; one row per extracted mention):
    conv_id, turn_idx, kind, f1..f7
kinds:
    round        f1=round_id
    header       f1=model_name f2=version f3=team_abbr f4=model_abbr f5=team_name
    kv           f1=key f2=value            (license/website/funding/...)
    contributor  f1=name f2=email f3=affiliation
    file         f1=filename
    fact         f1=target f2=location f3=age_group f4=output_type
                 f5=scenario f6=origin_date f7=horizon
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smh_to_jsonld_spark.functions import exprcache

MENTION_SCHEMA = (
    "conv_id string, turn_idx int, kind string, f1 string, f2 string,"
    " f3 string, f4 string, f5 string, f6 string, f7 string"
)

_PAT_ROUND = r"^Round (\d{4}-\d{2}-\d{2}) submission session\."
_PAT_HEADER = (
    r"^submitting model (\S+) version (\S+) team_abbr \[([^\]]*)\]"
    r" model_abbr \[([^\]]+)\] from team \[([^\]]+)\]\."
)
_PAT_KV = r"^(license|website|funding|methods_long|methods|data_inputs): (.*)$"
_PAT_CONTRIB = r"^contributor: (.+?) <(.+?)> \((.*)\)$"
_PAT_FILE = r"^uploaded file (\S+)$"
_PAT_FACT = (
    r"^observed target=([^;]+); location=([^;]+); age_group=([^;]+);"
    r" output_type=([^;]+); scenario=([^;]+); origin_date=([^;]+); horizon=(\d+)$"
)

_COLS = ["conv_id", "turn_idx", "kind", "f1", "f2", "f3", "f4", "f5", "f6", "f7"]


def _entity_pattern() -> str:
    """Alternation of location entity names for free-text mention spotting
    (the unanchored scan every turn gets — the north-star 'batched mention
    detection' over chatter, not just structured lines). Longest-first so
    'New Hampshire' beats 'New'."""
    from smh_to_jsonld_spark.functions.dims import fips_rows

    names = sorted({n for _, _, n in fips_rows()}, key=len, reverse=True)
    import re as _re

    return r"\b(" + "|".join(_re.escape(n) for n in names) + r")\b"


# concept vocabulary (targets, diseases) + ISO dates — the other mention
# classes a KG pipeline spots in free text. Longest-first within the
# dictionary so "peak inc hosp" beats "inc hosp".
_CONCEPT_BRANCHES = [
    "peak inc hosp", "inc hosp", "cum hosp", "RSV", "Influenza",
    "hospitalizations?", "surveillance", "calibration", "scenario",
]
# the literal strings the concept branches can match (for classifying
# terms found by the combined single-pass scan)
_CONCEPT_TERMS = frozenset(
    ["peak inc hosp", "inc hosp", "cum hosp", "RSV", "Influenza",
     "hospitalization", "hospitalizations", "surveillance", "calibration",
     "scenario"]
)
_PAT_CONCEPT = r"\b(" + "|".join(_CONCEPT_BRANCHES) + r")\b"
_DATE_BRANCH = r"\d{4}-\d{2}-\d{2}"
_PAT_DATE = r"\b(" + _DATE_BRANCH + r")\b"


def _emit(pdf: pd.DataFrame, mask: pd.Series, groups: pd.DataFrame, kind: str) -> pd.DataFrame:
    """Assemble mention rows for one pattern's matches (whole-batch ops)."""
    hit = groups[mask]
    out = pd.DataFrame(
        {
            "conv_id": pdf.loc[mask, "conv_id"].values,
            "turn_idx": pdf.loc[mask, "turn_idx"].values,
            "kind": kind,
        }
    )
    for i in range(7):
        vals = hit[i].values if i in hit.columns else None
        out[f"f{i + 1}"] = pd.Series(vals, index=out.index, dtype="object")
    return out


# superset alternation of every anchored pattern's head: most transcript
# turns are chatter that can never match any pattern — this cheap anchored
# scan drops them before the (pricier) full-pattern work, and is pushed to
# the parquet scan where the source supports it.
_PREFILTER = (
    r"^(?:Round \d|submitting model |(?:license|website|funding|"
    r"methods_long|methods|data_inputs): |contributor: |uploaded file |"
    r"observed target=)"
)

_ANCHORED = [
    # fact first: heads are mutually exclusive so branch order is
    # semantics-free, and fact lines dominate matched rows in transcript
    # corpora (~10x rounds/headers) — putting them first means the hot
    # rows pay ONE rlike instead of six (r5 perf pass)
    ("fact", _PAT_FACT, 7),
    ("kv", _PAT_KV, 2),
    ("round", _PAT_ROUND, 1),
    ("header", _PAT_HEADER, 5),
    ("contributor", _PAT_CONTRIB, 3),
    ("file", _PAT_FILE, 1),
]


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> STRUCTURED
    mentions (anchored round/header/kv/contributor/file/fact patterns).

    Pure Catalyst (whole-stage codegen, no Python): the six anchored
    patterns have mutually-exclusive heads, so one lazily-evaluated
    CASE WHEN rlike chain picks the (single) matching pattern per turn and
    ``regexp_extract`` pulls its groups — the JVM re-expression of the
    round-2 Arrow ``.str.extract`` pass (kept as
    ``extract_mentions_pandas``; ``test_extract_jvm_matches_pandas`` pins
    row-set equality). A group that matches the empty string yields "" on
    both paths; f-columns beyond a pattern's group count are NULL.

    Free-text dictionary spotting lives in ``spot_mentions`` — a separate
    single-consumer operator so this (multi-consumer, persisted) output
    stays small: structured mentions are ~0.5 rows/turn; spotted mentions
    can be many per turn and would bloat the cache every downstream scan
    pays for.

    Formulation note (measured, r5): a single-regex-pass variant
    (``regexp_replace`` rewriting the match to sentinel-joined groups +
    one ``split``) was benchmarked against the per-group
    ``regexp_extract`` form and LOST (2.0s vs 1.1s at 1.2M turns) —
    Spark's RegExpReplace pays StringBuffer + UTF8String round-trips that
    outweigh re-running the (anchored, cheap) pattern per group, so the
    extract form stays. The measured win was branch ORDER (fact-first,
    see _ANCHORED). The expression tree is memoized (functions.exprcache):
    it is a pure function of the pattern table, and rebuilding it cost
    ~0.25s of py4j round-trips per query.
    """

    def build():
        text = F.col("text")

        def pat_struct(kind: str, pat: str, n_groups: int):
            fields = [F.lit(kind).alias("kind")]
            for i in range(1, 8):
                fields.append(
                    F.regexp_extract(text, pat, i).alias(f"f{i}")
                    if i <= n_groups
                    else F.lit(None).cast("string").alias(f"f{i}")
                )
            return F.struct(*fields)

        mention = None
        for kind, pat, n in _ANCHORED:
            branch = (mention.when if mention is not None else F.when)(
                text.rlike(pat), pat_struct(kind, pat, n)
            )
            mention = branch
        out_cols = (
            F.col("conv_id"), F.col("turn_idx"), F.col("m.kind").alias("kind"),
            *[F.col(f"m.f{i}").alias(f"f{i}") for i in range(1, 8)],
        )
        return text.rlike(_PREFILTER), mention.alias("m"), out_cols

    prefilter, mention_m, out_cols = exprcache.memo("extract.mentions", build)
    return (
        transcripts.select("conv_id", "turn_idx", "text")
        .filter(prefilter)
        .select("conv_id", "turn_idx", mention_m)
        .filter(F.col("m").isNotNull())
        .select(*out_cols)
    )


def extract_mentions_pandas(transcripts: DataFrame) -> DataFrame:
    """Arrow-batched reference implementation of ``extract_mentions``
    (round-2's hot path): vectorized pandas ``.str.extract`` per pattern
    over each batch. Retained to pin the Catalyst version's semantics
    (equivalence test) and as the fallback shape for patterns a future
    dialect can't express in Java regex."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            text = pdf["text"].astype("string")
            frames = []
            for kind, pat, _n in _ANCHORED:
                groups = text.str.extract(pat)  # vectorized over the batch
                mask = groups[0].notna()
                if mask.any():
                    frames.append(_emit(pdf, mask, groups, kind))
            if frames:
                yield pd.concat(frames, ignore_index=True)[_COLS]
            else:
                yield pd.DataFrame(columns=_COLS)

    return transcripts.select("conv_id", "turn_idx", "text").filter(
        F.col("text").rlike(_PREFILTER)
    ).mapInPandas(
        gen, schema=MENTION_SCHEMA
    )


SPOTTED_SCHEMA = "conv_id string, turn_idx int, kind string, term string"


def _spot_patterns() -> list:
    return [
        ("entity", _entity_pattern()),
        ("concept", _PAT_CONCEPT),
        ("date", _PAT_DATE),
    ]


def _spot_combined_pattern() -> str:
    """ONE regex for all three dictionaries, with a first-char lookahead
    guard.

    Equivalence precondition (holds for these dictionaries, asserted
    below): no term of one dictionary can overlap a match of another in
    text (entities are capitalized proper names, concepts lowercase/known
    literals, dates all digits; no shared prefixes), so a single
    left-to-right scan finds exactly the union of the three per-dictionary
    scans. Within a dictionary, branch order (longest-first) is preserved.

    The `(?=[...])` guard is the speed lever: java.util.regex tries
    alternation branches sequentially at every position, so the naive
    ~70-branch union costs ~70 first-char tests per input char; the
    lookahead character class rejects non-starting positions in ONE test.
    """
    from smh_to_jsonld_spark.functions.dims import fips_rows

    import re as _re

    names = sorted({n for _, _, n in fips_rows()}, key=len, reverse=True)
    # Single-scan equivalence needs more than exact-term disjointness: a
    # term of one dictionary appearing INSIDE (or as a prefix of) a term
    # of another would let the combined left-to-right scan consume text a
    # per-dictionary scan would have matched differently. Assert the
    # strong form: no cross-dictionary substring containment, no digits
    # in entity/concept terms (digits are the date dictionary's alphabet),
    # and spot-classification unambiguity (no entity name IS a concept
    # literal or date-shaped).
    for n in names:
        assert not any(ch.isdigit() for ch in n), f"entity name has digit: {n!r}"
        for t in _CONCEPT_TERMS:
            assert t not in n and n not in t, (
                f"cross-dictionary overlap: entity {n!r} vs concept {t!r}"
            )
    for t in _CONCEPT_TERMS:
        assert not any(ch.isdigit() for ch in t), f"concept term has digit: {t!r}"
    branches = [_re.escape(n) for n in names] + _CONCEPT_BRANCHES + [_DATE_BRANCH]
    firsts = {n[0] for n in names} | {t[0] for t in _CONCEPT_TERMS} | set("0123456789")
    # chars special inside a [] class would corrupt the lookahead guard if
    # a future dictionary starts a term with one — escape, don't hope
    cls = "".join(
        ("\\" + ch) if ch in r"\^]-[" else ch for ch in sorted(firsts)
    )
    return r"\b(?=[" + cls + r"])(" + "|".join(branches) + r")\b"


def spot_mentions(transcripts: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """Unanchored dictionary mention spotting over the FULL text of every
    turn: location entities, concept vocabulary, ISO dates — one row per
    occurrence. This is the hot scan at transcript scale (every byte of
    every turn).

    Pure Catalyst, single pass: ONE ``regexp_extract_all`` with the
    combined lookahead-guarded pattern (compiled once, whole-stage
    codegen), one explode, then each term is classified back to its
    dictionary (date by shape, concept by literal membership, else
    entity) — no Arrow transfer of the raw text, and the text is scanned
    once instead of once per dictionary. The pandas variant
    (``spot_mentions_pandas``) is the semantic reference;
    ``test_extract_jvm_matches_pandas`` pins bag equality.

    ``passthrough``: extra input columns carried onto every emitted
    mention row (e.g. ``("ts",)`` so a streaming consumer can window on
    event time). Stateless, so the operator is stream-safe as-is."""
    def build():
        t = F.regexp_extract_all(
            F.col("text"), F.lit(_spot_combined_pattern()), F.lit(1)
        )
        concept_lits = F.array(*[F.lit(x) for x in sorted(_CONCEPT_TERMS)])
        k = (
            F.when(F.col("term").rlike(r"^\d{4}-\d{2}-\d{2}$"), F.lit("date"))
            .when(F.array_contains(concept_lits, F.col("term")), F.lit("concept"))
            .otherwise(F.lit("entity"))
        )
        return t, k

    terms, kind = exprcache.memo("extract.spot", build)
    extra = list(passthrough)
    return (
        transcripts.select(
            "conv_id", "turn_idx", *extra, F.explode(terms).alias("term")
        )
        .select("conv_id", "turn_idx", *extra, kind.alias("kind"), "term")
    )


def spot_mentions_pandas(transcripts: DataFrame) -> DataFrame:
    """Arrow-batched reference implementation of ``spot_mentions``:
    vectorized ``.str.findall`` per Arrow batch (round-2's hot path)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pats = _spot_patterns()
        cols = ["conv_id", "turn_idx", "kind", "term"]
        for pdf in batches:
            text = pdf["text"].astype("string")
            frames = []
            for kind, pat in pats:
                hits = text.str.findall(pat)
                n = hits.str.len().fillna(0).astype(int)
                mask = n > 0
                if mask.any():
                    frames.append(
                        pd.DataFrame(
                            {
                                "conv_id": pdf.loc[mask, "conv_id"].repeat(n[mask]).values,
                                "turn_idx": pdf.loc[mask, "turn_idx"].repeat(n[mask]).values,
                                "kind": kind,
                                "term": [m for row in hits[mask] for m in row],
                            }
                        )
                    )
            yield (
                pd.concat(frames, ignore_index=True)[cols]
                if frames
                else pd.DataFrame(columns=cols)
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        gen, schema=SPOTTED_SCHEMA
    )


_CONV_DIM_COLS = [
    "conv_id", "round_id", "model_name", "model_version", "team_abbr",
    "model_abbr", "team_name",
]


def conversation_dim(mentions: DataFrame) -> DataFrame:
    """Per-conversation identity: round_id + model header fields.

    One hash agg over the (small-per-conv) header/round mentions only —
    filtered BEFORE the shuffle so fact mentions never move here.
    """
    headers = mentions.filter(F.col("kind").isin("round", "header"))
    return headers.groupBy("conv_id").agg(
        F.first(F.when(F.col("kind") == "round", F.col("f1")), ignorenulls=True).alias(
            "round_id"
        ),
        F.first(F.when(F.col("kind") == "header", F.col("f1")), ignorenulls=True).alias(
            "model_name"
        ),
        F.first(F.when(F.col("kind") == "header", F.col("f2")), ignorenulls=True).alias(
            "model_version"
        ),
        F.first(F.when(F.col("kind") == "header", F.col("f3")), ignorenulls=True).alias(
            "team_abbr"
        ),
        F.first(F.when(F.col("kind") == "header", F.col("f4")), ignorenulls=True).alias(
            "model_abbr"
        ),
        F.first(F.when(F.col("kind") == "header", F.col("f5")), ignorenulls=True).alias(
            "team_name"
        ),
    )


def conversation_wide(mentions: DataFrame) -> DataFrame:
    """ALL conversation-level aggregates in ONE shuffle (r5 perf pass):
    the header identity (= ``conversation_dim``), the kv metadata fields,
    and the turn-ordered contributor list.

    The factory previously paid three separate groupBy(conv_id) passes
    over the mention table (conversation_dim for facts, kv_wide + contribs
    for metadata); at transcript scale each pass shuffles the full
    conv-keyed mention set. Merging them is semantics-free because every
    per-kind aggregation is already NULL-guarded by kind:
    - first(when(kind=...), ignorenulls) sees exactly the rows the
      kind-filtered variant saw;
    - collect_list skips NULLs, so the contributor list collects exactly
      the contributor mentions; an empty result is normalized to NULL to
      match the filtered-groupBy + left-join shape it replaces.
    File mentions ride along too (turn-ordered filename array, exploded
    back by ``files_from_conv_wide``) — they are conversation-level and
    collecting them here saves the file-histogram branch its own full
    mention-cache scan + conv join. Fact mentions contribute nothing but
    shuffle bytes — they are filtered out BEFORE the exchange.

    The filter + aggregate expression list is memoized (exprcache) — a
    pure function of the kind/kv tables, ~0.2s of py4j build per query.
    """
    pre, aggs = exprcache.memo("extract.conv_wide", _build_conv_wide_exprs)
    return mentions.filter(pre).groupBy("conv_id").agg(*aggs)


def _build_conv_wide_exprs():
    kv_aggs = [
        F.first(
            F.when((F.col("kind") == "kv") & (F.col("f1") == src), F.col("f2")),
            ignorenulls=True,
        ).alias(dst)
        for src, dst in _KV_FIELDS.items()
    ]
    contrib_list = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("kind") == "contributor",
                    F.struct(
                        F.col("turn_idx").alias("k"),
                        F.struct(
                            F.col("f1").alias("name"),
                            F.when(F.length("f3") > 0, F.col("f3")).alias(
                                "affiliation"
                            ),
                            F.col("f2").alias("email"),
                        ).alias("v"),
                    ),
                )
            ),
            lambda l, r: F.when(l["k"] < r["k"], -1)
            .when(l["k"] > r["k"], 1)
            .otherwise(0),
        ),
        lambda x: x["v"],
    )
    file_list = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("kind") == "file",
                    F.struct(F.col("turn_idx").alias("k"), F.col("f1").alias("v")),
                )
            )
        ),
        lambda x: x["v"],
    )
    pre = F.col("kind").isin("round", "header", "kv", "contributor", "file")
    aggs = (
        F.first(
            F.when(F.col("kind") == "round", F.col("f1")), ignorenulls=True
        ).alias("round_id"),
        F.first(
            F.when(F.col("kind") == "header", F.col("f1")), ignorenulls=True
        ).alias("model_name"),
        F.first(
            F.when(F.col("kind") == "header", F.col("f2")), ignorenulls=True
        ).alias("model_version"),
        F.first(
            F.when(F.col("kind") == "header", F.col("f3")), ignorenulls=True
        ).alias("team_abbr"),
        F.first(
            F.when(F.col("kind") == "header", F.col("f4")), ignorenulls=True
        ).alias("model_abbr"),
        F.first(
            F.when(F.col("kind") == "header", F.col("f5")), ignorenulls=True
        ).alias("team_name"),
        *kv_aggs,
        F.when(F.size(contrib_list) > 0, contrib_list).alias(
            "model_contributors"
        ),
        file_list.alias("file_names"),
    )
    return pre, aggs


_KV_FIELDS = {
    "license": "license",
    "website": "website_url",
    "funding": "team_funding",
    "methods": "methods",
    "methods_long": "methods_long",
    "data_inputs": "data_inputs",
}


_METADATA_COLS = [
    "round_id", "model_name", "team_abbr", "model_abbr", "team_name",
    "model_version", "license", "website_url", "methods", "methods_long",
    "data_inputs", "team_funding", "model_contributors",
]


def conv_dim_from_wide(conv_wide: DataFrame) -> DataFrame:
    """Slice ``conversation_wide`` output down to ``conversation_dim``'s
    schema AND membership: the old dim only contained conversations with
    at least one round/header mention (its groupBy ran over those kinds),
    which is exactly the rows where round_id or model_name resolved
    (both patterns' first groups are non-empty by construction)."""
    return conv_wide.filter(
        F.col("round_id").isNotNull() | F.col("model_name").isNotNull()
    ).select(*_CONV_DIM_COLS)


def metadata_from_conv_wide(conv_wide: DataFrame) -> DataFrame:
    """Model-metadata dimension off the one-shuffle ``conversation_wide``
    aggregate — same output as ``metadata_from_mentions`` (pinned by
    ``test_metadata_wide_equals_mentions_path``) without its two extra
    groupBy(conv_id) passes + left joins.

    Winner selection is unchanged: one metadata row per (round, model),
    first conversation (min conv_id) wins via a partial-aggregatable min +
    broadcast semi-join — no row_number window, no hot-key reducer.
    """
    winners = (
        conv_dim_from_wide(conv_wide)
        .groupBy("round_id", "model_name")
        .agg(F.min("conv_id").alias("conv_id"))
    )
    return conv_wide.join(
        F.broadcast(winners.select("conv_id")), "conv_id", "left_semi"
    ).select(*_METADATA_COLS)


def metadata_from_mentions(mentions: DataFrame, conv_dim: DataFrame) -> DataFrame:
    """Reconstruct the model-metadata dimension from kv/contributor mentions.

    Matches sources.synth.METADATA_SCHEMA so the hub pipeline is reusable
    unchanged. Contributor order is preserved by turn_idx (the stable
    (conv_id, turn_idx) ordering invariant).

    This is the three-shuffle semantic reference; the hot path uses
    ``metadata_from_conv_wide`` (one shared conv-level shuffle), pinned
    equal by test.
    """
    kv = mentions.filter(F.col("kind") == "kv")
    kv_aggs = [
        F.first(F.when(F.col("f1") == src, F.col("f2")), ignorenulls=True).alias(dst)
        for src, dst in _KV_FIELDS.items()
    ]
    kv_wide = kv.groupBy("conv_id").agg(*kv_aggs)

    contribs = (
        mentions.filter(F.col("kind") == "contributor")
        .groupBy("conv_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("turn_idx").alias("k"),
                            F.struct(
                                F.col("f1").alias("name"),
                                # '()' verbalizes a missing affiliation
                                F.when(F.length("f3") > 0, F.col("f3")).alias(
                                    "affiliation"
                                ),
                                F.col("f2").alias("email"),
                            ).alias("v"),
                        )
                    ),
                    lambda l, r: F.when(l["k"] < r["k"], -1)
                    .when(l["k"] > r["k"], 1)
                    .otherwise(0),
                ),
                lambda x: x["v"],
            ).alias("model_contributors")
        )
    )

    # one metadata row per (round, model) — first conversation wins (A7),
    # deterministically by conv_id. Without this, a corpus with many
    # conversations per model (the at-scale shape) emits one DUPLICATE
    # model doc per conversation: hasPart explodes and the consolidated
    # doc goes quadratic. The fixture corpus (1 conv per model) never
    # exposed it.
    #
    # Winner selection is a partial-aggregatable min + broadcast semi-join,
    # NOT a row_number window: a window partitioned by (round, model)
    # funnels EVERY conversation of a model through one reducer — the
    # classic hot-key skew at 10^9 conversations x 10^2 models — while
    # min(conv_id) combines map-side and the winner set is models-sized.
    winners = conv_dim.groupBy("round_id", "model_name").agg(
        F.min("conv_id").alias("conv_id")
    )
    per_conv = (
        conv_dim.join(F.broadcast(winners.select("conv_id")), "conv_id", "left_semi")
        .join(kv_wide, "conv_id", "left")
        .join(contribs, "conv_id", "left")
    )
    return (
        per_conv
        .select(
            "round_id",
            "model_name",
            "team_abbr",
            "model_abbr",
            "team_name",
            "model_version",
            "license",
            "website_url",
            "methods",
            "methods_long",
            "data_inputs",
            "team_funding",
            "model_contributors",
        )
    )


def facts_from_mentions(mentions: DataFrame, conv_dim: DataFrame) -> DataFrame:
    """Fact mentions -> raw fact rows (location still a surface form —
    entity linking happens downstream in operators.link)."""
    facts = mentions.filter(F.col("kind") == "fact")
    cols = exprcache.memo(
        "extract.fact_cols",
        lambda: (
            F.col("round_id"),
            F.col("model_name").alias("model_id"),
            # stable (conv_id, turn_idx) order carried so downstream
            # distinct lists can replicate the reference's
            # first-appearance ordering
            F.struct(F.col("conv_id"), F.col("turn_idx")).alias("turn_order"),
            F.to_date("f6").alias("origin_date"),
            F.col("f5").alias("scenario_id"),
            F.col("f2").alias("location_surface"),
            F.col("f3").alias("age_group"),
            F.col("f1").alias("target"),
            F.col("f7").cast("int").alias("horizon"),
            F.col("f4").alias("output_type"),
            F.lit(None).cast("double").alias("value"),
        ),
    )
    return facts.join(
        conv_dim.select("conv_id", "round_id", "model_name"), "conv_id"
    ).select(*cols)


def files_from_mentions(mentions: DataFrame, conv_dim: DataFrame) -> DataFrame:
    return (
        mentions.filter(F.col("kind") == "file")
        .join(conv_dim.select("conv_id", "round_id", "model_name"), "conv_id")
        .select("round_id", F.col("model_name").alias("model_id"), F.col("f1").alias("filename"))
    )


def files_from_conv_wide(conv_wide: DataFrame) -> DataFrame:
    """File rows off the conv_wide filename arrays — same rows (incl.
    duplicates) as ``files_from_mentions`` (pinned by
    ``test_files_wide_equals_mentions_path``) with no extra mention scan:
    the inner conv_dim join there keeps exactly the round/header-bearing
    conversations, i.e. ``conv_dim_from_wide`` membership here."""
    return (
        conv_wide.filter(
            F.col("round_id").isNotNull() | F.col("model_name").isNotNull()
        )
        .select(
            "round_id",
            F.col("model_name").alias("model_id"),
            F.explode("file_names").alias("filename"),
        )
    )
