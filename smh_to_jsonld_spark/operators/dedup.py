"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (the whole point of these):
- exact dedup is ONE shuffle on a hash key (never on raw text: we group on
  md5(text) so the shuffle moves 16 bytes, not documents).
- MinHash LSH: signature computation is embarrassingly parallel (pure
  Catalyst xxhash64 over shingles, k hash functions = k literal seeds);
  candidate generation is an equi-join on (band, band_hash) buckets so the
  self-join is blocked, never O(n^2). Verification re-computes exact
  Jaccard only for candidates.
- SimHash: 64-bit signature entirely in Catalyst (explode tokens ->
  md5-low64 -> 64 flat bit-sum aggregates, map-side combined); near-dup =
  hamming distance <= d on pigeonhole-blocked candidates. md5 (not
  xxhash64) so DuckDB's md5_number_upper can independently recompute the
  signatures for the correctness oracle.
- embedding near-dup: (k, L) random-hyperplane LSH tables (seeded,
  deterministic), capped single-pass bucket expansion, exact cosine
  verification.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smh_to_jsonld_spark.operators.textstats import fingerprint, tokens_of


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of every identical-text group.

    Shuffles md5 keys, not text. Returns the kept rows plus `dup_count`.
    """
    keyed = df.withColumn("__fp", fingerprint(F.col(text_col)))
    groups = keyed.groupBy("__fp").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count")
    )
    return (
        keyed.join(groups, "__fp")
        .filter(F.col(id_col) == F.col("keep_id"))
        .drop("__fp", "keep_id")
    )


# ---------------------------------------------------------------------------
# token shingles + exact n-gram Jaccard (verification primitive)
# ---------------------------------------------------------------------------

def shingles(text_col, n: int = 3):
    """Array of n-token shingles (distinct), pure Catalyst.

    Perf shape (r6): higher-order-function lambdas are interpreted and
    break whole-stage codegen; worse, when a consumer explodes this
    array, the optimizer infers a ``size(sh) > 0`` predicate and pushes
    the WHOLE expression into the scan-side Filter, where codegen's
    subexpression elimination evaluates it EAGERLY for every input row —
    before any cheap pushed filter short-circuits (measured: the
    jaccard_pairs bench query spent 29.5 of 30.1s evaluating shingles of
    unfiltered rows at sf1.0). Therefore:
    - n=1 is EXACTLY ``array_distinct(tokens)`` (token order preserved,
      first occurrence kept; split never yields NULL elements and
      returns [""] for empty text, so the k<=0 branch was unreachable) —
      pure codegen, fuses into the scan stage.
    - n>1 binds the token array ONCE through a single-element transform
      (the lambda variable is the binder), so the per-element lambda
      indexes a bound array instead of re-evaluating the regex split per
      element (interpreted HOFs do no common-subexpression elimination
      across lambda invocations — an O(k^2) regex blowup).
    Both forms produce bit-identical arrays to the r5 originals.
    """
    toks = tokens_of(F.lower(text_col))
    if n == 1:
        return F.array_distinct(toks)

    def sh_of(tk):
        k = F.size(tk) - (n - 1)
        return F.when(k <= 0, F.array(F.concat_ws(" ", tk))).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), k),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(tk, i + j) for j in range(n)]
                    ),
                )
            )
        )

    return F.get(F.transform(F.array(toks), sh_of), 0)


_PAIR_EXPAND_CHUNK = 128


def _bucket_pairs(keyed: DataFrame, bucket_cols: list, max_bucket: int | None,
                  chunk: int = _PAIR_EXPAND_CHUNK, with_sz: bool = True):
    """Shared candidate-pair generator: group rows into buckets, emit all
    ordered (id_a < id_b) pairs per bucket IN ONE PASS (collect_list +
    nested-lambda pair expansion). Compared to a bucket self-join this
    halves the upstream computation (a self-join recomputes the bucket
    input for each side) and gives a natural place to drop stop buckets.

    ``keyed``: (id, sz, *bucket_cols). ``max_bucket``: drop buckets larger
    than this (stop-shingle filtering — at corpus scale ubiquitous shingles
    produce quadratic garbage pairs and MUST be dropped).
    ``with_sz=False`` omits the sz payload from the collected structs and
    the output (callers whose payload slot is a dummy — banded MinHash,
    embedding LSH — halve the collected/expanded struct width).

    Memory envelope (r5, VERDICT r4 #6): the pair array for a bucket of B
    members is built BEFORE the explode, so an unchunked expansion holds
    B^2/2 structs in one transient row — ~24 MB at B=1000 but ~2.4 GB at
    B=10_000, an executor-killer regardless of ``max_bucket`` accounting.
    The outer loop is therefore CHUNKED: a first explode fans each bucket
    into ceil(B/chunk) rows, each expanding a ``chunk``-wide slice of
    members — peak transient stays linear in B, total pair count
    unchanged.

    Expansion shape (r6, VERDICT r5 #2a): members are collected SORTED
    (sort_array over the (id, sz) structs — ids are unique per bucket, so
    the order is total) and each member x at global 0-based index gi
    pairs only against the STRICT SUFFIX slice(ms, gi+2, B). The r5 form
    built all chunk x B structs and filtered half away; this builds only
    the B^2/2 surviving pairs and never materializes a rejected struct.
    The id_a < id_b guard stays (it also drops duplicate-id pairs, the
    old semantics). Same pair SET as r5/r4; row order differs, which no
    consumer observes (all downstream uses aggregate or join the set).
    """
    fields = ("id", "sz") if with_sz else ("id",)
    buckets = keyed.groupBy(*bucket_cols).agg(
        F.sort_array(F.collect_list(F.struct(*fields))).alias("ms")
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ms") <= max_bucket)
    nchunks = F.ceil(F.size("ms") / F.lit(chunk)).cast("int")
    chunked = buckets.select(
        "ms", F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("ci")
    )
    base = F.col("ci") * chunk  # 0-based offset of this chunk's first member
    part = F.slice(F.col("ms"), base + 1, chunk)

    def pair_struct(x, y):
        if with_sz:
            return F.struct(
                x["id"].alias("id_a"), x["sz"].alias("sz_a"),
                y["id"].alias("id_b"), y["sz"].alias("sz_b"),
            )
        return F.struct(x["id"].alias("id_a"), y["id"].alias("id_b"))

    pairs = F.flatten(
        F.transform(
            part,
            # 2-param transform lambda binds (element, 0-based index)
            lambda x, i: F.filter(
                F.transform(
                    F.slice(F.col("ms"), base + i + 2, F.size("ms")),
                    lambda y: pair_struct(x, y),
                ),
                lambda p: p["id_a"] < p["id_b"],
            ),
        )
    )
    out_cols = ("p.id_a", "p.sz_a", "p.id_b", "p.sz_b") if with_sz else (
        "p.id_a", "p.id_b")
    return chunked.select(F.explode(pairs).alias("p")).select(*out_cols)


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    threshold: float = 0.5,
    max_bucket: int | None = 1_000,
) -> DataFrame:
    """Exact token/n-gram-set Jaccard >= threshold pairs via shingle
    blocking: explode shingles, bucket per shingle hash, expand pairs
    within buckets (single pass — no self-join), count shared shingles,
    then |A∩B| / (|A|+|B|-|A∩B|). Only pairs sharing >=1 shingle are ever
    materialized, and the bucket key is a hash, not the text.

    ``max_bucket`` drops stop-shingle buckets. The default is FINITE
    (r3 advice: this operator is the one most likely to hit a degenerate
    bucket — unigram shingles over chat text put the whole corpus in the
    "the" bucket, and in-bucket expansion is quadratic). Shared shingles
    are then counted over surviving buckets only, so a dropped stop-
    shingle UNDERCOUNTS the intersection — a recall knob, never a
    precision one (reported jaccard is a lower bound). Pass ``None`` to
    opt into exact mode, and account drops with
    ``dropped_bucket_stats`` — no silent caps.
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    exploded = sh.select("id", "sz", F.explode("sh").alias("g")).withColumn(
        "g", F.xxhash64("g")
    )
    inter = (
        _bucket_pairs(exploded, ["g"], max_bucket)
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(text_col, num_hashes: int = 32, shingle_n: int = 3):
    """array<long> of `num_hashes` min-hashes over n-token shingles.

    Hash family: xxhash64(shingle, seed=i) — k independent seeds as
    literals; entirely JVM-side.

    NB: the seed MUST be closed over via a helper (not a lambda default
    arg): PySpark gives a two-parameter transform-lambda the signature
    (element, index), so `lambda s, i=i:` silently binds i to the array
    index column and every "independent" hash collapses to the same
    function — a bug this module shipped with in round 1, caught by the
    J>=0.8 SQL oracle.
    """
    sh = shingles(text_col, shingle_n)

    def _mh(seed: int):
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed))))

    return F.array(*[_mh(i) for i in range(num_hashes)])


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """MinHash banding: signature -> `bands` band-hashes -> bucket equi-join
    -> candidate pairs -> exact Jaccard verification >= threshold.

    rows_per_band = num_hashes/bands tunes the S-curve; with 32/8 the
    candidate recall at J=0.5 is ~0.9. Verification keeps precision exact.

    ``max_bucket`` caps degenerate band buckets (empty/near-empty docs all
    share identical signatures and would otherwise expand quadratically);
    inspect drops with ``bucket_stats`` before tightening it.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    # flat signature computation (same shape as simhash_signatures):
    # explode shingles once, k min-aggregates with map-side combine —
    # whole-stage codegen instead of k interpreted HOF passes per row
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("g"),
    )
    sig = ex.groupBy("id").agg(
        *[F.min(F.xxhash64("g", F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)]
    )
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col(f"_h{bi * rows + ri}") for ri in range(rows)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bh")

    cand = (
        _bucket_pairs(band_rows, ["band", "bh"], max_bucket=max_bucket, with_sz=False)
        .distinct()
    )
    # verify candidates with exact shingle Jaccard
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    verified = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _md5_low64(tok):
    """First 8 md5 digest bytes as a little-endian int64 — entirely
    Catalyst (md5 -> hex -> 8x conv/shiftleft OR-chain). Chosen over
    xxhash64 because DuckDB's ``md5_number_upper`` computes the SAME
    value, making SimHash signatures (and hence the near-dup pairs)
    independently verifiable by the driver's SQL oracle."""
    hx = F.md5(F.encode(tok, "UTF-8"))
    b = None
    for j in range(8):
        term = F.shiftleft(F.conv(F.substring(hx, j * 2 + 1, 2), 16, 10).cast("long"), 8 * j)
        b = term if b is None else b.bitwiseOR(term)
    return b


_POWERS64 = [((1 << b) if b < 63 else -(2 ** 63)) for b in range(64)]


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per row — NO Python in the path (the round-1 pandas
    UDF looped per row/per token; this is its exact bit-for-bit
    replacement, verified in tests/test_dedup_similarity.py).

    Shape: explode whitespace tokens -> md5-low64 -> 64 flat
    ``sum(bit_get*2-1)`` aggregates (whole-stage codegen, map-side
    partial agg collapses each doc's tokens within a partition, so the
    shuffle moves 64 longs per doc, not tokens). Zero-token rows get
    sig=0 via the left join, matching the old UDF.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.lower(text_col), r"\s+"), lambda x: x != F.lit(""))
        ).alias("tok"),
    ).withColumn("h", _md5_low64(F.col("tok")))
    sums = toks.groupBy("id").agg(
        *[F.sum(F.bit_get("h", F.lit(b)) * 2 - 1).alias(f"_b{b}") for b in range(64)]
    )
    sig = None
    for b in range(64):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(_POWERS64[b]).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig.bitwiseOR(term)
    sums = sums.select("id", sig.alias("sig"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(sums, "id", "left")
        .select("id", F.coalesce("sig", F.lit(0).cast("long")).alias("sig"))
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit chunks:
    two signatures within hamming<=3 of 64 bits must share at least one of
    the 4 16-bit chunks exactly (pigeonhole) — that chunk is the join key,
    so the blocked candidate set EQUALS the all-pairs result (no recall
    loss). ``max_bucket`` caps degenerate chunk buckets (e.g. a corpus-wide
    boilerplate chunk) at the cost of that exactness — report what was
    dropped via ``bucket_stats`` rather than capping silently.
    """
    sig = simhash_signatures(df, id_col, text_col)
    chunks = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("sig", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ck"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sig", "c.chunk", "c.ck")
    # ride the generic bucket-pair expansion: the payload slot carries the
    # 64-bit signature (sz_a/sz_b are longs)
    cand = (
        _bucket_pairs(
            chunks.withColumn("sz", F.col("sig")), ["chunk", "ck"], max_bucket=max_bucket
        )
        .select("id_a", "id_b", F.col("sz_a").alias("sig_a"), F.col("sz_b").alias("sig_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (LSH-bucketed)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def cosine_expr(a, b):
    """Exact cosine similarity of two array<float/double> columns —
    pure Catalyst (zip_with + aggregate), no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Random-hyperplane LSH near-dup, the classic (k, L) scheme:
    L independent tables of k=``n_planes`` sign bits each. A pair at
    cosine c collides in one table with p = (1 - arccos(c)/pi)^k and is
    missed by ALL tables with (1-p)^L — k trades candidate volume
    against recall, L buys the recall back. Candidates are generated per
    (table, bucket) through ``_bucket_pairs`` (single-pass expansion, NOT
    a self-join), deduped, then exact-cosine verified via two hash joins
    back to the vectors.

    ``max_bucket`` caps any single bucket's expansion: a degenerate
    bucket (all-zero vectors, one dense cluster) otherwise goes O(B^2)
    at corpus scale — the round-1 version self-joined uncapped 2^4
    buckets, which is exactly the 100x blow-up this replaces. Dropped
    buckets are observable via ``bucket_stats`` (no silent truncation:
    log them at the call site).

    Vector math (r6): the (k, L) projections stay HOF dots (a fully
    unrolled 32x64 keying expression measured 3x SLOWER — it falls out
    of HotSpot's JIT envelope; see functions.vecexpr), and verification
    hoists the L2 norms to once-per-vector projections so the per-pair
    hot loop is a single HOF dot — bit-identical to a per-pair cosine
    (same fold order) at a third of the per-pair aggregate work.
    """
    from smh_to_jsonld_spark.functions import vecexpr

    tables_sql = "array(" + ", ".join(
        f"named_struct('tbl', {t}, 'bkt', "
        f"{vecexpr.sign_bucket_sql('v', _hyperplanes(dim, n_planes, seed + t))})"
        for t in range(n_tables)
    ) + ")"
    vecd = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    keyed = vecd.select(
        "id", F.explode(F.expr(tables_sql)).alias("tb")
    ).select("id", "tb.tbl", "tb.bkt")
    cand = (
        _bucket_pairs(keyed, ["tbl", "bkt"], max_bucket, with_sz=False)
        .distinct()
    )
    # verification (r6): the L2 norm is computed ONCE PER VECTOR before
    # the join (the exact sqrt(aggregate(...)) subexpression the HOF
    # cosine evaluated per pair — same expression on the same doubles =>
    # the same double); the per-pair work is just the HOF dot over the
    # joined arrays divided by the two precomputed norms: cosine ==
    # dot/(na*nb) bit-for-bit vs the r5 per-pair HOF cosine, at one
    # aggregate per pair instead of three. (Measured: an UNROLLED
    # 64-term dot here is 10x SLOWER than the HOF fold — the generated
    # straight-line method is too large for HotSpot to JIT and runs in
    # the bytecode interpreter — so the interpreted-but-small HOF dot
    # stays; see OPTIMIZATION_r06.md.)
    nrm = F.expr(f"sqrt({vecexpr.sq_norm_hof_sql('v')})")
    va = vecd.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), nrm.alias("na")
    )
    vb = vecd.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), nrm.alias("nb")
    )
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0.0d, (p, q) -> p + q)"
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def near_dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 1,
    threshold: float = 0.8,
    max_bucket: int = 500,
) -> DataFrame:
    """Corpus-level near-dup CLUSTERING — the composite a training-data
    dedup pass actually runs: verified MinHash pairs (minhash_lsh_pairs)
    become same-as edges, connected components (large-star/small-star,
    canon module) merge transitive near-dup chains, and each cluster
    keeps its minimum doc id as the representative.

    Ids are zero-padded to 19 digits (the max signed-long width — lpad
    would silently TRUNCATE longer ids, corrupting cluster membership)
    before the (string-keyed) component fixpoint so lexicographic min ==
    numeric min; negative ids would break that invariant and are rejected
    with a distributed fail-fast (raise_error inside the pad expression —
    no extra pass over the corpus). Singleton docs (no near-dup) are
    their own cluster. Returns (doc_id, cluster, is_representative) —
    downstream dedup keeps ``is_representative``.
    """
    from smh_to_jsonld_spark.operators import canon

    pairs = minhash_lsh_pairs(
        docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
        bands=bands, shingle_n=shingle_n, threshold=threshold,
        max_bucket=max_bucket,
    )

    def pad(c):
        col = F.col(c).cast("long")
        return F.when(
            col < 0,
            F.raise_error(
                F.concat(
                    F.lit("near_dup_clusters requires non-negative ids; got "),
                    col.cast("string"),
                )
            ).cast("string"),
        ).otherwise(F.format_string("%019d", col))
    edges = pairs.select(pad("id_a").alias("src"), pad("id_b").alias("dst"))
    cc = canon.connected_components(edges)
    all_ids = docs.select(pad(id_col).alias("vertex")).distinct()
    return (
        all_ids.join(cc, "vertex", "left")
        .withColumn("cluster", F.coalesce("component", "vertex"))
        .select(
            F.col("vertex").cast("long").alias(id_col),
            F.col("cluster").cast("long").alias("cluster"),
            (F.col("vertex") == F.col("cluster")).alias("is_representative"),
        )
    )


def dropped_bucket_stats(
    keyed: DataFrame, bucket_cols: list, max_bucket: int
) -> dict:
    """Drop accounting for a blocked operator ("no silent caps"): how many
    buckets — and rows in them — a ``max_bucket`` cap discards from
    ``keyed`` (the (id, *bucket_cols) frame a candidate generator would
    expand). ONE aggregation action; record the result in the job
    manifest next to the capped operator's output."""
    row = (
        keyed.groupBy(*bucket_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > max_bucket)
        .agg(
            F.count("*").alias("dropped_buckets"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("dropped_rows"),
        )
        .collect()[0]
    )
    return {"dropped_buckets": row.dropped_buckets, "dropped_rows": row.dropped_rows}


# ---------------------------------------------------------------------------
# incremental (cross-commit) near-dup: persistable signatures + delta pairs
# ---------------------------------------------------------------------------

def minhash_doc_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 1,
) -> DataFrame:
    """Per-doc state an INCREMENTAL near-dup pass persists: (id, bh, sh)
    where ``bh`` = the ``bands`` LSH band hashes and ``sh`` = the distinct
    shingle-hash set (xxhash64 — 16 bytes/shingle, so later commits can
    exact-verify candidate pairs against PAST docs without re-reading
    their text). Same signature family as ``minhash_lsh_pairs`` (flat
    min-aggregates, whole-stage codegen); a batch run and an incremental
    run over the same corpus therefore generate identical candidates.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("g"),
    )
    agg = ex.groupBy("id").agg(
        *[F.min(F.xxhash64("g", F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)],
        F.collect_set(F.xxhash64("g")).alias("sh"),
    )
    bh = F.array(
        *[
            F.xxhash64(*[F.col(f"_h{bi * rows + ri}") for ri in range(rows)])
            for bi in range(bands)
        ]
    )
    return agg.select("id", bh.alias("bh"), F.sort_array("sh").alias("sh"))


def minhash_doc_signatures_rowwise(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 1,
) -> DataFrame:
    """STATELESS variant of :func:`minhash_doc_signatures`: the same
    (id, bh, sh) rows computed as a pure per-row projection (array HOFs
    over the shingle array — no explode, no groupBy), which makes it
    legal inside an append-mode STREAM with no watermark or state.

    Value-identical to the batch form by construction: min over the same
    shingle-hash multiset, band hash over the same (long, ...) tuple,
    distinct+sort over the same set — pinned by
    ``test_doc_signature_stream_matches_batch``. The batch job keeps the
    explode+groupBy form (flat min-aggs run in whole-stage codegen; the
    HOF form is interpreted), so the speed layer trades per-row CPU for
    statelessness — the standard bronze-layer trade.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sh_arr = shingles(F.col(text_col), shingle_n)

    def _mh(seed: int):
        return F.array_min(F.transform(sh_arr, lambda s: F.xxhash64(s, F.lit(seed))))

    mins = [_mh(i) for i in range(num_hashes)]
    bh = F.array(
        *[
            F.xxhash64(*[mins[bi * rows + ri] for ri in range(rows)])
            for bi in range(bands)
        ]
    )
    sh = F.sort_array(F.array_distinct(F.transform(sh_arr, lambda s: F.xxhash64(s))))
    return df.select(F.col(id_col).alias("id"), bh.alias("bh"), sh.alias("sh"))


def delta_near_dup_pairs(
    new_sigs: DataFrame,
    all_sigs: DataFrame,
    threshold: float = 0.8,
    max_bucket: int = 10_000,
) -> tuple:
    """Candidate + verified pairs that involve AT LEAST ONE new doc:
    band-bucket equi-join of the new docs' band keys against the full
    signature table (hash join on (band, bh) — new-docs-sized probe, so
    a resume commit pays for its delta, not the corpus), then exact
    Jaccard over the stored shingle-hash sets. Old-old pairs were found
    by the commits that introduced those docs and are never re-derived.

    Buckets whose FULL-corpus size exceeds ``max_bucket`` are dropped on
    both sides. Returns (pairs_df, stats_dict) — stats carry the dropped-
    bucket accounting for the job manifest.
    """
    expl = lambda sigs: sigs.select(
        "id", F.posexplode("bh").alias("band", "bhv")
    )
    all_keys = expl(all_sigs)
    new_keys = expl(new_sigs)
    sizes = all_keys.groupBy("band", "bhv").agg(F.count("*").alias("n"))
    stats = {
        "dropped_buckets": 0,
        "dropped_rows": 0,
    }
    over = sizes.filter(F.col("n") > max_bucket)
    drop = over.agg(
        F.count("*").alias("b"), F.coalesce(F.sum("n"), F.lit(0)).alias("r")
    ).collect()[0]
    stats["dropped_buckets"], stats["dropped_rows"] = drop.b, drop.r
    ok = sizes.filter(F.col("n") <= max_bucket).select("band", "bhv")
    cand = (
        new_keys.join(ok, ["band", "bhv"], "left_semi")
        .join(
            all_keys.select(
                F.col("band"), F.col("bhv"), F.col("id").alias("id_o")
            ),
            ["band", "bhv"],
        )
        .filter(F.col("id") != F.col("id_o"))
        .select(
            F.least("id", "id_o").alias("id_a"),
            F.greatest("id", "id_o").alias("id_b"),
        )
        .distinct()
    )
    sh = lambda side: all_sigs.select(
        F.col("id").alias(f"id_{side}"), F.col("sh").alias(f"sh_{side}")
    )
    pairs = (
        cand.join(sh("a"), "id_a")
        .join(sh("b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return pairs, stats


def bucket_stats(keyed: DataFrame, bucket_cols: list) -> DataFrame:
    """Bucket-size histogram for any blocked operator's key frame —
    the observability companion to ``max_bucket`` (call it to report
    how many buckets/rows a cap would drop instead of capping silently).
    """
    return (
        keyed.groupBy(*bucket_cols)
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .orderBy(F.col("bucket_size").desc())
    )
