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
- SimHash: 64-bit signature via a vectorized pandas UDF (numpy bit ops),
  near-dup = hamming distance <= d on bucket-blocked candidates.
- embedding near-dup: random-hyperplane LSH buckets (seeded, deterministic)
  then exact cosine within bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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
    """Array of n-token shingles (distinct), pure Catalyst."""
    toks = tokens_of(F.lower(text_col))
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
            )
        )
    )


def _bucket_pairs(keyed: DataFrame, bucket_cols: list, max_bucket: int | None):
    """Shared candidate-pair generator: group rows into buckets, emit all
    ordered (id_a < id_b) pairs per bucket IN ONE PASS (collect_list +
    nested-lambda pair expansion). Compared to a bucket self-join this
    halves the upstream computation (a self-join recomputes the bucket
    input for each side) and gives a natural place to drop stop buckets.

    ``keyed``: (id, sz, *bucket_cols). ``max_bucket``: drop buckets larger
    than this (stop-shingle filtering — at corpus scale ubiquitous shingles
    produce quadratic garbage pairs and MUST be dropped).
    """
    buckets = keyed.groupBy(*bucket_cols).agg(
        F.collect_list(F.struct("id", "sz")).alias("ms")
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ms") <= max_bucket)
    pairs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x: F.filter(
                F.transform(
                    F.col("ms"),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        x["sz"].alias("sz_a"),
                        y["id"].alias("id_b"),
                        y["sz"].alias("sz_b"),
                    ),
                ),
                lambda p: p["id_a"] < p["id_b"],
            ),
        )
    )
    return buckets.select(F.explode(pairs).alias("p")).select(
        "p.id_a", "p.sz_a", "p.id_b", "p.sz_b"
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact token/n-gram-set Jaccard >= threshold pairs via shingle
    blocking: explode shingles, bucket per shingle hash, expand pairs
    within buckets (single pass — no self-join), count shared shingles,
    then |A∩B| / (|A|+|B|-|A∩B|). Only pairs sharing >=1 shingle are ever
    materialized, and the bucket key is a hash, not the text.
    ``max_bucket`` drops stop-shingles (scale knob; None = exact).
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
    """
    sh = shingles(text_col, shingle_n)
    return F.array(
        *[F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i)))) for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash banding: signature -> `bands` band-hashes -> bucket equi-join
    -> candidate pairs -> exact Jaccard verification >= threshold.

    rows_per_band = num_hashes/bands tunes the S-curve; with 32/8 the
    candidate recall at J=0.5 is ~0.9. Verification keeps precision exact.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__t"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
    )
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", bi * rows + ri + 1) for ri in range(rows)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bh")

    cand = (
        _bucket_pairs(
            band_rows.withColumn("sz", F.lit(0)), ["band", "bh"], max_bucket=None
        )
        .select("id_a", "id_b")
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

def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (vectorized numpy bit ops).

    Deterministic: token hash = md5-derived 64 bits. Arrow-batched —
    the one Python operator here, kept because 64 per-bit majority
    accumulators are awkward to express in Catalyst.
    """
    import hashlib

    weights = 1 << np.arange(64, dtype=np.uint64)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for tok in (t or "").lower().split():
            bits = np.unpackbits(
                np.frombuffer(hashlib.md5(tok.encode()).digest()[:8], dtype=np.uint8),
                bitorder="little",
            ).astype(np.int64)
            acc += 2 * bits - 1
        v = np.sum(weights[acc > 0], dtype=np.uint64)
        out[i] = v.astype(np.int64)
    return pd.Series(out)


def simhash64(col):
    """Column wrapper; the pandas UDF is built lazily because type parsing
    needs an active SparkSession (safe to import without one)."""
    return pandas_udf(_simhash_batch, "long")(col)


def simhash_neardup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit chunks:
    two signatures within hamming<=3 of 64 bits must share at least one of
    the 4 16-bit chunks exactly (pigeonhole) — that chunk is the join key.
    """
    sig = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sig"))
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
            chunks.withColumn("sz", F.col("sig")), ["chunk", "ck"], max_bucket=None
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
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string of `n_planes`
    projections; exact cosine verified within buckets. High-cosine pairs
    land in the same bucket with prob (1 - theta/pi)^n_planes.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sign_bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0
        ).cast("int")
        for plane in planes
    ]
    bucket = F.concat_ws("", *[b.cast("string") for b in sign_bits])
    keyed = df.select(
        F.col(id_col).alias("id"), vec.alias("v"), bucket.alias("bucket")
    )
    cand = (
        keyed.alias("x")
        .join(keyed.alias("y"), "bucket")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            cosine_expr(F.col("x.v"), F.col("y.v")).alias("cosine"),
        )
    )
    return cand.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine")
    )
