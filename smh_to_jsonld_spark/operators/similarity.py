"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k. The query side is broadcast
  (queries are small by definition); the corpus is scanned once, scored
  JVM-side (zip_with/aggregate), and top-k is a per-query window. At
  100 TB this is the correctness baseline and the fallback path.
- ``lsh_topk``: random-hyperplane bucketing with multi-probe (hamming-1
  neighbor buckets) to cut the scored candidate set; exact re-scoring
  inside buckets. The scale path: corpus scored per query drops from N to
  ~N / 2^planes * probes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smh_to_jsonld_spark.operators.dedup import _hyperplanes, cosine_expr


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast queries × corpus scan, window rank.

    Output: (query_id, neighbor_id, rank, cosine).
    Deterministic tie-break: cosine desc, neighbor_id asc.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def _bucket_expr(vec_col, planes):
    bits = [
        (
            F.aggregate(
                F.zip_with(vec_col, F.array(*[F.lit(float(w)) for w in p]), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            > 0
        ).cast("int")
        for p in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's bucket
    (plus hamming-1 probe buckets). Candidate generation is an equi-join
    on bucket id — the corpus is hash-partitioned by bucket, so each query
    touches ~N/2^planes * (1+planes) rows instead of N.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", _bucket_expr(F.col("cv"), planes))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket0", _bucket_expr(F.col("qv"), planes))
    if multiprobe:
        probes = F.array_union(
            F.array(F.col("bucket0")),
            F.array(
                *[
                    F.col("bucket0").bitwiseXOR(F.lit(1 << i)).cast("int")
                    for i in range(n_planes)
                ]
            ),
        )
    else:
        probes = F.array(F.col("bucket0"))
    q = q.select("query_id", "qv", F.explode(probes).alias("bucket"))

    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def ivf_assign(corpus: DataFrame, n_centroids: int = 16, dim: int = 64,
               id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7) -> DataFrame:
    """IVF-style coarse quantization with FIXED random centroids (seeded —
    deterministic without an iterative k-means job; at real scale you'd
    train centroids offline and broadcast them just the same).
    Adds `centroid` = argmax cosine."""
    rng = np.random.RandomState(seed)
    cents = rng.randn(n_centroids, dim)
    cents = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).tolist()
    v = _as_double(F.col(vec_col))
    # one score expression per centroid in a single array, argmax via
    # array_position — a when-chain would EMBED each prior score twice per
    # step (2^n expression blowup that stalls analysis/codegen)
    scores = F.array(
        *[
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(float(x)) for x in c]), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            for c in cents
        ]
    )
    centroid = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return corpus.select(F.col(id_col), F.col(vec_col), centroid.alias("centroid"))
