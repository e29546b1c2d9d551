"""functions.vecexpr: generated-SQL vector math == the HOF Column forms.

The generators promise BIT-IDENTICAL results to the original
aggregate/zip_with implementations (same fold order) — that contract is
what keeps every embedded-literal DuckDB oracle valid. Pinned here on
deterministic pseudo-random vectors, including the unrolled (codegen)
vs HOF (interpreted) cosine pair and both bucket packings.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from smh_to_jsonld_spark.functions import vecexpr
from smh_to_jsonld_spark.operators.dedup import _hyperplanes, cosine_expr

DIM = 16


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(DIM).tolist()) for i in range(50)]
    return spark.createDataFrame(rows, "vid long, v array<double>").cache()


def test_cosine_sql_bit_identical_to_hof_column_form(vecs):
    pairs = vecs.alias("a").crossJoin(vecs.alias("b")).select(
        F.col("a.vid").alias("ia"), F.col("b.vid").alias("ib"),
        F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
    ).filter(F.col("ia") < F.col("ib"))
    got = pairs.select(
        "ia", "ib",
        F.expr(vecexpr.cosine_sql("va", "vb", DIM)).alias("unrolled"),
        F.expr(vecexpr.cosine_hof_sql("va", "vb")).alias("hof_sql"),
        cosine_expr(F.col("va"), F.col("vb")).alias("hof_col"),
    ).collect()
    assert got
    for r in got:
        assert r.unrolled == r.hof_col  # exact, not approx: same fold order
        assert r.hof_sql == r.hof_col


def test_bucket_packings_match_reference_python(vecs):
    planes = _hyperplanes(DIM, 5, seed=11)
    rows = vecs.select(
        "vid", "v",
        F.expr(vecexpr.sign_bucket_sql("v", planes)).alias("lsb"),
        F.expr(vecexpr.msb_bucket_sql("v", planes)).alias("msb"),
    ).collect()
    for r in rows:
        bits = [1 if float(np.sum(np.array(r.v) * np.array(p))) > 0 else 0
                for p in planes]
        # fp caveat: numpy sum order differs from the SQL fold; regenerate
        # the projections with the same sequential fold to compare exactly
        seq_bits = []
        for p in planes:
            acc = 0.0
            for x, w in zip(r.v, p):
                acc += x * float(w)
            seq_bits.append(1 if acc > 0.0 else 0)
        assert seq_bits == bits  # sanity: no borderline projections here
        assert r.lsb == sum(b << i for i, b in enumerate(seq_bits))
        msb = 0
        for b in seq_bits:
            msb = msb * 2 + b
        assert r.msb == msb


def test_score_array_matches_sequential_dots(vecs):
    cents = _hyperplanes(DIM, 4, seed=5)
    rows = vecs.select(
        "v", F.expr(vecexpr.score_array_sql("v", cents)).alias("scores")
    ).collect()
    for r in rows:
        for ci, c in enumerate(cents):
            acc = 0.0
            for x, w in zip(r.v, c):
                acc += x * float(w)
            assert r.scores[ci] == acc
