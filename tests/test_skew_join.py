"""AQE skew-join evidence (north_rule: "skew handled explicitly").

The engine's skew story has two tiers:
- aggregations: explicit two-phase salting (link.salted_count /
  salted_collect_set, oracle-checked by q:`salted_agg`);
- joins: AQE's runtime skew-join splitting — the hot partition is split
  into advisory-sized chunks and the other side's matching partition is
  replicated, which is exactly the salt-and-replicate rewrite done by
  hand, but driven by RUNTIME sizes (at 100 TB the static guess is
  always wrong for some key).

This test pins (a) the `skew=true` annotation in the final adaptive plan
over a head-entity-skewed join fixture, and (b) result equality with the
same join executed without skew handling.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _final_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@pytest.fixture
def skew_confs(spark):
    """Thresholds scaled down so the ~MB-sized test fixture trips the same
    code path a multi-GB hot key would in production; broadcast disabled
    (both static and AQE) to force a shuffled join like a dim too big to
    broadcast."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1k",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_sides(spark):
    # head-entity skew: ~98% of fact rows hit one key ('US'), the rest
    # spread over 1000 cold keys — the alias-dictionary join shape
    left = spark.range(120_000).select(
        F.when(
            F.col("id") % 50 != 0,
            F.lit("US"),
        )
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    right = spark.createDataFrame(
        [("US", "United States")] + [(f"k{i}", f"name{i}") for i in range(1000)],
        "k string, name string",
    )
    return left, right


def test_aqe_splits_skewed_join_and_results_match(spark, skew_confs):
    left, right = _skewed_sides(spark)
    joined = left.join(right, "k").select("k", "name", "payload")
    rows = joined.collect()  # executes THIS dataset's adaptive plan

    plan = _final_plan(joined)
    assert "isFinalPlan=true" in plan
    # the hot 'US' partition was detected and split at runtime
    assert "skew=true" in plan, plan

    # correctness: identical multiset of rows as a no-skew-handling run
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        baseline = left.join(right, "k").select("k", "name", "payload").collect()
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert len(rows) == len(baseline) == 120_000
    assert sorted(map(tuple, rows)) == sorted(map(tuple, baseline))
