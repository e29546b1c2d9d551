"""S3 parity: the reference's filename-prefix round filter
(/root/reference/utils/model_output_smh.py:46) becomes partition pruning
on the partitioned table layout — verified in the physical plan."""

import contextlib
import io

from pyspark.sql import functions as F

from smh_to_jsonld_spark.sources.tables import TableIO


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_on_round(spark, tmp_path):
    io_ = TableIO(str(tmp_path))
    df = spark.range(1000).select(
        F.col("id"),
        F.concat(
            F.lit("2031-0"), ((F.col("id") % 2) + 1).cast("string"), F.lit("-05")
        ).alias("round_id"),
    )
    io_.write(df, "facts", partition_by=["round_id"], mode="overwrite")

    read = io_.read(spark, "facts").filter(F.col("round_id") == "2031-01-05")
    plan = _plan(read)
    # the predicate must land in PartitionFilters, not a post-scan Filter
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "2031-01-05" in pf_line
    assert read.count() == 500


def test_input_file_name_filter(spark, tmp_path):
    """F5 analog: filename predicates via input_file_name()."""
    p1 = str(tmp_path / "2031-01-05-model.parquet")
    p2 = str(tmp_path / "2031-02-02-model.parquet")
    spark.range(10).write.parquet(p1)
    spark.range(20).write.parquet(p2)
    df = spark.read.parquet(str(tmp_path / "*.parquet")).withColumn(
        "src", F.input_file_name()
    )
    only_r1 = df.filter(F.col("src").contains("2031-01-05"))
    assert only_r1.count() == 10


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located join: two tables bucketed identically on the join key
    must SortMergeJoin straight off the bucketed scans — zero shuffle
    exchanges in the plan (the 10^12-turn strategy for mentions x
    conv_dim; mirrors the Iceberg DDL's bucket(64, conv_id))."""
    from smh_to_jsonld_spark.sources.tables import write_bucketed_table

    a = spark.range(0, 10000).select(
        F.concat(F.lit("c"), (F.col("id") % 500).cast("string")).alias("conv_id"),
        F.col("id").alias("x"),
    )
    b = spark.range(0, 5000).select(
        F.concat(F.lit("c"), (F.col("id") % 500).cast("string")).alias("conv_id"),
        F.col("id").alias("y"),
    )
    write_bucketed_table(a, "bk_a", ["conv_id"], 8, path=str(tmp_path / "a"))
    write_bucketed_table(b, "bk_b", ["conv_id"], 8, path=str(tmp_path / "b"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), "conv_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketed scans co-locate the keys
        # correctness unchanged by the layout
        expected = a.join(b, "conv_id").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
