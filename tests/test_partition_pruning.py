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
