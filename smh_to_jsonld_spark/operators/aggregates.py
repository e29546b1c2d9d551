"""Aggregation operators — SURVEY.md §2.4 A1-A10, Spark-first.

The reference's core aggregation is "per-field distinct values per model"
(/root/reference/utils/model_output_smh.py:65-72) followed by a global
insertion-order merge (/root/reference/pipeline/create_jsonld_v6_0_0.py:50-58).
Here both are one shuffle: groupBy(model) + collect_set per field, with
map-side partial aggregation for free. Ordering note: the reference keeps
pandas first-appearance order; triple P/R matching is set-based, so we use
sort_array for determinism instead (SURVEY.md §7.4-5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fields extracted from model-output facts — everything except `value`
# (the reference excludes `value` at utils/model_output_smh.py:66-70).
FACT_FIELDS = (
    "origin_date",
    "scenario_id",
    "location",
    "age_group",
    "target",
    "horizon",
    "output_type",
)


def distinct_field_values(facts: DataFrame, keys=("round_id", "model_id")) -> DataFrame:
    """A1: per-model sorted-distinct value arrays for every fact field.

    One hash aggregation (partial+final). Output: one row per key with
    array columns named after each field, plus ``max_horizon`` and
    ``origin_date_max`` used by temporal coverage (C7).
    """
    aggs = [F.sort_array(F.collect_set(c)).alias(c) for c in FACT_FIELDS if c in facts.columns]
    aggs.append(F.max("horizon").alias("max_horizon"))  # A3
    aggs.append(F.max("origin_date").alias("origin_date_max"))
    return facts.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def merge_field_values_global(per_model: DataFrame, key="round_id") -> DataFrame:
    """A2: cross-model union with dedup (merge_field_values analog).

    array_distinct(flatten(collect_list(...))) — no extra shuffle beyond
    the groupBy; each field column is already a small array per model.
    """
    arr_cols = [c for c in FACT_FIELDS if c in per_model.columns]
    aggs = [
        F.sort_array(F.array_distinct(F.flatten(F.collect_list(c)))).alias(c) for c in arr_cols
    ]
    return per_model.groupBy(key).agg(*aggs)


def file_type_histogram(files: DataFrame) -> DataFrame:
    """A4: parquet vs gz.parquet counts per (round, model).

    Reference: utils/model_output_smh.py:74-104 (os.walk + dict counts).
    """
    from smh_to_jsonld_spark.functions.scalars import file_type_of

    return (
        files.withColumn("file_type", file_type_of(F.col("filename")))
        .groupBy("round_id", "model_id")
        .agg(
            F.sum(F.when(F.col("file_type") == "parquet", 1).otherwise(0)).alias("n_parquet"),
            F.sum(F.when(F.col("file_type") == "gz.parquet", 1).otherwise(0)).alias("n_gz_parquet"),
        )
    )


def top1_per_group(df: DataFrame, group_cols, order_col, desc: bool = True) -> DataFrame:
    """A8/O5: argmax per group via window row_number (latest-version-wins,
    reference pipeline/update_source_data.py:97-106).
    """
    from pyspark.sql import Window

    order = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def first_wins_dedup(df: DataFrame, key_cols, order_col) -> DataFrame:
    """A7: first-appearance-wins dedup by key (reference
    create_jsonld_v6_0_0.py:141-143 target-metadata first-wins).
    """
    return top1_per_group(df, key_cols, order_col, desc=False)
