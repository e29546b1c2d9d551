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

from smh_to_jsonld_spark.functions import exprcache

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


def distinct_field_values(
    facts: DataFrame, keys=("round_id", "model_id"), order_col: str | None = None
) -> DataFrame:
    """A1: per-model distinct value arrays for every fact field.

    Default (``order_col=None``): sorted-distinct — one hash aggregation
    (partial+final), deterministic, the round-1 behavior.

    ``order_col`` given: FIRST-APPEARANCE order, replicating the
    reference's pandas insertion-order distinct lists
    (utils/model_output_smh.py:65-72) byte-for-byte, including the
    "last origin_date wins" temporal quirk (utils/temporal.py loop:
    ``origin_date_max`` becomes the LAST element in appearance order,
    not max()). Two shuffles, both with map-side partial aggregation:
    (1) groupBy(keys + fields) min(order) collapses repeated fact combos
    (the `value` column varies per row, the field combo does not), so
    (2) the per-field collect_list runs over DISTINCT combos only —
    bounded by the data's combinatorial structure, not raw row count.

    Output: one row per key with array columns named after each field,
    plus ``max_horizon`` and ``origin_date_max`` used by temporal
    coverage (C7).
    """
    fields = [c for c in FACT_FIELDS if c in facts.columns]
    if order_col is None:
        aggs = [F.sort_array(F.collect_set(c)).alias(c) for c in fields]
        aggs.append(F.max("horizon").alias("max_horizon"))  # A3
        aggs.append(F.max("origin_date").alias("origin_date_max"))
        return facts.groupBy(*[F.col(k) for k in keys]).agg(*aggs)

    def build():
        # ONE collect_list + ONE sort shared by every field (collecting
        # seven separate struct lists made the object agg ~7x more
        # expensive); each field is then a cheap transform + first-wins
        # array_distinct over the already-ordered array, with NULLs
        # dropped after distinct.
        pairs = F.array_sort(
            F.collect_list(
                F.struct(F.col("__o").alias("o"), *[F.col(c).alias(c) for c in fields])
            )
        )

        def _field_arr(name: str):
            # closure helper, NOT a default-arg lambda: a 2-param transform
            # lambda would bind (element, INDEX) and shadow the default
            return F.filter(
                F.array_distinct(F.transform(F.col("__pairs"), lambda s: s[name])),
                lambda x: x.isNotNull(),
            ).alias(name)

        min_order = F.min(order_col).alias("__o")
        aggs = (pairs.alias("__pairs"), F.max("horizon").alias("max_horizon"))
        field_arrs = [_field_arr(c) for c in fields]
        # reference last-origin-date-wins (utils/temporal.py): the last
        # distinct origin_date in first-appearance order, NOT max().
        odm = F.element_at(
            F.filter(
                F.array_distinct(
                    F.transform(F.col("__pairs"), lambda s: s["origin_date"])
                ),
                lambda x: x.isNotNull(),
            ),
            -1,
        ).alias("origin_date_max")
        return min_order, aggs, field_arrs, odm

    min_order, aggs, field_arrs, odm = exprcache.memo(
        f"agg.dfv:{keys}:{tuple(fields)}:{order_col}", build
    )
    combos = facts.groupBy(*[F.col(k) for k in list(keys) + fields]).agg(min_order)
    out = combos.groupBy(*[F.col(k) for k in keys]).agg(*aggs)  # A3 max_horizon
    return out.select(*keys, "max_horizon", *field_arrs, odm)


_FIELD_CASTS = {"origin_date": "date", "horizon": "int"}  # others stay string


def distinct_field_values_long(
    facts: DataFrame, keys=("round_id", "model_id"), order_col: str = "turn_order"
) -> DataFrame:
    """First-appearance-ordered distinct field values via a LONG-FORM
    explode — the hot-path replacement for ``distinct_field_values(...,
    order_col=...)`` (pinned equal by ``test_field_values_long_equals_
    combos_path``).

    Why: the combos formulation shuffles one wide struct row per DISTINCT
    FIELD COMBINATION — at transcript scale the combinatorial cross
    product approaches the raw fact count, so the exchange carries nearly
    the whole fact table. Here each fact row explodes to 7 skinny (key, field,
    value-as-string, order) rows and the first groupBy's MAP-SIDE partial
    aggregation collapses them to the per-partition distinct (key, field,
    value) set — the exchange carries ~|distinct values| rows (thousands),
    not |facts|. Two more aggregations (per-field ordered collect, pivot
    to columns) run over value-vocabulary-sized data.

    First-appearance equivalence: a value's position in the reference's
    pandas insertion-order list is its minimum ``order_col`` over all fact
    rows carrying it; min distributes over the union of combos, so
    min-per-(field,value) == first-combo-containing-it. ``order_col``
    values are unique per fact row (one mention per turn), so the sort is
    total and deterministic. Values are grouped as canonical strings
    (date -> 'yyyy-MM-dd', int -> decimal) and cast back per field — both
    roundtrips are exact.

    Output schema and edge cases match the combos path exactly: one row
    per key present in ``facts`` (even if every field value is NULL),
    empty arrays (never NULL) for valueless fields, ``max_horizon`` and
    last-appearance ``origin_date_max`` (the reference's
    last-origin-date-wins quirk, utils/temporal.py).
    """
    fields = [c for c in FACT_FIELDS if c in facts.columns]
    key_cols = [F.col(k) for k in keys]
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("f"), F.col(c).cast("string").alias("v"))
            for c in fields
        ]
    )
    long = (
        facts.select(*key_cols, F.col(order_col).alias("__o"), F.explode(pairs).alias("fv"))
        .select(*keys, "__o", F.col("fv.f").alias("__f"), F.col("fv.v").alias("__v"))
        .filter(F.col("__v").isNotNull())
    )
    firsts = long.groupBy(*keys, "__f", "__v").agg(F.min("__o").alias("__o"))
    per_field = firsts.groupBy(*keys, "__f").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("__o").alias("o"), F.col("__v").alias("v")))
            ),
            lambda x: x["v"],
        ).alias("__vals")
    )
    pivoted = per_field.groupBy(*keys).agg(
        *[
            F.first(F.when(F.col("__f") == c, F.col("__vals")), ignorenulls=True).alias(c)
            for c in fields
        ]
    )
    # keys whose facts are all-NULL across every field vanish from the
    # long form — restore them (combos path emits a row of empty arrays)
    skeleton = facts.select(*key_cols).distinct()
    out = skeleton.join(pivoted, list(keys), "left")
    for c in fields:
        arr = F.coalesce(F.col(c), F.array())
        cast_to = _FIELD_CASTS.get(c)
        if cast_to:
            arr = F.transform(arr, lambda x: x.cast(cast_to))
        out = out.withColumn(c, arr)
    return out.withColumn("max_horizon", F.array_max("horizon")).withColumn(
        "origin_date_max", F.element_at("origin_date", -1)
    )


def merge_field_values_global(
    per_model: DataFrame, key="round_id", model_order_col: str | None = None
) -> DataFrame:
    """A2: cross-model union with dedup (merge_field_values analog,
    create_jsonld_v6_0_0.py:50-58).

    Default: sorted output. With ``model_order_col``: models are
    concatenated in that order and array_distinct keeps first appearance
    — the reference's dict-insertion merge order. No extra shuffle beyond
    the groupBy; each field column is already a small array per model.
    """
    arr_cols = [c for c in FACT_FIELDS if c in per_model.columns]
    if model_order_col is None:
        aggs = [
            F.sort_array(F.array_distinct(F.flatten(F.collect_list(c)))).alias(c)
            for c in arr_cols
        ]
    else:
        def _merged(c):
            pairs = F.collect_list(
                F.struct(F.col(model_order_col).alias("o"), F.col(c).alias("v"))
            )
            return F.array_distinct(F.flatten(F.transform(F.array_sort(pairs), lambda s: s["v"])))
        aggs = [_merged(c).alias(c) for c in arr_cols]
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
