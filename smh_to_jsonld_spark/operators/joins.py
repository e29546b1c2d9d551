"""Join operators — SURVEY.md §2.3 J1-J8, Spark-first.

All reference joins are small-dimension lookups => broadcast here.
The one semantically tricky join is the observed-target semi-join with
the empty-observed-set bypass (J4/F8): a plain left_semi is WRONG when a
model observed zero targets — the reference keeps *all* targets then
(/root/reference/pipeline/create_jsonld_v6_0_0.py:237-241).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smh_to_jsonld_spark.functions import scalars
from smh_to_jsonld_spark.functions.dims import state_dim


def location_lookup(locations: DataFrame, spark, fips_col: str = "location") -> DataFrame:
    """J1: FIPS -> location info via broadcast left join.

    Misses still emit a node ("Unknown state code: XX"), matching
    /root/reference/utils/location.py:18-51 — hence LEFT join + coalesce,
    never inner.

    Output adds: location_name, state_name, state_abbr, location_iri.
    """
    dim = state_dim(spark)
    f = F.col(fips_col).cast("string")
    out = (
        locations.withColumn("__state_code", scalars.fips_state_code(f))
        .join(
            F.broadcast(dim.select(F.col("fips").alias("__state_code"),
                                   "state_name", "abbr")),
            on="__state_code",
            how="left",
        )
        .withColumn("location_name", scalars.fips_location_name(f, F.col("state_name")))
        .withColumn("location_iri", scalars.mint_location_iri(f))
        .withColumn(
            "state_abbr",
            # reference: STATE_ABBR.get(state_name, "") — county rows reuse
            # the prefix state's abbr; unknown state => no code emitted
            F.when(F.col("state_name").isNotNull(), F.col("abbr")),
        )
        .drop("__state_code", "abbr")
    )
    return out


def observed_target_join(
    target_meta: DataFrame, observed: DataFrame, keys=("round_id", "model_id")
) -> DataFrame:
    """J4 + F8: target metadata restricted to observed targets, with the
    empty-observed-set bypass.

    ``target_meta``: one row per (round_id, target_id, ...metadata).
    ``observed``:    one row per (*keys, target_id) actually seen in data.

    Returns one row per (*keys, target_id-with-metadata). Implemented as a
    broadcast of per-key observed-target SETS (bounded: #targets per round
    is config-sized), then an array_contains OR empty-set predicate —
    avoiding a three-way shuffle join entirely.
    """
    key_cols = list(keys)
    observed_sets = observed.groupBy(*key_cols).agg(
        F.collect_set("target_id").alias("__observed")
    )
    # model-keys × round-target-metadata (broadcast the config-sized dim)
    pairs = observed_sets.join(
        F.broadcast(target_meta), on="round_id", how="inner"
    )
    return pairs.filter(
        (F.size("__observed") == 0) | F.array_contains(F.col("__observed"), F.col("target_id"))
    ).drop("__observed")


def roster_check(expected: DataFrame, actual: DataFrame, key: str) -> dict:
    """J7/U2/U4: two-way anti-join set-equality check
    (reference run_pipeline.py:201-254 roster validation).

    Returns {'missing': [...], 'extra': [...]} — both empty => rosters equal.
    """
    missing = [r[0] for r in expected.join(actual, key, "left_anti").select(key).collect()]
    extra = [r[0] for r in actual.join(expected, key, "left_anti").select(key).collect()]
    return {"missing": sorted(missing), "extra": sorted(extra)}
