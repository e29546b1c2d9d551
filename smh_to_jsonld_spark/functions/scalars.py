"""Scalar column functions — SURVEY.md §2.7 C1-C17, re-expressed as
pure Catalyst expressions (JVM-side, whole-stage-codegen friendly).

Each function documents the reference behavior it reproduces
(file:line into /root/reference). None of these use Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from smh_to_jsonld_spark.functions.dims import MISSING_SENTINELS

# ---------------------------------------------------------------------------
# C1 — model display-name minting.
# Reference: utils/jsonld.py:126-129 — "team_abbr-model_abbr" when team_abbr
# is a non-empty string, else model_abbr. (The reference crashes on
# team_abbr=None via len(None); we treat None like empty — documented
# deviation, fixtures always carry a string.)
# ---------------------------------------------------------------------------
def mint_model_name(team_abbr: Column, model_abbr: Column) -> Column:
    return F.when(
        F.length(F.coalesce(team_abbr, F.lit(""))) > 0,
        F.concat_ws("-", team_abbr, model_abbr),
    ).otherwise(model_abbr)


# C2 — coalesce chains (utils/jsonld.py:135; create_jsonld_v6_0_0.py:155-158)
def description_of(methods_long: Column, methods: Column) -> Column:
    # python `or` treats "" as falsy; match that, not just NULL-coalesce
    ml = F.when(F.length(F.coalesce(methods_long, F.lit(""))) > 0, methods_long)
    return F.coalesce(ml, methods)


# F4 — missing-sentinel predicate (utils/jsonld.py:145-151)
def is_missing_sentinel(col: Column) -> Column:
    return col.isin(*MISSING_SENTINELS)


def null_if_sentinel(col: Column) -> Column:
    """Value or NULL when it is one of the reference's missing sentinels."""
    return F.when(~is_missing_sentinel(col), col)


# ---------------------------------------------------------------------------
# C5 — FIPS classification (utils/location.py:29-51): 2-digit or
# 5-digit-with-'000'-suffix => state level; other 5-digit => county;
# else invalid.
# ---------------------------------------------------------------------------
def fips_is_state_level(fips: Column) -> Column:
    f = fips.cast("string")
    return (F.length(f) == 2) | ((F.length(f) == 5) & (F.substring(f, 3, 3) == "000"))


def fips_state_code(fips: Column) -> Column:
    return F.substring(fips.cast("string"), 1, 2)


def fips_location_name(fips: Column, state_name: Column) -> Column:
    """Human-readable location name per utils/location.py:18-51.

    ``state_name`` is the (broadcast-joined) state name for the leading
    2 chars, NULL on miss.
    """
    f = fips.cast("string")
    state_code = fips_state_code(f)
    county_code = F.substring(f, 3, 3)
    return (
        F.when(
            fips_is_state_level(f),
            F.coalesce(state_name, F.concat(F.lit("Unknown state code: "), state_code)),
        )
        .when(
            F.length(f) == 5,
            F.concat(
                F.lit("County code "),
                county_code,
                F.lit(", "),
                F.coalesce(
                    state_name,
                    F.concat(F.lit("Unknown state ("), state_code, F.lit(")")),
                ),
            ),
        )
        .otherwise(F.concat(F.lit("Invalid FIPS code: "), f))
    )


# C6 — IRI minting rule (utils/location.py:88-98)
def mint_location_iri(fips: Column) -> Column:
    return F.concat(F.lit("http://sws.geonames.org/fips_"), fips.cast("string"), F.lit("/"))


# ---------------------------------------------------------------------------
# C7 — temporal coverage arithmetic (utils/temporal.py:9-21):
# endDate = origin_date - 1 day + max_horizon weeks. The reference loops
# over origin_dates and lets the LAST one win; fixtures are single-valued
# (SURVEY.md §7.4-1), so we take the max deterministically.
# ---------------------------------------------------------------------------
def temporal_end_date(origin_date: Column, max_horizon: Column) -> Column:
    return F.date_add(origin_date, (max_horizon.cast("int") * 7 - 1))


def temporal_interval(start_date: Column, end_date: Column) -> Column:
    """'start/end' ISO-ish interval string (utils/jsonld.py:69-74).

    The reference interpolates pandas Timestamps => 'YYYY-MM-DD 00:00:00'.
    """
    fmt = "yyyy-MM-dd HH:mm:ss"
    return F.concat_ws(
        "/",
        F.date_format(start_date.cast("timestamp"), fmt),
        F.date_format(end_date.cast("timestamp"), fmt),
    )


# C8 — ISO date serialization (utils/model_output_smh.py:10-13)
def iso_date(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


# C11 — filename extension logic (utils/model_output_smh.py:96-102):
# type = name.split('.')[1], 'gz' => 'gz.parquet'
def file_type_of(filename: Column) -> Column:
    ext = F.split(filename, r"\.").getItem(1)
    return F.when(ext == "gz", F.lit("gz.parquet")).otherwise(ext)


# C3/C4 — regex extraction helpers
def extract_schema_version(url: Column) -> Column:
    """/v(\\d+.\\d+.\\d+)/ from a schema URL (run_pipeline.py:26-27)."""
    return F.regexp_extract(url, r"/v(\d+\.\d+\.\d+)/", 1)


def is_round_id(col: Column) -> Column:
    """YYYY-MM-DD round-dir predicate (run_pipeline.py:187-190)."""
    return col.rlike(r"^\d{4}-\d{2}-\d{2}")


# C16 — singleton-vs-list JSON shape rule (create_jsonld_v6_0_0.py:425-428):
# used at emit time; works on pre-serialized JSON strings.
def singleton_or_list_json(arr_json_items: Column) -> Column:
    """arr_json_items: array<string> of serialized JSON objects."""
    return (
        F.when(F.size(arr_json_items) == 0, F.lit(None).cast("string"))
        .when(F.size(arr_json_items) == 1, F.element_at(arr_json_items, 1))
        .otherwise(F.concat(F.lit("["), F.concat_ws(",", arr_json_items), F.lit("]")))
    )
