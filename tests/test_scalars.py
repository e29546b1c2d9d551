"""Unit tests on pure column functions — mirrors the reference's unit tier
(/root/reference/tests/test_jsonld_v6_unit.py)."""

from pyspark.sql import functions as F

from smh_to_jsonld_spark.functions import scalars


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_mint_model_name(spark):
    df = spark.createDataFrame(
        [("team1", "modelA"), ("", "modelB"), (None, "modelC")],
        "team_abbr string, model_abbr string",
    )
    got = [
        r.name
        for r in df.select(
            scalars.mint_model_name(F.col("team_abbr"), F.col("model_abbr")).alias("name")
        ).collect()
    ]
    assert got == ["team1-modelA", "modelB", "modelC"]


def test_description_coalesce_empty_string_is_falsy(spark):
    df = spark.createDataFrame(
        [("long", "short"), (None, "short"), ("", "short")],
        "methods_long string, methods string",
    )
    got = [
        r.d
        for r in df.select(
            scalars.description_of(F.col("methods_long"), F.col("methods")).alias("d")
        ).collect()
    ]
    assert got == ["long", "short", "short"]


def test_missing_sentinels(spark):
    df = spark.createDataFrame(
        [("NA",), ("na",), ("TBD",), ("N/A",), ("NaN",), ("MIT",)], "v string"
    )
    got = [r.m for r in df.select(scalars.is_missing_sentinel(F.col("v")).alias("m")).collect()]
    assert got == [True, True, True, True, True, False]


def test_fips_classification(spark):
    df = spark.createDataFrame([("06",), ("06000",), ("06037",), ("1",)], "f string")
    got = [
        r.s for r in df.select(scalars.fips_is_state_level(F.col("f")).alias("s")).collect()
    ]
    assert got == [True, True, False, False]


def test_fips_location_name_variants(spark):
    rows = [("06", "California"), ("06037", "California"), ("99", None), ("99123", None)]
    df = spark.createDataFrame(rows, "f string, state_name string")
    got = [
        r.n
        for r in df.select(
            scalars.fips_location_name(F.col("f"), F.col("state_name")).alias("n")
        ).collect()
    ]
    # exact strings from /root/reference/utils/location.py:18-51
    assert got == [
        "California",
        "County code 037, California",
        "Unknown state code: 99",
        "County code 123, Unknown state (99)",
    ]


def test_location_iri_minting(spark):
    assert (
        _one(spark, scalars.mint_location_iri(F.lit("06")))
        == "http://sws.geonames.org/fips_06/"
    )


def test_temporal_known_value_regression(spark):
    """The reference's known-value test: 2025-07-27 + 45 weeks - 1 day
    => 2026-06-06 (/root/reference/tests/test_jsonld_v6_unit.py:388-423)."""
    end = _one(
        spark,
        scalars.temporal_end_date(F.to_date(F.lit("2025-07-27")), F.lit(45)),
    )
    assert str(end) == "2026-06-06"


def test_temporal_interval_format(spark):
    got = _one(
        spark,
        scalars.temporal_interval(
            F.to_date(F.lit("2031-01-05")), F.to_date(F.lit("2031-02-01"))
        ),
    )
    assert got == "2031-01-05 00:00:00/2031-02-01 00:00:00"


def test_file_type_of(spark):
    df = spark.createDataFrame(
        [("2031-01-05-m_0.parquet",), ("2031-01-05-m_0.gz.parquet",)], "fn string"
    )
    got = [r.t for r in df.select(scalars.file_type_of(F.col("fn")).alias("t")).collect()]
    assert got == ["parquet", "gz.parquet"]


def test_schema_version_and_round_regex(spark):
    v = _one(
        spark,
        scalars.extract_schema_version(
            F.lit("https://example.org/schemas/v6.0.0/tasks-schema.json")
        ),
    )
    assert v == "6.0.0"
    assert _one(spark, scalars.is_round_id(F.lit("2031-01-05"))) is True
    assert _one(spark, scalars.is_round_id(F.lit("not-a-round"))) is False
