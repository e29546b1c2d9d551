"""Iceberg backend integration — SKIPPED when the runtime jar is absent
(this sandbox has no network to fetch it). On a real cluster:

    spark-submit --packages $(python -c "from smh_to_jsonld_spark.sources.tables \
        import ICEBERG_PACKAGE; print(ICEBERG_PACKAGE)") ...

The parquet backend's TableIO tests cover the shared manifest/resume
logic; these cover the Iceberg-specific surface: catalog conf, the
days(ts)+bucket(conv_id) transcript DDL, and writeTo commits.

Jar-fetch retry log (per-round, VERDICT r3 task 8):
- 2026-08-17 (r4): `curl repo1.maven.org` -> "Could not resolve host";
  DNS still blackholed, jar unfetchable, tests below stay skipped.
- 2026-08-17 (r5): retried `curl https://repo1.maven.org/maven2/` and
  `socket.gethostbyname` -> "Name or service not known"; unchanged.
- 2026-08-22 (r6): retried both -> "Name or service not known";
  unchanged, tests below stay skipped.
"""

import pytest

from smh_to_jsonld_spark.sources import synth
from smh_to_jsonld_spark.sources.tables import (
    IcebergTableIO,
    create_transcript_table,
    iceberg_available,
    iceberg_session_conf,
)


def test_session_conf_shape(tmp_path):
    conf = iceberg_session_conf(str(tmp_path / "wh"), catalog="c1")
    assert conf["spark.sql.catalog.c1"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.c1.type"] == "hadoop"
    assert conf["spark.sql.catalog.c1.warehouse"].endswith("wh")
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_iceberg_roundtrip(spark, spec, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath (no network in sandbox)")
    for k, v in iceberg_session_conf(str(tmp_path / "wh")).items():
        spark.conf.set(k, v)
    create_transcript_table(spark)
    tr = synth.transcripts_df(spark, spec)
    tr.writeTo("smhkg.kg.transcripts").append()
    back = spark.read.table("smhkg.kg.transcripts")
    assert back.count() == tr.count()

    io = IcebergTableIO(str(tmp_path / "wh"))
    assert not io.exists(spark, "t1")
    io.write(tr.limit(10), "t1", partition_by=["conv_id"],
             mode="overwrite_partitions", metrics={"partitions": {"x": 10}})
    assert io.exists(spark, "t1")
    assert io.read(spark, "t1").count() == 10
    assert io.completed_partitions("t1") == {"x"}
