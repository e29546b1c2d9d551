"""TableIO — storage layer with snapshot manifests.

Production target is Iceberg (`spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-*`, hadoop catalog, tables
partitioned by days(ts) + bucket(conv_id)); the Iceberg runtime jar cannot
be fetched in this sandbox (no network), so the `parquet` backend provides
the same API over a directory layout and emulates snapshot metadata with a
`_snapshots/` JSON manifest per commit carrying per-partition lineage +
row/triple counts (the north_rule's "lineage + metrics per snapshot").

Everything above this layer is backend-agnostic: swap `format='iceberg'`
(and a catalog) and the engine code is unchanged. The reference's analog
is its per-round output-dir lifecycle (rmtree+mkdir,
/root/reference/pipeline/create_jsonld_v6_0_0.py:76-82) — here idempotent
partition overwrite + append-only snapshot history.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, root: str, fmt: str = "parquet"):
        self.root = Path(root)
        self.fmt = fmt
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported format: {fmt}")

    # -- paths ------------------------------------------------------------
    def table_path(self, table: str) -> str:
        return str(self.root / table)

    def _snap_dir(self, table: str) -> Path:
        return self.root / table / "_snapshots"

    # -- io ---------------------------------------------------------------
    def write_data(
        self,
        df: DataFrame,
        table: str,
        partition_by: list | None = None,
        mode: str = "append",
    ) -> None:
        """Write table data WITHOUT committing a manifest (pair with
        ``commit``). mode='overwrite_partitions' uses dynamic partition
        overwrite (spark.sql.sources.partitionOverwriteMode=dynamic), so a
        crashed-then-retried job REPLACES the partitions it re-writes
        instead of appending duplicates — the crash-safety contract
        Iceberg gives via snapshot atomicity."""
        spark = df.sparkSession
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        if mode == "overwrite_partitions":
            prev = spark.conf.get(conf_key, "static")
            spark.conf.set(conf_key, "dynamic")
            try:
                writer = df.write.mode("overwrite")
                if partition_by:
                    writer = writer.partitionBy(*partition_by)
                writer.parquet(self.table_path(table))
            finally:
                spark.conf.set(conf_key, prev)
            return
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.table_path(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        partition_by: list | None = None,
        mode: str = "append",
        lineage: dict | None = None,
        metrics: dict | None = None,
    ) -> dict:
        """Write a table and commit a snapshot manifest with lineage +
        metrics. Returns the manifest."""
        self.write_data(df, table, partition_by, mode)
        return self.commit(table, mode, partition_by, lineage, metrics)

    def commit(
        self,
        table: str,
        mode: str = "append",
        partition_by: list | None = None,
        lineage: dict | None = None,
        metrics: dict | None = None,
    ) -> dict:
        """Commit a snapshot manifest for already-written data. The
        manifest rename is atomic (os.replace), and resume reads ONLY
        committed manifests — so 'data written, manifest missing' is the
        recoverable at-least-once state, healed by the next run's dynamic
        partition overwrite."""
        snap_dir = self._snap_dir(table)
        snap_dir.mkdir(parents=True, exist_ok=True)
        existing = sorted(snap_dir.glob("snap-*.json"))
        snap_id = len(existing)
        manifest = {
            "snapshot_id": snap_id,
            "table": table,
            "mode": mode,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "partition_by": partition_by or [],
            "lineage": lineage or {},
            "metrics": metrics or {},
        }
        tmp = snap_dir / f".snap-{snap_id:06d}.json.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, snap_dir / f"snap-{snap_id:06d}.json")
        return manifest

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.table_path(table))

    def exists(self, spark: SparkSession, table: str) -> bool:
        """True when the table has committed data files (not just an empty
        dir or orphan snapshot metadata)."""
        p = Path(self.table_path(table))
        if not p.exists():
            return False
        return any(p.rglob("*.parquet"))

    # -- snapshot history ---------------------------------------------------
    def snapshots(self, table: str) -> list:
        snap_dir = self._snap_dir(table)
        if not snap_dir.exists():
            return []
        out = []
        for p in sorted(snap_dir.glob("snap-*.json")):
            with open(p) as f:
                out.append(json.load(f))
        return out

    def completed_partitions(self, table: str, key: str = "partitions") -> set:
        """Union of partition values recorded as committed across all
        snapshots — the resume set."""
        done: set = set()
        for snap in self.snapshots(table):
            done.update(snap.get("metrics", {}).get(key, {}).keys())
        return done


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list,
    num_buckets: int = 64,
    path: str | None = None,
) -> None:
    """Bucketed staging table — the parquet-backend analog of the Iceberg
    DDL's ``bucket(64, conv_id)`` (create_transcript_table below): rows
    are hash-bucketed into ``num_buckets`` files per partition and the
    layout is recorded in the session catalog, so joins/aggregations
    between tables bucketed the same way need NO shuffle exchange — the
    co-located-join strategy for the repeatedly-joined staging tables
    (mentions x conv_dim at 10^12 turns). Overwrites any prior table of
    the same name. ``path`` makes it external (defaults to the session
    warehouse dir)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


# ---------------------------------------------------------------------------
# Iceberg backend — the production target (north_rule: "Iceberg transcript
# tables at 10^12-turn scale"). The runtime jar is not fetchable in this
# sandbox, so everything here is exercised by tests only when the jar is
# present (tests/test_iceberg_backend.py skip marker); the code path itself
# is complete: session conf, DDL with days(ts)+bucket(conv_id) partitioning,
# and writeTo()-based commits.
# ---------------------------------------------------------------------------

ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def iceberg_session_conf(warehouse: str, catalog: str = "smhkg") -> dict:
    """Spark conf for a Hadoop-catalog Iceberg deployment. Cluster usage:

        spark-submit --packages {ICEBERG_PACKAGE} \\
            --conf spark.sql.extensions=...IcebergSparkSessionExtensions \\
            --py-files smh_to_jsonld_spark.zip -m smh_to_jsonld_spark.cli ...
    """
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_transcript_table(
    spark: SparkSession, catalog: str = "smhkg", name: str = "kg.transcripts"
) -> None:
    """DDL for the authoritative input table (BASELINE.json input_hint),
    partitioned by days(ts) for time pruning and bucket(conv_id) so one
    conversation's turns co-locate — extraction then never shuffles raw
    text, and the per-conversation window sort is partition-local."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {catalog}.{name} (
            conv_id  STRING,
            turn_idx INT,
            role     STRING,
            text     STRING,
            tool     STRING,
            ts       TIMESTAMP
        ) USING iceberg
        PARTITIONED BY (days(ts), bucket(64, conv_id))
        """
    )


class IcebergTableIO(TableIO):
    """TableIO over an Iceberg catalog: data commits ride Iceberg's own
    snapshot atomicity (writeTo().overwritePartitions()), while the JSON
    manifest layer stays as the engine's lineage/metrics + resume gate —
    mirroring how the parquet backend pairs write_data with commit.
    """

    def __init__(self, root: str, catalog: str = "smhkg", namespace: str = "kg"):
        super().__init__(root, fmt="iceberg")
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def write_data(self, df, table, partition_by=None, mode="append"):
        spark = df.sparkSession
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}")
        ident = self._ident(table)
        writer = df.writeTo(ident)
        exists = spark.catalog.tableExists(ident)
        if not exists:
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.create()
        elif mode == "overwrite_partitions":
            writer.overwritePartitions()
        elif mode == "overwrite":
            writer.replace()
        else:
            writer.append()

    def read(self, spark: SparkSession, table: str):
        return spark.read.table(self._ident(table))

    def exists(self, spark: SparkSession, table: str) -> bool:
        return spark.catalog.tableExists(self._ident(table))
