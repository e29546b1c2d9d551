"""Resumable materializing KG job (the production entry).

One Spark job builds triples for all NOT-YET-COMMITTED rounds:

1. discover rounds cheaply (filter on the round-header turns only — a
   pushed-down string predicate, no full extraction);
2. anti-join against the partitions already committed in the snapshot log
   (TableIO.completed_partitions) — the resume step;
3. run the triple factory over just the remaining conversations;
4. write node/edge/doc/triple tables partitioned by round_id with DYNAMIC
   PARTITION OVERWRITE, and commit snapshot manifests with per-partition
   (per-round) row counts, per-predicate triple counts, and input lineage
   — the triples manifest (the resume gate) is committed LAST.

Restart-safety: a crash anywhere before the final triples-manifest commit
leaves the rounds uncommitted; the retry re-selects them and dynamic
partition overwrite REPLACES whatever partial partitions the crashed run
wrote (no duplicate appends, for every table). Manifest renames are
atomic. Net: at-least-once execution, exactly-once commit visibility —
the contract Iceberg gives via snapshot atomicity.

Single-execution discipline: model_docs/consolidated are persisted before
any action, triples data is written FIRST, and all metrics are derived
from the MATERIALIZED triples table (a cheap parquet re-scan), so the
post-extraction plan (linking -> emit -> flatten) executes exactly once —
round 1 re-ran it per metric collect and per table write.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smh_to_jsonld_spark.plans.pipeline import kg_pipeline_from_transcripts
from smh_to_jsonld_spark.sources.tables import TableIO


def discover_round_of_conv(transcripts: DataFrame) -> DataFrame:
    """(conv_id, round_id) from the round-header turns only.

    The filter on `text` prefix is evaluated at the scan (pushed predicate
    + column pruning: only conv_id/text are read)."""
    return (
        transcripts.filter(F.col("text").startswith("Round "))
        .select(
            "conv_id",
            F.regexp_extract("text", r"^Round (\d{4}-\d{2}-\d{2})", 1).alias("round_id"),
        )
        .filter(F.col("round_id") != "")
        .distinct()
    )


def run_resumable_kg_job(
    spark: SparkSession,
    transcripts: DataFrame,
    target_meta: DataFrame,
    diseases: DataFrame,
    io: TableIO,
    lineage_note: str = "",
) -> dict:
    """Process all uncommitted rounds; returns the committed manifest
    (or {'skipped': ...} when nothing to do)."""
    t0 = time.perf_counter()
    conv_round = discover_round_of_conv(transcripts)
    all_rounds = {r.round_id for r in conv_round.select("round_id").distinct().collect()}
    done = io.completed_partitions("triples")
    todo = sorted(all_rounds - done)
    if not todo:
        return {"skipped": True, "rounds_done": sorted(done)}

    todo_convs = conv_round.filter(F.col("round_id").isin(todo)).select("conv_id")
    # bounded set (conversations of the open rounds) — broadcast semi-join
    # keeps the big transcript scan shuffle-free
    subset = transcripts.join(F.broadcast(todo_convs), "conv_id", "left_semi")

    from pyspark.storagelevel import StorageLevel

    result = kg_pipeline_from_transcripts(
        spark, subset, target_meta, diseases, include_entities=True
    )
    lineage = {"input": lineage_note or "transcripts", "rounds": todo}

    # docs/consolidated feed BOTH their own table writes and the triple
    # flattener — persist so the emit plan materializes once (triples
    # write) and the doc writes are cache scans.
    docs = result["model_docs"].persist(StorageLevel.MEMORY_AND_DISK)
    cons = result["consolidated"].persist(StorageLevel.MEMORY_AND_DISK)
    triples = result["triples"]  # carries round_id via flattener passthrough

    # 1. triples DATA first (single execution of the whole plan) ...
    io.write_data(triples, "triples", partition_by=["round_id"],
                  mode="overwrite_partitions")
    # ... 2. all metrics from the MATERIALIZED table (cheap re-scan, no
    # recompute), restricted to this commit's rounds
    # partition-dir values are type-inferred on read (2031-01-05 => date);
    # normalize back to the string round ids the manifests use
    written = (
        io.read(spark, "triples")
        .withColumn("round_id", F.col("round_id").cast("string"))
        .filter(F.col("round_id").isin(todo))
    )
    per_round = {
        r.round_id: r.n
        for r in written.groupBy("round_id").agg(F.count("*").alias("n")).collect()
    }
    per_pred = {
        r.pred: r.n
        for r in written.groupBy("pred").agg(F.count("*").alias("n")).collect()
    }

    # 3. secondary tables (persisted inputs — no pipeline re-execution)
    io.write(
        docs,
        "model_docs",
        partition_by=["round_id"],
        mode="overwrite_partitions",
        lineage=lineage,
        metrics={"partitions": {r: per_round.get(r, 0) for r in todo}},
    )
    io.write(
        cons,
        "round_docs",
        partition_by=["round_id"],
        mode="overwrite_partitions",
        lineage=lineage,
        metrics={"partitions": {r: 1 for r in todo}},
    )
    entities = result["entities"].persist(StorageLevel.MEMORY_AND_DISK)
    io.write(
        entities,
        "entities",
        mode="overwrite",  # global (cross-round) table, rebuilt per commit
        lineage=lineage,
        metrics={"n_entities": entities.count()},
    )

    # node/edge KG materialization (north_rule: "materializing node/edge
    # Iceberg tables") — rebuilt from the FULL materialized triples table
    # (all committed rounds, a parquet re-scan — no plan re-execution), so
    # a resume commit leaves a complete graph, not just the new rounds'.
    from smh_to_jsonld_spark.operators.emit import materialize_graph

    all_triples = io.read(spark, "triples").withColumn(
        "round_id", F.col("round_id").cast("string")
    )
    nodes, edges = materialize_graph(all_triples)
    io.write(
        nodes, "nodes", mode="overwrite",
        lineage=lineage, metrics={"rounds": todo},
    )
    io.write(
        edges, "edges", partition_by=["round_id"], mode="overwrite",
        lineage=lineage, metrics={"partitions": {r: 1 for r in todo}},
    )

    # 4. the gating manifest LAST: only now do the rounds count as done
    manifest = io.commit(
        "triples",
        mode="overwrite_partitions",
        partition_by=["round_id"],
        lineage=lineage,
        metrics={
            "partitions": per_round,
            "triples_by_pred": per_pred,
            "wall_sec": round(time.perf_counter() - t0, 3),
        },
    )
    docs.unpersist()
    cons.unpersist()
    entities.unpersist()
    return manifest
