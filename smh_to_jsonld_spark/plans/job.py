"""Resumable materializing KG job (the production entry).

One Spark job builds triples for all NOT-YET-COMMITTED rounds:

1. discover rounds cheaply (filter on the round-header turns only — a
   pushed-down string predicate, no full extraction);
2. anti-join against the partitions already committed in the snapshot log
   (TableIO.completed_partitions) — the resume step;
3. run the triple factory over just the remaining conversations;
4. write node/edge/doc/triple tables partitioned by round_id (append), and
   commit a snapshot manifest with per-partition (per-round) row counts,
   per-predicate triple counts, and input lineage.

Restart-safety: a crash before the manifest commit leaves data files for
an uncommitted round; the overwrite of that partition on retry
(partitionOverwriteMode=dynamic on real clusters / idempotent re-append
here) plus manifest-gated resume makes the job at-least-once with
exactly-once commit visibility — same contract Iceberg gives via
snapshots.
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

    result = kg_pipeline_from_transcripts(
        spark, subset, target_meta, diseases, include_entities=True
    )

    triples = result["triples"]  # carries round_id via flattener passthrough
    # one pass for all metrics: per-round and per-predicate counts
    per_round = {
        r.round_id: r.n
        for r in triples.groupBy("round_id").agg(F.count("*").alias("n")).collect()
    }
    per_pred = {
        r.pred: r.n
        for r in triples.groupBy("pred").agg(F.count("*").alias("n")).collect()
    }

    io.write(
        result["model_docs"].withColumnRenamed("round_id", "round_id"),
        "model_docs",
        partition_by=["round_id"],
        mode="append",
        lineage={"input": lineage_note or "transcripts", "rounds": todo},
        metrics={"partitions": {r: per_round.get(r, 0) for r in todo}},
    )
    io.write(
        result["consolidated"],
        "round_docs",
        partition_by=["round_id"],
        mode="append",
        lineage={"input": lineage_note or "transcripts", "rounds": todo},
        metrics={"partitions": {r: 1 for r in todo}},
    )
    entities = result["entities"]
    io.write(
        entities,
        "entities",
        mode="overwrite",  # global (cross-round) table, rebuilt per commit
        lineage={"input": lineage_note or "transcripts", "rounds": todo},
        metrics={"n_entities": entities.count()},
    )
    manifest = io.write(
        triples,
        "triples",
        partition_by=["round_id"],
        mode="append",
        lineage={"input": lineage_note or "transcripts", "rounds": todo},
        metrics={
            "partitions": per_round,
            "triples_by_pred": per_pred,
            "wall_sec": round(time.perf_counter() - t0, 3),
        },
    )
    return manifest
