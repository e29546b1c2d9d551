"""Structured-streaming ingestion of transcript turns.

The reference is purely batch (SURVEY.md §2.8) — its only "streaming" is a
weekly cron. This module is the forward-looking ingestion path: turns
arrive as parquet files, are watermark-deduplicated and window-aggregated,
and land in the same TableIO layout the batch job reads, so a micro-batch
trigger (availableNow) gives incremental builds with the batch engine
unchanged downstream.

Ops included:
- ``read_transcript_stream``  file-source readStream with schema
- ``mention_counts_stream``   tumbling-window per-round mention counts with
                              watermarked late-data handling
- ``dedup_stream``            dropDuplicatesWithinWatermark on
                              (conv_id, turn_idx)
- ``run_available_now``       drain-everything micro-batch into parquet
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smh_to_jsonld_spark.sources.synth import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once turn identity under replays: late duplicates of
    (conv_id, turn_idx) within the watermark are dropped, state is evicted
    past it (bounded state — mandatory at transcript scale)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def mention_counts_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-day windows of fact-mention counts per role, tolerant of
    late data up to the watermark."""
    facts = stream.filter(F.col("text").startswith("observed target="))
    return (
        facts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "role")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "role",
            "n_mentions",
        )
    )


def run_available_now(
    stream_df: DataFrame, out_path: str, checkpoint: str, mode: str = "append"
) -> None:
    """Drain all currently-available input in micro-batches and stop —
    the incremental-build trigger (restart-safe via the checkpoint dir)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
