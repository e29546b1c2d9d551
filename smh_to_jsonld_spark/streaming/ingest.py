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
- ``mention_stream``          the batch extraction run incrementally
- ``linked_entity_counts_stream``  spot -> broadcast-link -> windowed
                              per-entity counts (speed layer)
- ``conversation_sessions``   applyInPandasWithState sessionization
- ``fact_triples_stream``     per-turn fact triples landed continuously
                              (stateless + stream-static exact linking)
- ``doc_signature_stream``    stateless per-doc MinHash signatures into
                              the incremental near-dup bronze layer
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


def read_document_stream(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source document stream (the dedup speed layer's input):
    parquet drops of (doc_id, text, ...) rows."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def doc_signature_stream(stream: DataFrame, **kw) -> DataFrame:
    """Incremental front end of the near-dup dedup pass: per-doc MinHash
    band hashes + shingle-hash sets computed STATELESSLY on the document
    stream (operators.dedup.minhash_doc_signatures_rowwise — pure per-row
    projection, append-mode legal with no watermark/state).

    Landing these in the ``doc_signatures`` bronze layout means the batch
    job's incremental near-dup stage (plans.job.rebuild_near_dups) finds
    its per-doc state already materialized when a commit runs — the same
    speed-layer / batch-layer split as ``mention_stream``. Value-identical
    to the batch signature pass (pinned by
    test_doc_signature_stream_matches_batch)."""
    from smh_to_jsonld_spark.operators.dedup import minhash_doc_signatures_rowwise

    return minhash_doc_signatures_rowwise(stream, **kw)


def fact_triples_stream(
    stream: DataFrame, spark: SparkSession, watermark: str = "1 hour"
) -> DataFrame:
    """Incremental triple materialization: watermark-deduped turn stream
    -> Catalyst mention extraction -> per-turn fact triples
    (operators.triples.triples_from_fact_mentions — stateless projection
    + one stream-static broadcast join). Doc-level JSON-LD triples remain
    batch (they need full-conversation and corpus context); this lands
    the turn-grain fact log continuously so the batch commit starts from
    materialized triples instead of raw text.

    Late data: inherits ``dedup_stream``'s contract — turns later than the
    watermark never reach the triple log and are upgraded by the batch
    commit (pinned by
    test_fact_triples_stream_late_data_drop_and_batch_upgrade)."""
    from smh_to_jsonld_spark.operators.extract import extract_mentions
    from smh_to_jsonld_spark.operators.triples import triples_from_fact_mentions

    return triples_from_fact_mentions(
        extract_mentions(dedup_stream(stream, watermark)), spark
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once turn identity under replays: duplicates of
    (conv_id, turn_idx) within the watermark are dropped, state is evicted
    past it (bounded state — mandatory at transcript scale).

    Late-data contract (pinned by
    test_fact_triples_stream_late_data_drop_and_batch_upgrade): rows whose
    event time predates the current watermark are dropped ENTIRELY by the
    stateful-operator late-record filter — late replays can never re-emit
    (state eviction notwithstanding), and genuinely late NEW turns are
    silently absent from the stream output. Downstream speed-layer tables
    are therefore complete only up to the watermark; the batch job, which
    re-reads the full transcript table at each commit, is the documented
    upgrade path for late turns (the same speed/batch split as fuzzy
    linking)."""
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


CONV_STATE_SCHEMA = "n_turns long, max_turn_idx int, n_fact_turns long"
CONV_OUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx int, n_fact_turns long, closed boolean"
)


def conversation_sessions(stream: DataFrame, watermark: str = "1 hour",
                          idle_timeout_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Custom stateful operator: per-conversation running session state via
    applyInPandasWithState.

    Keeps (n_turns, max_turn_idx, n_fact_turns) per conv_id; emits an
    updated summary row on every micro-batch a conversation appears in,
    and a final `closed=true` row when the conversation has been idle past
    the processing-time timeout. State is bounded: eviction on timeout is
    what makes this safe at transcript scale.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, max_turn, n_fact = state.get
            state.remove()
            yield pd.DataFrame(
                [(conv_id, n_turns, max_turn, n_fact, True)],
                columns=["conv_id", "n_turns", "max_turn_idx", "n_fact_turns", "closed"],
            )
            return
        n_turns, max_turn, n_fact = state.get if state.exists else (0, -1, 0)
        for pdf in pdf_iter:
            n_turns += len(pdf)
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            n_fact += int(pdf["text"].str.startswith("observed target=").sum())
        state.update((n_turns, max_turn, n_fact))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(conv_id, n_turns, max_turn, n_fact, False)],
            columns=["conv_id", "n_turns", "max_turn_idx", "n_fact_turns", "closed"],
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=CONV_OUT_SCHEMA,
            stateStructType=CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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


def mention_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Incremental front end of the triple factory: the SAME Catalyst
    extraction (operators.extract.extract_mentions) applied to a
    watermark-deduplicated turn stream. Landing these mention rows in the
    bronze layout means the batch job's extraction cost is already paid
    when a round closes — it resumes from materialized mentions instead of
    raw text."""
    from smh_to_jsonld_spark.operators.extract import extract_mentions

    return extract_mentions(dedup_stream(stream, watermark))


def linked_entity_counts_stream(
    stream: DataFrame, spark: SparkSession, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming entity linking: free-text mention spotting
    (operators.extract.spot_mentions — stateless Catalyst, stream-safe,
    with ``ts`` passed through) -> normalize -> resolve through the exact
    alias dictionary (a static broadcast DataFrame; stream-static joins
    are natively supported) -> tumbling 1-day windowed counts per
    canonical entity with watermarked late-data handling.

    The fuzzy pass is deliberately absent on the hot stream: unresolved
    surfaces pass through as themselves, and the BATCH job's memoized
    linking (plans.job.rebuild_entities) upgrades them at the next commit
    — the classic speed-layer / batch-layer split."""
    from smh_to_jsonld_spark.functions.dims import alias_dim
    from smh_to_jsonld_spark.operators import link as linkops
    from smh_to_jsonld_spark.operators.extract import spot_mentions

    spotted = spot_mentions(
        stream.withWatermark("ts", watermark), passthrough=("ts",)
    ).filter(F.col("kind") == "entity")
    dim = alias_dim(spark).select(
        F.col("alias").alias("__norm"), F.col("canonical")
    )
    linked = (
        spotted.withColumn("__norm", linkops.normalize_surface(F.col("term")))
        .join(F.broadcast(dim), "__norm", "left")
        .withColumn("entity", F.coalesce(F.col("canonical"), F.col("__norm")))
    )
    return (
        linked.groupBy(F.window("ts", "1 day").alias("w"), "entity")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "entity",
            "n_mentions",
        )
    )
