"""End-to-end pipeline plans.

``hub_pipeline_from_frames`` is the DataFrame re-expression of the
reference's process_round (/root/reference/pipeline/create_jsonld_v6_0_0.py:
453-497): scan -> per-model distinct-value agg -> broadcast joins ->
doc assembly -> consolidation -> triple flattening. One SparkSession, no
per-round subprocesses; round fan-out is partition parallelism.

``kg_pipeline_from_transcripts`` is the generalized triple factory
(BASELINE.json north_star): transcripts -> pattern extraction (Arrow UDF)
-> entity linking -> reconstructed fact/metadata frames -> the SAME hub
pipeline -> JSON-LD + triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from smh_to_jsonld_spark.operators import aggregates, emit
from smh_to_jsonld_spark.operators.triples import triples_from_docs


def hub_pipeline_from_frames(
    spark: SparkSession,
    metadata: DataFrame,
    facts: DataFrame,
    files: DataFrame,
    target_meta: DataFrame,
    diseases: DataFrame,
) -> dict:
    """Run the full JSON-LD construction over already-structured frames."""
    field_values = aggregates.distinct_field_values(facts)
    file_hist = aggregates.file_type_histogram(files)
    docs = emit.model_docs(spark, metadata, field_values, target_meta, file_hist)
    consolidated = emit.consolidated_round_docs(
        docs.select("round_id", "model_name", "doc_json"), diseases
    )
    all_docs = docs.select("doc_id", "doc_json").union(
        consolidated.select("doc_id", "doc_json")
    )
    triples = triples_from_docs(all_docs)
    return {
        "field_values": field_values,
        "model_docs": docs,
        "consolidated": consolidated,
        "triples": triples,
    }
