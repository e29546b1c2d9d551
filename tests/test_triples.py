"""Catalyst struct flattener == Python JSON flattener.

``triples_from_structs`` compiles the doc schema into one JVM-side
expression; these tests pin it triple-for-triple against the semantic
reference ``triples_from_docs`` (json.loads + flatten_doc) on:

- the full fixture doc corpus, BOTH dialects (deep nesting, maps,
  nested arrays, conditional keys, @id nodes);
- an adversarial hand-built frame (empty arrays, null structs, quotes
  and unicode in strings, booleans/longs, map fields, array-of-array,
  sibling array elements whose canonical content-hash must disambiguate).
"""

import pytest
from pyspark.sql import functions as F

from smh_to_jsonld_spark.operators import aggregates, emit, extract
from smh_to_jsonld_spark.operators.triples import (
    triples_from_docs,
    triples_from_structs,
)
from smh_to_jsonld_spark.plans import pipeline
from smh_to_jsonld_spark.sources import synth


def _both(docs, id_col="doc_id"):
    py = {tuple(r) for r in triples_from_docs(docs, id_col=id_col).collect()}
    cat = {tuple(r) for r in triples_from_structs(docs, id_col=id_col).collect()}
    return py, cat


@pytest.mark.parametrize("dialect", ["v6", "v5"])
def test_struct_flatten_matches_python_on_fixture_docs(spark, spec, dialect):
    core = pipeline.extract_and_link(spark, synth.transcripts_df(spark, spec))
    metadata = extract.metadata_from_mentions(core["mentions"], core["conv_dim"])
    files = extract.files_from_mentions(core["mentions"], core["conv_dim"])
    fv = aggregates.distinct_field_values(core["facts"], order_col="turn_order")
    fh = aggregates.file_type_histogram(files)
    docs = emit.model_docs(
        spark, metadata, fv, synth.target_metadata_df(spark, spec), fh,
        dialect=dialect,
    ).select("doc_id", "doc_json", "doc_struct").cache()
    try:
        py, cat = _both(docs)
        assert len(py) > 500  # non-trivial corpus
        assert py == cat
    finally:
        docs.unpersist()


def test_struct_flatten_adversarial_shapes(spark):
    doc = F.struct(
        F.lit('say "hi" \\ soupçon').alias("quoted"),
        F.lit(True).alias("flag"),
        F.lit(42).cast("long").alias("n"),
        F.lit(None).cast("string").alias("dropped"),
        F.lit(None).cast("struct<a:string>").alias("dropped_struct"),
        F.array().cast("array<string>").alias("empty_arr"),
        F.array(F.lit("x"), F.lit("y")).alias("scalars"),
        F.array(F.array(F.lit("p")), F.array(F.lit("q"), F.lit("r"))).alias("nested"),
        F.create_map(F.lit("zz"), F.lit("1"), F.lit("aa"), F.lit("2")).alias("m"),
        F.array(
            F.struct(F.lit("").alias("@id"), F.lit("one").alias("v")),
            F.struct(F.lit("iri:x").alias("@id"), F.lit("two").alias("v")),
            F.struct(F.lit(None).cast("string").alias("@id"), F.lit("three").alias("v")),
        ).alias("items"),
        F.struct(
            F.lit("inner").alias("name"),
            F.array(F.struct(F.lit("deep").alias("d"))).alias("kids"),
        ).alias("child"),
    )
    docs = spark.range(1).select(
        F.concat(F.lit("doc:"), F.col("id")).alias("doc_id"),
        doc.alias("doc_struct"),
        F.to_json(doc, {"ignoreNullFields": "true"}).alias("doc_json"),
    )
    py, cat = _both(docs)
    assert py == cat
    # spot-check the rules survived compilation
    assert ("doc:0", "flag", "true") in cat
    assert ("doc:0", "n", "42") in cat
    assert ("doc:0", "items", "iri:x") in cat          # truthy @id wins
    assert not any(p == "dropped" for _, p, _ in cat)  # nulls emit nothing
    assert not any(p == "empty_arr" for _, p, _ in cat)
    assert ("doc:0/m", "zz", '"1"') in cat             # map entries
    # empty-string @id falls back to content hash: distinct node ids
    item_objs = {o for s, p, o in cat if p == "items" and s == "doc:0"}
    assert len(item_objs) == 3


def test_struct_flatten_passthrough_and_union_shape(spark):
    doc = F.struct(F.lit("v").alias("k"))
    docs = spark.range(3).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        doc.alias("doc_struct"),
        F.lit("2031-01-05").alias("round_id"),
    )
    out = triples_from_structs(docs, passthrough=["round_id"])
    assert out.columns == ["subj", "pred", "obj", "round_id"]
    assert out.count() == 3
    assert out.filter(F.col("round_id") == "2031-01-05").count() == 3


def test_consolidated_triples_fused_matches_unfused(spark):
    """r6 perf fusion pin: consolidated_round_triples (assemble+flatten
    in one grouped Python stage) must emit exactly the triples of the
    unfused consolidated_round_docs -> triples_from_docs chain, both
    dialects, on the fixture corpus."""
    from smh_to_jsonld_spark.operators import emit
    from smh_to_jsonld_spark.operators.triples import triples_from_docs
    from smh_to_jsonld_spark.plans.pipeline import kg_pipeline_from_transcripts
    from smh_to_jsonld_spark.sources import synth

    spec = synth.corpus_spec()
    for dialect in ("v6", "v5"):
        res = kg_pipeline_from_transcripts(
            spark,
            synth.transcripts_df(spark, spec),
            synth.target_metadata_df(spark, spec),
            synth.diseases_df(spark, spec),
            dialect=dialect,
        )
        docs = res["model_docs"]
        diseases = synth.diseases_df(spark, spec)
        fused = emit.consolidated_round_triples(
            docs.select("round_id", "model_name", "doc_json"), diseases,
            dialect=dialect,
        )
        unfused = triples_from_docs(
            emit.consolidated_round_docs(
                docs.select("round_id", "model_name", "doc_json"), diseases,
                dialect=dialect,
            ).select("doc_id", "doc_json", "round_id"),
            passthrough=["round_id"],
        )
        a = sorted(map(tuple, fused.collect()))
        b = sorted(map(tuple, unfused.collect()))
        assert a == b and len(a) > 0, dialect
        for key in ("mentions", "conv_wide", "model_docs", "field_values"):
            res[key].unpersist()
