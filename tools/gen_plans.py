"""Generate PLANS.md: physical-plan evidence that the engine produces the
plans we want — pushed filters, pruned scans, broadcast joins, partial+final
aggregation, no stray shuffles.

Usage: python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def keep(plan: str, needles: tuple) -> str:
    return "\n".join(
        line for line in plan.splitlines() if any(n in line for n in needles)
    )


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as em
    from smh_to_jsonld_spark.plans.pipeline import extract_and_link
    from smh_to_jsonld_spark.session import get_spark
    from smh_to_jsonld_spark.sources import synth

    spark = get_spark(app_name="plans", master="local[4]", shuffle_partitions=4)
    qs = em.queries()

    sections = []

    p = plan_of(qs["token_count"](spark, sf))
    sections.append(
        (
            "Scan pushdown + column pruning (`token_count`)",
            "The `doc_id < 100` predicate reaches the parquet reader; only the two "
            "referenced columns are read.",
            keep(p, ("PushedFilters", "ReadSchema")),
        )
    )

    p = plan_of(qs["broadcast_lookup"](spark, sf))
    sections.append(
        (
            "Dimension lookup is a broadcast join (`broadcast_lookup`)",
            "The nation dim ships to executors; the customer table is never "
            "shuffled for the join — one exchange total, for the final group-by.",
            keep(p, ("BroadcastHashJoin", "BroadcastExchange", "Exchange", "HashAggregate")),
        )
    )

    p = plan_of(qs["pricing_summary"](spark, sf))
    sections.append(
        (
            "Partial + final aggregation (`pricing_summary`)",
            "Map-side partial HashAggregate before the single shuffle; decimal "
            "sums keep results exact and order-independent. ReadSchema is "
            "pruned to the five referenced columns.",
            keep(p, ("HashAggregate", "Exchange", "ReadSchema")),
        )
    )

    p = plan_of(qs["semi_join"](spark, sf))
    sections.append(
        (
            "Observed-set semi-join (`semi_join`)",
            "LeftSemi with broadcast — the J4 observed-targets shape.",
            keep(p, ("Join", "BroadcastExchange", "Exchange")),
        )
    )

    spec = synth.corpus_spec()

    from smh_to_jsonld_spark.operators import extract as exmod

    tr = synth.transcripts_df(spark, spec)
    p_ext = plan_of(exmod.extract_mentions(tr))
    p_spot = plan_of(exmod.spot_mentions(tr))
    py_stages = sum(
        p.count(marker)
        for p in (p_ext, p_spot)
        for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython")
    )
    sections.append(
        (
            "Extraction is pure Catalyst — zero Python stages (r3)",
            "Both transcript extractors (anchored CASE WHEN rlike + "
            "regexp_extract; single-pass lookahead-guarded regexp_extract_all "
            "+ explode) compile to Filter/Project/Generate with no "
            "MapInPandas/ArrowEvalPython operator — the raw text never "
            f"crosses into Python. Python-stage count across both plans: "
            f"**{py_stages}**.",
            keep(p_ext, ("Filter", "Project", "Scan")) + "\n--- spot_mentions ---\n"
            + keep(p_spot, ("Generate", "Project", "Scan")),
        )
    )

    core = extract_and_link(spark, tr)
    p = plan_of(core["facts"])
    sections.append(
        (
            "KG linking stage (facts after `link_locations`)",
            "Alias dictionary and fuzzy-match results are broadcast; the fact "
            "stream has no shuffle from linking itself (the only exchanges "
            "below belong to the mention/conv-dim aggregation upstream). "
            "`InMemoryTableScan` = the persisted mentions feeding multiple "
            "consumers.",
            keep(
                p,
                (
                    "BroadcastHashJoin",
                    "BroadcastExchange",
                    "Exchange",
                    "InMemoryTableScan",
                    "ArrowEvalPython",
                    "MapInPandas",
                ),
            ),
        )
    )
    core["mentions"].unpersist()
    core["conv_wide"].unpersist()

    from pyspark.sql import functions as F

    from smh_to_jsonld_spark.operators import aggregates, dedup

    d = spark.read.parquet(f"{sf}/documents.parquet")
    p = plan_of(dedup.simhash_signatures(d))
    sections.append(
        (
            "SimHash signatures are pure JVM aggregation (`simhash_signatures`)",
            "No Python stage anywhere: explode tokens -> md5-low64 -> 64 flat "
            "bit-sum HashAggregates with map-side partial combine (the shuffle "
            "moves 64 longs per doc, not tokens). Round 1 ran this as a "
            "per-row pandas UDF loop.",
            keep(p, ("HashAggregate", "Exchange", "Generate", "ArrowEvalPython",
                     "MapInPandas", "BatchEvalPython")),
        )
    )

    p = plan_of(
        dedup.minhash_lsh_pairs(d.filter(F.col("doc_id") < 300), num_hashes=32,
                                bands=16, shingle_n=1, threshold=0.8, max_bucket=500)
    )
    sections.append(
        (
            "MinHash LSH candidate generation (`minhash_lsh_pairs`)",
            "Signatures are 32 flat min-aggregates over exploded shingles "
            "(partial+final). Candidates come from the single-pass bucket-pair "
            "expansion (one aggregation per band bucket, no self-join of the "
            "signature table); verification joins shingle sets only for "
            "candidate ids.",
            keep(p, ("HashAggregate", "Exchange", "Generate", "Join")),
        )
    )

    # --- chunked pair expansion memory envelope (r5, VERDICT r4 #6) ------
    from smh_to_jsonld_spark.operators.dedup import _PAIR_EXPAND_CHUNK, _bucket_pairs

    keyed = d.select(
        F.col("doc_id").alias("id"), F.lit(1).alias("sz"), F.lit(0).alias("b")
    )
    p = plan_of(_bucket_pairs(keyed, ["b"], max_bucket=None))
    sections.append(
        (
            "Candidate-pair expansion is CHUNKED — linear transient memory (r5)",
            "`_bucket_pairs` no longer builds a bucket's full B^2/2 pair array "
            "in one transient row (~2.4 GB at B=10k). A first explode fans "
            f"each bucket into ceil(B/{_PAIR_EXPAND_CHUNK}) chunk rows; each "
            f"expands a {_PAIR_EXPAND_CHUNK}-member slice against the member "
            f"list, so peak transient is {_PAIR_EXPAND_CHUNK}*B structs — "
            "~50 MB even at B=100k, LINEAR in bucket size — while the pair "
            "SET is unchanged (pinned by "
            "test_bucket_pairs_chunked_expansion_matches_unchunked). The plan "
            "shows the two Generate stages: chunk fan-out, then pair explode.",
            keep(p, ("Generate", "HashAggregate", "ObjectHashAggregate",
                     "Exchange", "Project")),
        )
    )

    tr = synth.transcripts_df(spark, spec)
    core2 = extract_and_link(spark, tr)
    p = plan_of(aggregates.distinct_field_values(core2["facts"], order_col="turn_order"))
    sections.append(
        (
            "First-appearance distinct lists (`distinct_field_values(order_col)`)",
            "Two shuffles, both map-side combined: (1) groupBy(keys+fields) "
            "min(turn_order) collapses repeated fact combos, (2) the per-field "
            "ordered collect runs over DISTINCT combos only. This is the "
            "fidelity mode that makes emitted docs list-order-identical to the "
            "reference.",
            keep(p, ("HashAggregate", "ObjectHashAggregate", "SortAggregate", "Exchange")),
        )
    )
    core2["mentions"].unpersist()
    core2["conv_wide"].unpersist()

    # --- Catalyst struct flatten (r4): model-doc triples without Python ---
    from smh_to_jsonld_spark.operators.triples import triples_from_structs
    from smh_to_jsonld_spark.plans.pipeline import kg_pipeline_from_transcripts

    res = kg_pipeline_from_transcripts(
        spark,
        synth.transcripts_df(spark, spec),
        synth.target_metadata_df(spark, spec),
        synth.diseases_df(spark, spec),
    )
    p = plan_of(
        triples_from_structs(res["model_docs"].select("doc_id", "doc_struct"))
    )
    py_stages = sum(
        p.count(marker)
        for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython")
    )
    sections.append(
        (
            "Triple flattening is pure Catalyst for model docs (r4)",
            "`triples_from_structs` compiles the document schema into one "
            "generate/explode expression over the TYPED pre-`to_json` struct "
            "— the flatten never serializes docs to JSON, never re-parses, "
            "and runs no Python stage (the Arrow `triples_from_docs` path "
            "remains only for the per-round consolidated docs, one per "
            f"round). Python-stage count in this plan: **{py_stages}**.",
            keep(p, ("Generate", "Project", "MapInPandas", "ArrowEvalPython",
                     "BatchEvalPython")),
        )
    )
    # --- consolidated-doc flatten bound (r5, VERDICT r4 #5) -------------
    cons = res["consolidated"].select(
        "round_id", F.length("doc_json").alias("doc_len")
    ).collect()
    hp = res["model_docs"].groupBy("round_id").count().collect()
    n_rounds = len(cons)
    max_len = max((r.doc_len for r in cons), default=0)
    max_models = max((r["count"] for r in hp), default=0)
    sections.append(
        (
            "Consolidated-doc flatten stays Arrow — bounded by ROUNDS (r5)",
            "The hot path has one flattener (`triples_from_structs`, pure "
            "Catalyst) for model docs; per-round CONSOLIDATED docs keep the "
            "Arrow `triples_from_docs` path because their shape is "
            "dialect-dynamic (healthCondition object-vs-array, v5 last-wins). "
            "That path is bounded by the round count, not the corpus: this "
            f"corpus has **{n_rounds} consolidated docs** (one per round), "
            f"max **{max_models} models/round** (hasPart entries), max doc "
            f"size **{max_len:,} chars**. Rounds are weekly epochs — O(100) "
            "over a decade — so at 100 TB the consolidated flatten handles "
            "hundreds of rows while the model-doc flatten (corpus-sized) "
            "stays JVM-only. Same triple rules both paths, pinned by "
            "tests/test_triples.py.",
            f"consolidated docs = {n_rounds}; max hasPart = {max_models}; "
            f"max doc_json = {max_len:,} chars",
        )
    )
    res["mentions"].unpersist()
    res["conv_wide"].unpersist()
    res["model_docs"].unpersist()
    res["field_values"].unpersist()

    # --- r4 text-quality operators: scan-bound map-only plans ------------
    p_rep = plan_of(qs["repetition_score"](spark, sf))
    p_pii = plan_of(qs["pii_scrub"](spark, sf))
    exchanges = p_rep.count("Exchange") + p_pii.count("Exchange")
    p_tfidf = plan_of(qs["tfidf_top_terms"](spark, sf))
    sections.append(
        (
            "Text-quality filters are map-only; TF-IDF shuffles aggregates only (r4)",
            "`repetition_score` and `pii_scrub` compile to scan+filter+project "
            f"with ZERO exchanges (count across both plans: **{exchanges}**) — "
            "at 100 TB they are scan-bound passes. `tfidf_top_terms` shuffles "
            "twice with map-side partial aggregation (doc-term counts, then "
            "token document frequency) plus the per-doc top-k window; raw "
            "text never moves.",
            keep(p_rep + p_pii, ("Exchange", "Project", "Filter", "Scan parquet",
                                 "PushedFilters"))
            + "\n--- tfidf_top_terms ---\n"
            + keep(p_tfidf, ("HashAggregate", "Exchange", "Window", "Generate")),
        )
    )

    # --- AQE skew-join splitting (r4): runtime salt-and-replicate --------
    skew_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
    }
    old_confs = {k: spark.conf.get(k, None) for k in skew_confs}
    for k, v in skew_confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(120_000).select(
            F.when(F.col("id") % 50 != 0, F.lit("US"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.createDataFrame(
            [("US", "United States")] + [(f"k{i}", f"name{i}") for i in range(1000)],
            "k string, name string",
        )
        joined = left.join(right, "k").select("k", "name", "payload")
        joined.write.format("noop").mode("overwrite").save()
        joined.collect()  # finalize THIS dataset's adaptive plan
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        p = buf.getvalue()
        sections.append(
            (
                "AQE splits the head-entity-skewed join at runtime (r4)",
                "98% of fact rows hit one key ('US'); with broadcast disabled "
                "(dim too big to ship) the sort-merge join's hot partition is "
                "detected from RUNTIME sizes and split into advisory-sized "
                "chunks with the dim side replicated — the salt-and-replicate "
                "rewrite, driven by measured bytes instead of a static guess. "
                "Thresholds are scaled to the fixture; the same path engages "
                "at 256 MB partitions in production. Result equality with the "
                "unsplit join is pinned by tests/test_skew_join.py.",
                keep(p, ("skew=true", "AQEShuffleRead", "SortMergeJoin",
                         "isFinalPlan")),
            )
        )
    finally:
        for k, v in old_confs.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    out = ["# PLANS.md — physical-plan evidence (generated by tools/gen_plans.py)\n"]
    out.append(
        "Excerpts from `.explain('formatted')` on the sf0.01 testdata; "
        "regenerate with `python tools/gen_plans.py`.\n"
    )
    for title, note, body in sections:
        out.append(f"## {title}\n\n{note}\n\n```\n{body}\n```\n")
    Path("PLANS.md").write_text("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
