"""spark-submit entry point.

Cluster usage:
    spark-submit --py-files smh_to_jsonld_spark.zip \
        -m smh_to_jsonld_spark.cli --transcripts <path-or-synth:N,T> \
        --output /warehouse/kg [--resume]

Local sandbox usage:
    python -m smh_to_jsonld_spark.cli --transcripts synth:1000,24 \
        --output /tmp/kg_out

The job is resumable by construction: re-running with the same --output
skips rounds whose partitions are already committed in the snapshot log
(plans.job.run_resumable_kg_job).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="PySpark KG construction pipeline")
    p.add_argument(
        "--transcripts",
        required=True,
        help="parquet path of the transcripts table, or 'synth:<n_conv>,<turns>'"
        " for the deterministic generator, or 'spec' for the fixture corpus",
    )
    p.add_argument("--output", required=True, help="warehouse root for TableIO")
    p.add_argument(
        "--tasks-config",
        default=None,
        help="path to a hubverse tasks.json; builds the target/disease dims"
        " via sources.config (REQUIRED for real transcript parquet inputs —"
        " synthetic inputs default to the built-in fixture spec)",
    )
    p.add_argument("--master", default=None, help="override master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument(
        "--clean",
        nargs="*",
        metavar="ROUND_ID",
        default=None,
        help="instead of running: clean exported round files/dirs under"
        " --output (all rounds, or just the listed ones); with --dry-run"
        " only reports (reference pipeline/clean_output.py)",
    )
    p.add_argument("--dry-run", action="store_true")
    p.add_argument(
        "--dialect",
        choices=["v6", "v5"],
        default=None,
        help="hubverse schema dialect for JSON-LD emission; default: sniff"
        " from --tasks-config when given (sources.config.dialect_of),"
        " else v6",
    )
    p.add_argument(
        "--fuzzy-blocking",
        choices=["prefix", "minhash"],
        default="prefix",
        help="candidate-generation family for fuzzy entity linking (keep"
        " constant per warehouse — the linking memo caches per-surface"
        " answers)",
    )
    args = p.parse_args(argv)

    if args.clean is not None:
        from smh_to_jsonld_spark.operators.sinks import clean_output

        plan = clean_output(
            args.output, rounds=args.clean or None, dry_run=args.dry_run
        )
        print(json.dumps(plan, indent=1))
        return 0 if not plan["errors"] else 1

    from smh_to_jsonld_spark.plans.job import run_resumable_kg_job
    from smh_to_jsonld_spark.session import get_spark
    from smh_to_jsonld_spark.sources import synth
    from smh_to_jsonld_spark.sources.tables import TableIO

    spark = get_spark(
        app_name="smhkg-cli", master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    spec = synth.corpus_spec()
    if args.transcripts == "spec":
        transcripts = synth.transcripts_df(spark, spec)
        lineage = "synth:spec"
    elif args.transcripts.startswith("synth:"):
        n_conv, turns = (int(x) for x in args.transcripts[6:].split(","))
        transcripts = synth.transcripts_at_scale(spark, n_conv, turns)
        lineage = args.transcripts
    else:
        if args.tasks_config is None:
            # real data + hard-coded synthetic dims silently mislabels
            # every target/disease — refuse instead (advice r1)
            p.error(
                "--tasks-config is required when --transcripts is a real"
                " parquet path (the built-in dims cover only the synthetic"
                " fixture rounds)"
            )
        transcripts = spark.read.parquet(args.transcripts)
        lineage = args.transcripts

    dialect = args.dialect
    if args.tasks_config:
        from smh_to_jsonld_spark.sources import config as cfg

        parsed = cfg.parse_tasks_config(args.tasks_config)
        target_meta = cfg.target_metadata_df(spark, parsed)
        diseases = cfg.diseases_df(spark, parsed)
        if dialect is None:
            # the reference sniffs the schema version from tasks.json
            # (run_pipeline.py:256-271) — same dispatch here
            dialect = parsed["dialect"]
    else:
        target_meta = synth.target_metadata_df(spark, spec)
        diseases = synth.diseases_df(spark, spec)
    dialect = dialect or "v6"


    io = TableIO(args.output)
    manifest = run_resumable_kg_job(
        spark,
        transcripts,
        target_meta,
        diseases,
        io,
        lineage_note=lineage,
        fuzzy_blocking=args.fuzzy_blocking,
        dialect=dialect,
    )
    print(json.dumps(manifest, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
