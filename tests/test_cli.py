"""CLI argument contract: real parquet inputs must carry a real tasks
config (advice r1: silently joining real data against the synthetic
fixture dims mislabels every target/disease)."""

import json
import sys

import pytest

from smh_to_jsonld_spark import cli
from smh_to_jsonld_spark.sources import synth


def test_real_parquet_requires_tasks_config(spark, spec, tmp_path, monkeypatch):
    src = str(tmp_path / "real.parquet")
    synth.transcripts_df(spark, spec).write.parquet(src)
    with pytest.raises(SystemExit):
        cli.main(["--transcripts", src, "--output", str(tmp_path / "out")])


def test_real_parquet_with_tasks_config_runs(spark, spec, tmp_path):
    sys.path.insert(0, "tools")
    from gen_reference_fixture import tasks_json_for_round

    src = str(tmp_path / "real.parquet")
    synth.transcripts_df(spark, spec).write.parquet(src)
    tasks = {
        "schema_version": "https://example.org/v6.0.0/tasks-schema.json",
        "rounds": [tasks_json_for_round(r, "6.0.0")["rounds"][0] for r in spec["rounds"]],
    }
    cfg_path = tmp_path / "tasks.json"
    cfg_path.write_text(json.dumps(tasks))

    rc = cli.main([
        "--transcripts", src,
        "--tasks-config", str(cfg_path),
        "--output", str(tmp_path / "out2"),
    ])
    assert rc == 0
    snaps = json.loads((tmp_path / "out2" / "triples" / "_snapshots" / "snap-000000.json").read_text())
    assert snaps["metrics"]["partitions"].keys() == {"2031-01-05", "2031-02-02"}


def test_cli_clean_dry_run_and_delete(tmp_path):
    out = tmp_path / "output"
    (out / "2031-01-05").mkdir(parents=True)
    (out / "round_2031-01-05.jsonld").write_text("{}")

    rc = cli.main(["--transcripts", "spec", "--output", str(out),
                   "--clean", "2031-01-05", "--dry-run"])
    assert rc == 0 and (out / "round_2031-01-05.jsonld").exists()
    rc = cli.main(["--transcripts", "spec", "--output", str(out),
                   "--clean", "2031-01-05"])
    assert rc == 0 and not (out / "round_2031-01-05.jsonld").exists()
    assert not (out / "2031-01-05").exists()


def test_cli_dialect_sniffed_from_tasks_config(spark, spec, tmp_path):
    """--tasks-config with a 5.x schema_version must dispatch the v5
    emission rules without an explicit --dialect (the reference's
    run_pipeline version sniffing)."""
    sys.path.insert(0, "tools")
    from gen_reference_fixture import tasks_json_for_round

    src = str(tmp_path / "real.parquet")
    synth.transcripts_df(spark, spec).write.parquet(src)
    tasks = {
        "schema_version": "https://example.org/v5.1.0/tasks-schema.json",
        "rounds": [tasks_json_for_round(r, "5.1.0")["rounds"][0] for r in spec["rounds"]],
    }
    cfg_path = tmp_path / "tasks5.json"
    cfg_path.write_text(json.dumps(tasks))

    rc = cli.main([
        "--transcripts", src,
        "--tasks-config", str(cfg_path),
        "--output", str(tmp_path / "out5"),
    ])
    assert rc == 0
    docs = spark.read.parquet(str(tmp_path / "out5" / "model_docs"))
    doc = json.loads(docs.first().doc_json)
    # v5 dialect marker: model docs carry no alternateName (v6-only field)
    assert "alternateName" not in doc
