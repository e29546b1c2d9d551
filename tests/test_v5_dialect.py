"""v5.1.0 dialect: emission differences + config reader + version dispatch."""

import json
from pathlib import Path

from smh_to_jsonld_spark.operators.triples import precision_recall
from smh_to_jsonld_spark.plans.pipeline import kg_pipeline_from_transcripts
from smh_to_jsonld_spark.sources import config as cfgmod
from smh_to_jsonld_spark.sources import synth

FIXTURES = Path(__file__).parent / "fixtures"


def test_v5_transcript_pipeline_pr(spark, spec):
    res = kg_pipeline_from_transcripts(
        spark,
        synth.transcripts_df(spark, spec),
        synth.target_metadata_df(spark, spec),
        synth.diseases_df(spark, spec),
        dialect="v5",
    )
    mine = {(r.subj, r.pred, r.obj) for r in res["triples"].collect()}
    with open(FIXTURES / "golden_triples_v5.json") as f:
        golden = {tuple(t) for t in json.load(f)}
    p, r = precision_recall(mine, golden)
    assert p >= 0.999 and r >= 0.999, (p, r)


def test_v5_specifics_vs_v6(spark, spec):
    """v5: no alternateName; healthCondition always single (last wins)."""
    common = dict(
        spark=spark,
        transcripts=synth.transcripts_df(spark, spec),
        target_meta=synth.target_metadata_df(spark, spec),
        diseases=synth.diseases_df(spark, spec),
    )
    v5 = kg_pipeline_from_transcripts(**common, dialect="v5")
    v6 = kg_pipeline_from_transcripts(**common, dialect="v6")
    v5_preds = {r.pred for r in v5["triples"].select("pred").distinct().collect()}
    v6_preds = {r.pred for r in v6["triples"].select("pred").distinct().collect()}
    assert "alternateName" not in v5_preds
    assert "alternateName" in v6_preds

    # round 2 has two diseases: v6 => array (2 entries), v5 => last only
    c5 = {r.round_id: json.loads(r.doc_json) for r in v5["consolidated"].collect()}
    c6 = {r.round_id: json.loads(r.doc_json) for r in v6["consolidated"].collect()}
    assert isinstance(c6["2031-02-02"]["healthCondition"], list)
    assert isinstance(c5["2031-02-02"]["healthCondition"], dict)
    assert c5["2031-02-02"]["healthCondition"]["name"] == "Influenza"
    assert isinstance(c6["2031-01-05"]["healthCondition"], dict)


def test_config_reader_and_version_sniffing(tmp_path, spark, spec):
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from gen_reference_fixture import tasks_json_for_round

    for version, dialect in [("6.0.0", "v6"), ("5.1.0", "v5")]:
        p = tmp_path / f"tasks_{version}.json"
        with open(p, "w") as f:
            json.dump(tasks_json_for_round(spec["rounds"][0], version), f)
        cfg = cfgmod.parse_tasks_config(str(p))
        assert cfg["version"] == version
        assert cfg["dialect"] == dialect
        assert cfg["rounds"][0]["round_id"] == "2031-01-05"
        assert "inc hosp" in cfg["rounds"][0]["targets"]
        tm = cfgmod.target_metadata_df(spark, cfg)
        assert tm.count() == 3
        dz = cfgmod.diseases_df(spark, cfg)
        assert dz.count() == 1


def test_match_round_error_lists_candidates(tmp_path, spec):
    import sys

    import pytest

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from gen_reference_fixture import tasks_json_for_round

    data = tasks_json_for_round(spec["rounds"][0], "6.0.0")
    assert cfgmod.match_round(data, "2031-01-05")["round_id"] == "2031-01-05"
    with pytest.raises(ValueError, match="2031-01-05"):
        cfgmod.match_round(data, "1999-01-01")


def test_v5_docs_canonical_identical_first_appearance(spark, spec):
    """v5 counterpart of the v6 list-order fidelity test: all 10 model
    docs are canonical-JSON-identical WITH list order. Round docs compare
    with hasPart as an order-insensitive set because the v5 reference
    consolidates in raw os.listdir order (utils/jsonld.py:208) — a
    filesystem artifact, not a semantic rule (the engine uses the v6
    model-name order instead, deterministically)."""
    import pathlib

    from smh_to_jsonld_spark.plans.pipeline import kg_pipeline_from_transcripts

    res = kg_pipeline_from_transcripts(
        spark,
        synth.transcripts_df(spark, spec),
        synth.target_metadata_df(spark, spec),
        synth.diseases_df(spark, spec),
        dialect="v5",
    )
    docs = {r.doc_id: json.loads(r.doc_json) for r in res["model_docs"].collect()}
    rdocs = {r.doc_id: json.loads(r.doc_json) for r in res["consolidated"].collect()}

    def canon(x):
        return json.dumps(x, sort_keys=True)

    fixtures = pathlib.Path(__file__).parent / "fixtures" / "golden_docs_v5"
    checked = 0
    for p in sorted(fixtures.glob("doc_2*__*.json")):
        rid, mdl = p.stem.replace("doc_", "", 1).split("__")
        assert canon(docs[f"doc:{rid}/{mdl}"]) == canon(json.loads(p.read_text())), p.stem
        checked += 1
    for p in sorted(fixtures.glob("doc_round_*.json")):
        rid = p.stem.replace("doc_round_", "")
        gold = json.loads(p.read_text())
        ours = rdocs[f"doc:round_{rid}"]
        gold_parts = sorted(canon(m) for m in gold.pop("hasPart"))
        our_parts = sorted(canon(m) for m in ours.pop("hasPart"))
        assert our_parts == gold_parts, rid
        assert canon(ours) == canon(gold), rid
        checked += 1
    assert checked == 12
