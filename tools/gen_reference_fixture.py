"""Golden-fixture generator: EXECUTES the reference implementation
(/root/reference, read-only) on our deterministic synthetic corpus and
commits its emitted JSON-LD — flattened to (subj, pred, obj) triples —
as the P/R ground truth (BASELINE.json: triple P/R >= 0.95).

No reference code is copied; it is imported and run. The only reference
function bypassed is ``get_hub_ds`` (it needs the unavailable `hubdata`
package + real parquet): we hand the reference's own
``get_distinct_field_values`` an equivalent pandas frame built from the
same spec, exercising its dropna/drop_duplicates semantics verbatim.

Usage:  python tools/gen_reference_fixture.py
Writes: tests/fixtures/golden_triples.json
        tests/fixtures/golden_docs/          (raw reference JSON-LD)
        tests/fixtures/key_fields.json       (snapshot-regression fields)
"""

from __future__ import annotations

import json
import sys
import tempfile
import types
from pathlib import Path

import pandas as pd
import yaml

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
FIXTURES = REPO / "tests" / "fixtures"

sys.path.insert(0, str(REPO))

from smh_to_jsonld_spark.operators.triples import flatten_doc  # noqa: E402
from smh_to_jsonld_spark.sources import synth  # noqa: E402


def _shim_hubdata():
    """utils.model_output_smh imports hubdata at module scope; provide a
    stub so the import succeeds (we never call the shimmed functions)."""
    if "hubdata" not in sys.modules:
        mod = types.ModuleType("hubdata")
        mod.connect_hub = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("hubdata shim: not used by fixture generation")
        )
        mod.create_hub_schema = mod.connect_hub
        sys.modules["hubdata"] = mod


def _write_hub_layout(spec: dict, root: Path) -> None:
    """Render the corpus spec as the reference's on-disk hub layout."""
    for rnd in spec["rounds"]:
        rdir = root / "data" / rnd["round_id"]
        (rdir / "model-metadata").mkdir(parents=True, exist_ok=True)
        (rdir / "hub-config").mkdir(parents=True, exist_ok=True)
        for mdl in rnd["models"]:
            meta = dict(mdl["metadata"])
            with open(rdir / "model-metadata" / f"{mdl['model_name']}.yaml", "w") as f:
                yaml.safe_dump(meta, f, sort_keys=False)
            odir = rdir / "model-output" / mdl["model_name"]
            odir.mkdir(parents=True, exist_ok=True)
            for fn in mdl["files"]:
                (odir / fn).touch()  # names only; file-type histogram walks names
        tasks = {
            "schema_version": "https://example.org/schemas/v6.0.0/tasks-schema.json",
            "rounds": [
                {
                    "round_id": rnd["round_id"],
                    "round_id_from_variable": False,
                    "additional_metadata": {"disease": rnd["diseases"]},
                    "model_tasks": [
                        {
                            "task_ids": {},
                            "output_type": {
                                name: {"output_type_id": {}, "value": {}}
                                for name in rnd["output_type_names"]
                            },
                            "target_metadata": [
                                {
                                    "target_id": t["target_id"],
                                    "target_name": t["target_name"],
                                    "description": t["description"],
                                    "target_units": t["target_units"],
                                    "target_keys": t["target_keys"],
                                    "target_type": t["target_type"],
                                    "is_step_ahead": t["is_step_ahead"],
                                    "time_unit": t["time_unit"],
                                    "uri": t["uri"],
                                    "alternative_name": t["alternative_name"],
                                }
                                for t in rnd["target_metadata"]
                            ],
                        }
                    ],
                }
            ],
        }
        with open(rdir / "hub-config" / "tasks.json", "w") as f:
            json.dump(tasks, f, indent=2)


def _model_facts_frame(spec: dict, round_id: str, model_name: str) -> pd.DataFrame:
    rows = [
        r
        for r in synth.facts_rows(spec)
        if r[0] == round_id and r[1] == model_name
    ]
    cols = [
        "round_id", "model_id", "origin_date", "scenario_id", "location",
        "age_group", "target", "horizon", "output_type", "value",
    ]
    return pd.DataFrame(rows, columns=cols)


class _SchemaNames:
    """Duck-typed stand-in for the hubverse schema object: the reference
    only reads ``.names`` (utils/model_output_smh.py:66)."""

    names = [
        "origin_date", "scenario_id", "location", "age_group", "target",
        "horizon", "output_type", "value",
    ]


def run_reference(spec: dict, workdir: Path) -> dict:
    """Execute the reference v6 pipeline; return {doc_id: doc_dict}."""
    _shim_hubdata()
    sys.path.insert(0, str(REFERENCE))
    from pipeline.create_jsonld_v6_0_0 import (  # noqa: E402
        create_consolidated_round_jsonld_v6,
        enrich_jsonld_with_model_output_v6,
        extract_diseases,
        extract_target_metadata,
        load_tasks_and_round_config,
        merge_field_values,
    )
    from utils.jsonld import yaml_to_jsonld  # noqa: E402
    from utils.model_output_smh import get_distinct_field_values  # noqa: E402

    _write_hub_layout(spec, workdir)
    docs: dict[str, dict] = {}
    out_root = workdir / "output"

    for rnd in spec["rounds"]:
        round_id = rnd["round_id"]
        round_path = workdir / "data" / round_id
        _, round_config = load_tasks_and_round_config(round_path, round_id)
        target_metadata = extract_target_metadata(round_config)
        diseases = extract_diseases(round_config)
        round_out = out_root / round_id
        round_out.mkdir(parents=True, exist_ok=True)

        global_fv: dict = {}
        for mdl in sorted(rnd["models"], key=lambda m: m["model_name"]):
            model_name = mdl["model_name"]
            yaml_path = round_path / "model-metadata" / f"{model_name}.yaml"
            jsonld_data = yaml_to_jsonld(str(yaml_path))
            hub_df = _model_facts_frame(spec, round_id, model_name)
            dfv = get_distinct_field_values(hub_df, _SchemaNames())
            merge_field_values(global_fv, dfv)
            enrich_jsonld_with_model_output_v6(
                jsonld_data, round_id, model_name, str(round_path), target_metadata, dfv
            )
            with open(round_out / f"{model_name}.jsonld", "w") as f:
                json.dump(jsonld_data, f, indent=2, default=str)
            docs[f"doc:{round_id}/{model_name}"] = json.loads(
                json.dumps(jsonld_data, default=str)
            )

        create_consolidated_round_jsonld_v6(str(round_out), str(out_root), round_id, diseases)
        with open(out_root / f"round_{round_id}_v6.0.0.jsonld") as f:
            docs[f"doc:round_{round_id}"] = json.load(f)

    return docs


def main() -> None:
    spec = synth.corpus_spec()
    FIXTURES.mkdir(parents=True, exist_ok=True)
    (FIXTURES / "golden_docs").mkdir(exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        docs = run_reference(spec, Path(td))

    triples = []
    for doc_id, doc in sorted(docs.items()):
        with open(FIXTURES / "golden_docs" / (doc_id.replace(":", "_").replace("/", "__") + ".json"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=False)
        triples.extend(flatten_doc(doc, doc_id))

    uniq = sorted(set(triples))
    with open(FIXTURES / "golden_triples.json", "w") as f:
        json.dump(uniq, f, indent=0)

    key_fields = {}
    for doc_id, doc in sorted(docs.items()):
        if doc_id.startswith("doc:round_"):
            key_fields[doc_id] = {
                "identifier": doc.get("identifier"),
                "numberOfItems": doc.get("numberOfItems"),
                "healthCondition": doc.get("healthCondition"),
                "model_names": sorted(p.get("name") for p in doc.get("hasPart", [])),
            }
    with open(FIXTURES / "key_fields.json", "w") as f:
        json.dump(key_fields, f, indent=2)

    print(f"docs: {len(docs)}  unique triples: {len(uniq)}")


if __name__ == "__main__":
    main()
