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


def tasks_json_for_round(rnd: dict, version: str = "6.0.0") -> dict:
    """tasks.json content for one round; v6 puts diseases under
    additional_metadata, v5 at round level (the dataclass parser reads
    round_data['disease'], utils/tasks_json_parser.py:88-92)."""
    round_entry = {
        "round_id": rnd["round_id"],
        "round_id_from_variable": False,
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
    if version.startswith("6"):
        round_entry["additional_metadata"] = {"disease": rnd["diseases"]}
    else:
        round_entry["disease"] = rnd["diseases"]
    return {
        "schema_version": f"https://example.org/schemas/v{version}/tasks-schema.json",
        "rounds": [round_entry],
    }


def _write_hub_layout(spec: dict, root: Path, version: str = "6.0.0") -> None:
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
        with open(rdir / "hub-config" / "tasks.json", "w") as f:
            json.dump(tasks_json_for_round(rnd, version), f, indent=2)


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


def run_reference_v5(spec: dict, workdir: Path) -> dict:
    """Execute the reference v5.1.0 pipeline path (utils/jsonld.py
    enrich_jsonld_with_model_output + create_consolidated_round_jsonld,
    utils/tasks_smh.get_targets, dataclass config parser)."""
    import os

    _shim_hubdata()
    sys.path.insert(0, str(REFERENCE))
    from utils.jsonld import (  # noqa: E402
        create_consolidated_round_jsonld,
        enrich_jsonld_with_model_output,
        yaml_to_jsonld,
    )
    from utils.model_output_smh import get_distinct_field_values  # noqa: E402
    from utils.tasks_json_parser import read_tasks_config  # noqa: E402

    _write_hub_layout(spec, workdir, version="5.1.0")
    docs: dict[str, dict] = {}
    out_root = workdir / "output"
    cwd = os.getcwd()
    os.chdir(workdir)  # v5 file-type scan uses relative data/<round>/... paths
    try:
        for rnd in spec["rounds"]:
            round_id = rnd["round_id"]
            round_path = workdir / "data" / round_id
            config = read_tasks_config(str(round_path / "hub-config" / "tasks.json"))
            round_out = out_root / round_id
            round_out.mkdir(parents=True, exist_ok=True)

            global_fv: dict = {}
            fv_by_model: dict = {}
            for mdl in sorted(rnd["models"], key=lambda m: m["model_name"]):
                model_name = mdl["model_name"]
                yaml_path = round_path / "model-metadata" / f"{model_name}.yaml"
                jsonld_data = yaml_to_jsonld(str(yaml_path))
                hub_df = _model_facts_frame(spec, round_id, model_name)
                dfv = get_distinct_field_values(hub_df, _SchemaNames())
                fv_by_model[model_name] = dfv
                from pipeline.create_jsonld_v5_1_0 import merge_field_values as mfv5

                mfv5(global_fv, dfv)
                enrich_jsonld_with_model_output(
                    jsonld_data, round_id, model_name, config, dfv
                )
                with open(round_out / f"{model_name}.jsonld", "w") as f:
                    json.dump(jsonld_data, f, indent=2, default=str)
                docs[f"doc:{round_id}/{model_name}"] = json.loads(
                    json.dumps(jsonld_data, default=str)
                )

            create_consolidated_round_jsonld(
                str(round_out), round_id, config, global_fv, fv_by_model,
                output_dir=str(out_root), schema_version="5.1.0",
            )
            with open(out_root / f"round_{round_id}_v5.1.0.jsonld") as f:
                docs[f"doc:round_{round_id}"] = json.load(f)
    finally:
        os.chdir(cwd)
    return docs


def main() -> None:
    spec = synth.corpus_spec()
    FIXTURES.mkdir(parents=True, exist_ok=True)
    (FIXTURES / "golden_docs").mkdir(exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        docs = run_reference(spec, Path(td))
    with tempfile.TemporaryDirectory() as td:
        docs_v5 = run_reference_v5(spec, Path(td))

    triples = []
    for doc_id, doc in sorted(docs.items()):
        with open(FIXTURES / "golden_docs" / (doc_id.replace(":", "_").replace("/", "__") + ".json"), "w") as f:
            json.dump(doc, f, indent=1, sort_keys=False)
        triples.extend(flatten_doc(doc, doc_id))

    uniq = sorted(set(triples))
    with open(FIXTURES / "golden_triples.json", "w") as f:
        json.dump(uniq, f, indent=0)

    (FIXTURES / "golden_docs_v5").mkdir(exist_ok=True)
    triples_v5 = []
    for doc_id, doc in sorted(docs_v5.items()):
        with open(
            FIXTURES / "golden_docs_v5"
            / (doc_id.replace(":", "_").replace("/", "__") + ".json"), "w"
        ) as f:
            json.dump(doc, f, indent=1, sort_keys=False)
        triples_v5.extend(flatten_doc(doc, doc_id))
    uniq_v5 = sorted(set(triples_v5))
    with open(FIXTURES / "golden_triples_v5.json", "w") as f:
        json.dump(uniq_v5, f, indent=0)
    print(f"v5 docs: {len(docs_v5)}  v5 unique triples: {len(uniq_v5)}")

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
