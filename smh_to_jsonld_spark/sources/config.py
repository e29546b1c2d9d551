"""tasks.json config source (S5/J5) with schema-version dispatch (C3).

The reference sniffs `/v(\\d+.\\d+.\\d+)/` from schema_version and
dispatches v5.1.0 vs v6.0.0 scripts (/root/reference/run_pipeline.py:19-29,
256-271). Here the config parses driver-side (config-sized data) into two
broadcastable dimension DataFrames; the version string selects emission
dialect downstream.

Shape handled (both dialects):
  rounds[].round_id | round_id_from_variable -> task_ids[var].required[0]
  rounds[].disease (v5) | rounds[].additional_metadata.disease (v6)
  rounds[].model_tasks[].output_type{name: ...}
  rounds[].model_tasks[].target_metadata[] (uri/alternative_name may live
      under additional_metadata in v6)
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

VERSION_RE = re.compile(r"v?(\d+\.\d+\.\d+)")

# target_pos = config insertion order: build_target_objects iterates
# `target_metadata.items()` (create_jsonld_v6_0_0.py:239), so emitted
# variableMeasured order is tasks.json dict order, not sorted order.
TARGET_META_SCHEMA = (
    "round_id string, target_id string, target_name string, description string,"
    " target_units string, target_keys map<string,string>, target_type string,"
    " is_step_ahead boolean, time_unit string, uri string, alternative_name string,"
    " available_output_types array<string>, target_pos int"
)


def sniff_schema_version(tasks_data: dict) -> str:
    sv = tasks_data.get("schema_version") or ""
    m = re.search(r"/v(\d+\.\d+\.\d+)/", sv) or VERSION_RE.search(sv)
    return m.group(1) if m else ""


def dialect_of(version: str) -> str:
    return "v5" if version.startswith("5.") else "v6"


def _extract_round_id(round_data: dict):
    if not round_data.get("round_id_from_variable", False):
        v = round_data.get("round_id")
        return str(v) if v is not None else None
    var = round_data.get("round_id")
    for mt in round_data.get("model_tasks", []):
        cfg = mt.get("task_ids", {}).get(var, {})
        req = cfg.get("required") if isinstance(cfg, dict) else None
        if req:
            return str(req[0])
    return None


def match_round(tasks_data: dict, round_id: str) -> dict:
    """J5: pick the round matching `round_id`; error lists candidates
    (matches create_jsonld_v6_0_0.load_tasks_and_round_config:101-126)."""
    found = []
    for rd in tasks_data.get("rounds", []):
        rid = _extract_round_id(rd)
        if rid:
            found.append(rid)
        if rid == round_id:
            return rd
    raise ValueError(
        f"Round '{round_id}' not found. Available round ids: "
        f"{', '.join(found) if found else 'none'}"
    )


def parse_tasks_config(path: str) -> dict:
    with open(path) as f:
        tasks_data = json.load(f)
    version = sniff_schema_version(tasks_data)
    rounds = []
    for rd in tasks_data.get("rounds", []):
        rid = _extract_round_id(rd)
        if rid is None:
            continue
        diseases = (rd.get("additional_metadata") or {}).get("disease") or rd.get(
            "disease", []
        )
        # first-wins target metadata + cross-task output-type union (A7/A9)
        targets: dict[str, dict] = {}
        for mt in rd.get("model_tasks", []):
            ot_names = sorted((mt.get("output_type") or {}).keys())
            for t in mt.get("target_metadata", []):
                tid = t.get("target_id")
                if not tid:
                    continue
                if tid in targets:
                    targets[tid]["_ots"].update(ot_names)
                    continue
                am = t.get("additional_metadata") or {}
                targets[tid] = {
                    "target_id": tid,
                    "target_name": t.get("target_name"),
                    "description": t.get("description"),
                    "target_units": t.get("target_units"),
                    "target_keys": t.get("target_keys"),
                    "target_type": t.get("target_type"),
                    "is_step_ahead": t.get("is_step_ahead"),
                    "time_unit": t.get("time_unit"),
                    "uri": t.get("uri") or am.get("uri"),
                    "alternative_name": t.get("alternative_name")
                    or am.get("alternative_name"),
                    "_ots": set(ot_names),
                }
        rounds.append({"round_id": rid, "diseases": diseases, "targets": targets})
    return {"version": version, "dialect": dialect_of(version), "rounds": rounds}


def target_metadata_df(spark: SparkSession, cfg: dict) -> DataFrame:
    rows = []
    for rnd in cfg["rounds"]:
        for pos, t in enumerate(rnd["targets"].values()):
            rows.append(
                (
                    rnd["round_id"],
                    t["target_id"],
                    t["target_name"],
                    t["description"],
                    t["target_units"],
                    t["target_keys"],
                    t["target_type"],
                    t["is_step_ahead"],
                    t["time_unit"],
                    t["uri"],
                    t["alternative_name"],
                    sorted(t["_ots"]),
                    pos,
                )
            )
    return spark.createDataFrame(rows, schema=TARGET_META_SCHEMA)


def diseases_df(spark: SparkSession, cfg: dict) -> DataFrame:
    rows = []
    for rnd in cfg["rounds"]:
        for i, d in enumerate(rnd["diseases"]):
            rows.append((rnd["round_id"], i, d.get("name"), d.get("uri")))
    return spark.createDataFrame(
        rows, schema="round_id string, disease_idx int, name string, uri string"
    )
