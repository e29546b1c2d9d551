"""Sinks — SURVEY.md §2.1 S7/S8/S9.

- ``write_jsonld_files``: one .jsonld file per entity (the reference's
  per-model json.dump, create_jsonld_v6_0_0.py:374-376). Implemented as a
  partitioned text write: at scale one-file-per-entity is an anti-pattern,
  so the default is per-round directories of part files each holding one
  JSON-LD document per line (JSON-LD in NDJSON framing); a
  ``one_file_per_doc`` driver-side export exists for small result sets
  (bounded by collect, documented).
- ``render_round_html``: minimal HTML report from a consolidated round doc
  (the jsonld_to_html.py:555-661 analog; presentation only, driver-side
  over the already-tiny consolidated docs).
"""

from __future__ import annotations

import html
import json
import os
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonld_files(
    docs: DataFrame, out_dir: str, one_file_per_doc: bool = False
) -> None:
    """docs: (round_id, doc_id, doc_json)."""
    if not one_file_per_doc:
        (
            docs.select("round_id", "doc_json")
            .write.mode("overwrite")
            .partitionBy("round_id")
            .text(out_dir)
        )
        return
    # small-set export with reference-style file naming (doc_id -> file)
    for row in docs.select("round_id", "doc_id", "doc_json").collect():
        rdir = Path(out_dir) / row.round_id
        rdir.mkdir(parents=True, exist_ok=True)
        name = row.doc_id.split("/")[-1].replace(":", "_") + ".jsonld"
        with open(rdir / name, "w") as f:
            json.dump(json.loads(row.doc_json), f, indent=2)


def render_round_html(consolidated_doc: dict) -> str:
    """Minimal per-round HTML (title, disease, model roster, counts)."""
    title = html.escape(consolidated_doc.get("name", "Round"))
    hc = consolidated_doc.get("healthCondition") or {}
    if isinstance(hc, list):
        disease = ", ".join(html.escape(d.get("name") or "") for d in hc)
    else:
        disease = html.escape(hc.get("name") or "")
    items = []
    for part in sorted(
        consolidated_doc.get("hasPart", []), key=lambda p: (p.get("name") or "").lower()
    ):
        nm = html.escape(part.get("name") or "?")
        ver = html.escape(str(part.get("version") or ""))
        lic = html.escape(str(part.get("license") or ""))
        items.append(f"<li><b>{nm}</b> v{ver} — license {lic}</li>")
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title></head><body>"
        f"<h1>{title}</h1>"
        f"<p>Disease: {disease}</p>"
        f"<p>Models: {consolidated_doc.get('numberOfItems', 0)}</p>"
        f"<ul>{''.join(items)}</ul>"
        "</body></html>"
    )


def write_round_html(consolidated: DataFrame, out_dir: str) -> None:
    """Render every consolidated round doc to <out_dir>/round_<id>.html —
    driver-side loop over the per-round docs (one per round; bounded)."""
    os.makedirs(out_dir, exist_ok=True)
    for row in consolidated.select("round_id", "doc_json").collect():
        with open(Path(out_dir) / f"round_{row.round_id}.html", "w") as f:
            f.write(render_round_html(json.loads(row.doc_json)))


def roster_validation(model_docs: DataFrame, consolidated: DataFrame) -> dict:
    """J7/U4 post-hoc validation (run_pipeline.py:201-254): per-model doc
    names vs consolidated hasPart names must be set-equal, per round.
    Returns {round_id: {'missing': [...], 'extra': [...]}} for mismatches."""
    expected = model_docs.select("round_id", F.col("model_name").alias("name"))
    actual = consolidated.select(
        "round_id",
        F.explode(
            F.from_json(
                F.col("doc_json"), "STRUCT<hasPart: ARRAY<STRUCT<name: STRING>>>"
            )["hasPart"]
        ).alias("p"),
    ).select("round_id", F.col("p.name").alias("name"))

    missing = (
        expected.join(actual, ["round_id", "name"], "left_anti")
        .groupBy("round_id")
        .agg(F.sort_array(F.collect_list("name")).alias("names"))
        .collect()
    )
    extra = (
        actual.join(expected, ["round_id", "name"], "left_anti")
        .groupBy("round_id")
        .agg(F.sort_array(F.collect_list("name")).alias("names"))
        .collect()
    )
    out: dict = {}
    for r in missing:
        out.setdefault(r.round_id, {"missing": [], "extra": []})["missing"] = list(r.names)
    for r in extra:
        out.setdefault(r.round_id, {"missing": [], "extra": []})["extra"] = list(r.names)
    return out
