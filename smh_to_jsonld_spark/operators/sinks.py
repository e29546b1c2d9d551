"""Sinks — SURVEY.md §2.1 S7/S8/S9.

- ``write_jsonld_files``: one .jsonld file per entity (the reference's
  per-model json.dump, create_jsonld_v6_0_0.py:374-376). Implemented as a
  partitioned text write: at scale one-file-per-entity is an anti-pattern,
  so the default is per-round directories of part files each holding one
  JSON-LD document per line (JSON-LD in NDJSON framing); the
  ``one_file_per_doc`` mode reproduces the reference's file-per-model
  layout via ``foreachPartition`` — executors write their own docs, no
  driver collect anywhere in the export path.
- ``render_round_html``: minimal HTML report from a consolidated round doc
  (the jsonld_to_html.py:555-661 analog; presentation only, driver-side
  over the already-tiny consolidated docs).
"""

from __future__ import annotations

import html
import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_file_writer(out_dir: str):
    """Executor-side writer: one reference-style .jsonld file per doc.

    Runs inside ``foreachPartition`` — each task writes ITS docs straight
    to the (shared) filesystem, nothing is collected to the driver, so the
    export parallelizes with the data. ``doc_id`` is unique per doc, so
    file names never collide across DISTINCT docs; dir creation races are
    benign (``exist_ok``).

    Write protocol (ADVICE r4): each file is written to a task-unique temp
    name and atomically ``os.replace``d into place — a task retry or a
    speculative duplicate of the same partition then produces a complete
    file (last full write wins) instead of two writers interleaving into
    one torn file. REQUIREMENT: this mode assumes executors and driver
    share one POSIX filesystem (local mode, NFS, or a FUSE-mounted object
    store) — ``write_jsonld_files`` fails fast when ``out_dir`` is not
    visible on the executor; on a cluster with executor-local disks use
    the default NDJSON mode, which goes through Hadoop's committer."""

    def write_partition(rows) -> None:
        # attempt-unique temp name (ADVICE r5): os.getpid() alone can
        # collide across executor containers with independent PID
        # namespaces (speculative/retried attempts of the same
        # partition), interleaving into one torn temp file — and one
        # attempt's cleanup could unlink the other's live temp. A uuid4
        # per attempt makes the temp path globally unique; os.replace
        # keeps last-full-write-wins semantics.
        attempt = uuid.uuid4().hex
        for row in rows:
            rdir = Path(out_dir) / row.round_id
            rdir.mkdir(parents=True, exist_ok=True)
            name = row.doc_id.split("/")[-1].replace(":", "_") + ".jsonld"
            tmp = rdir / f".{name}.{attempt}.tmp"
            try:
                with open(tmp, "w") as f:
                    json.dump(json.loads(row.doc_json), f, indent=2)
                os.replace(tmp, rdir / name)  # atomic within one FS
            finally:
                if tmp.exists():
                    tmp.unlink()

    return write_partition


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
    # reference-style file naming (doc_id -> file), written by EXECUTORS:
    # no driver collect, scales to any number of docs on a shared FS.
    # Fail fast if executors don't share the driver's filesystem (ADVICE
    # r4): probe that a driver-written marker is visible from a task —
    # otherwise this mode would "succeed" while scattering files across
    # executor-local disks.
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    marker = out / ".shared_fs_probe"
    marker.write_text("probe")
    try:
        visible = (
            docs.sparkSession.sparkContext.parallelize([str(marker)], 1)
            .map(os.path.exists)
            .collect()[0]
        )
    finally:
        marker.unlink(missing_ok=True)
    if not visible:
        raise RuntimeError(
            "write_jsonld_files(one_file_per_doc=True) requires a shared "
            f"POSIX filesystem: {out_dir} is not visible from executors. "
            "Use the default NDJSON mode on clusters with executor-local "
            "disks."
        )
    docs.select("round_id", "doc_id", "doc_json").foreachPartition(
        _doc_file_writer(out_dir)
    )


def model_output_snippet_html(
    spark, n: int, round_id: str, model: str, data_root: str = "data"
) -> str:
    """O3/S2: head(n) + '...' separator + tail(1) HTML snippet of a
    model's output parquet (jsonld_to_html.py:15-37
    get_first_n_rows_of_output). Reads BOTH .parquet and .gz.parquet
    (the glob matches either suffix); missing dir/files -> "".

    Bounded report input (one model's files), so head/tail actions are
    cheap; at scale the per-model directory is already the partition.
    """
    model_dir = Path(data_root) / round_id / "model-output" / model
    files = sorted(str(p) for p in model_dir.glob("*.parquet"))
    if not files:
        return ""
    df = spark.read.parquet(*files)
    if "model_id" in df.columns:
        df = df.filter(F.col("model_id") == model)
    cols = df.columns
    head = df.limit(n + 1).collect()
    if not head:
        return ""
    rows = [[r[c] for c in cols] for r in head[:n]]
    if len(head) > n:  # more rows exist: separator + last row
        rows.append(["..."] * len(cols))
        rows.extend([[r[c] for c in cols] for r in df.tail(1)])
    th = "".join(f"<th>{html.escape(str(c))}</th>" for c in cols)
    trs = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(v))}</td>" for v in row) + "</tr>"
        for row in rows
    )
    return f"<table border=\"0\"><thead><tr>{th}</tr></thead><tbody>{trs}</tbody></table>"


def load_geodata_mapping(path: str = "geodata/geodata.csv") -> dict:
    """iso3166-2 code -> geonames URL (jsonld_to_html.py:384-398); empty
    dict when the CSV is absent — the search-link fallback then kicks in."""
    import csv

    mapping = {}
    p = Path(path)
    if p.exists():
        with open(p) as f:
            for row in csv.DictReader(f):
                mapping[row["iso3166_2"]] = row["geoname_url"]
    return mapping


def _location_link(loc: dict, geodata_map: dict) -> str:
    """Geonames URL when mapped, geonames SEARCH link when only a code is
    known, bare name otherwise (jsonld_to_html.py:384-405)."""
    name = html.escape(loc.get("gn:name") or "Unknown")
    code = loc.get("iso3166-2:code") or ""
    if code and code in geodata_map:
        return f'<a href="{html.escape(geodata_map[code])}" target="_blank">{name} ({html.escape(code)})</a>'
    if code:
        q = (loc.get("gn:name") or "Unknown").replace(" ", "+")
        return (
            f'<a href="https://www.geonames.org/search.html?q={html.escape(q)}"'
            f' target="_blank">{name} ({html.escape(code)})</a>'
        )
    return name


def render_round_html(
    consolidated_doc: dict,
    model_docs: dict | None = None,
    geodata_map: dict | None = None,
    snippet_fn=None,
) -> str:
    """Per-round HTML report (jsonld_to_html.py:555-661): roster index,
    then a section per model with license LINK (J3 map, upper-cased exact
    match, miss renders bare name), website, description, spatial
    coverage with geonames URL/search fallback (J2), and the
    head(n)+...+tail data snippet when a ``snippet_fn(model_name)`` is
    given.

    ``model_docs``: {model_name: parsed per-model doc} for the detail
    sections; roster-only report when omitted.
    """
    from smh_to_jsonld_spark.functions.dims import LICENSE_URLS

    geodata_map = geodata_map or {}
    title = html.escape(consolidated_doc.get("name", "Round"))
    hc = consolidated_doc.get("healthCondition") or {}
    if isinstance(hc, list):
        disease = ", ".join(html.escape(d.get("name") or "") for d in hc)
    else:
        disease = html.escape(hc.get("name") or "")
    parts = sorted(
        consolidated_doc.get("hasPart", []), key=lambda p: (p.get("name") or "").lower()
    )
    items = []
    sections = []
    for idx, part in enumerate(parts):
        nm = html.escape(part.get("name") or "?")
        ver = html.escape(str(part.get("version") or ""))
        lic_raw = str(part.get("license") or "N/A").upper()
        lic = html.escape(lic_raw)
        if lic_raw in LICENSE_URLS:
            lic_html = f'<a href="{LICENSE_URLS[lic_raw]}" target="_blank">{lic}</a>'
        else:
            lic_html = lic
        items.append(
            f'<li><a href="#model-{idx}"><b>{nm}</b></a> v{ver} — license {lic_html}</li>'
        )
        doc = (model_docs or {}).get(part.get("name"))
        if doc is None:
            continue
        sec = [f'<div class="model" id="model-{idx}"><h2>{nm}</h2>']
        info = [f"<strong>Version:</strong> {ver}",
                f"<strong>License:</strong> {lic_html}"]
        if doc.get("website"):
            w = html.escape(doc["website"])
            info.append(f'<strong>Website:</strong> <a href="{w}" target="_blank">{w}</a>')
        sec.append(f"<p>{' '.join(info)}</p>")
        if doc.get("description"):
            sec.append(f"<p><strong>Description:</strong> {html.escape(doc['description'])}</p>")
        # contributors block (jsonld_to_html.py:326-349 generate_authors
        # _section): name / affiliation-name-or-N/A / mailto link
        authors = doc.get("author") or []
        if authors:
            blocks = []
            for a in authors:
                nm_a = html.escape(a.get("name") or "Unknown")
                aff = html.escape((a.get("affiliation") or {}).get("name") or "N/A")
                blk = f"<strong>{nm_a}</strong><br><em>{aff}</em><br>"
                if a.get("email"):
                    e = html.escape(a["email"])
                    blk += f'<a href="mailto:{e}">{e}</a>'
                blocks.append(f'<div class="author">{blk}</div>')
            sec.append(
                f'<h3>Authors</h3><div class="authors-grid">{"".join(blocks)}</div>'
            )
        we = doc.get("workExample") or {}
        # temporalCoverage "start/end" split with time-of-day stripped
        # (jsonld_to_html.py:538-553 generate_temporal_coverage_section)
        temporal = we.get("temporalCoverage")
        if temporal:
            if "/" in temporal:
                start, end = temporal.split("/", 1)
                start, end = start.split(" ")[0], end.split(" ")[0]
                sec.append(
                    f'<p><strong>Temporal Coverage:</strong> <span class="location">'
                    f'{html.escape(start)}</span> to <span class="location">'
                    f"{html.escape(end)}</span></p>"
                )
            else:
                sec.append(
                    f'<p><strong>Temporal Coverage:</strong> <span class="location">'
                    f"{html.escape(temporal)}</span></p>"
                )
        locs = we.get("spatialCoverage") or []
        if locs:
            loc_html = "<br>".join(_location_link(l, geodata_map) for l in locs)
            sec.append(f"<p><strong>Spatial Coverage:</strong><br>{loc_html}</p>")
        if snippet_fn is not None:
            snippet = snippet_fn(part.get("name"))
            if snippet:
                sec.append(f"<h3>Projection Data Snippet</h3>{snippet}")
        sec.append("</div>")
        sections.append("".join(sec))
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title></head><body>"
        f"<h1>{title}</h1>"
        f"<p>Disease: {disease}</p>"
        f"<p>Models: {consolidated_doc.get('numberOfItems', 0)}</p>"
        f"<ul id='index'>{''.join(items)}</ul>"
        f"{''.join(sections)}"
        "</body></html>"
    )


def write_round_html(
    consolidated: DataFrame,
    out_dir: str,
    model_docs: DataFrame | None = None,
    geodata_csv: str = "geodata/geodata.csv",
    data_root: str | None = None,
    snippet_rows: int = 3,
) -> None:
    """Render every consolidated round doc to <out_dir>/round_<id>.html —
    driver-side loop over the per-round docs (one per round; bounded).

    With ``model_docs`` the report gets full per-model detail sections;
    with ``data_root`` each section embeds the head(n)+...+tail parquet
    snippet (jsonld_to_html.py main flow)."""
    os.makedirs(out_dir, exist_ok=True)
    geodata = load_geodata_mapping(geodata_csv)
    per_round_models: dict = {}
    if model_docs is not None:
        for row in model_docs.select("round_id", "model_name", "doc_json").collect():
            per_round_models.setdefault(row.round_id, {})[row.model_name] = json.loads(
                row.doc_json
            )
    spark = consolidated.sparkSession
    for row in consolidated.select("round_id", "doc_json").collect():
        snippet_fn = None
        if data_root is not None:
            rid = row.round_id

            def snippet_fn(model, _rid=rid):
                return model_output_snippet_html(spark, snippet_rows, _rid, model, data_root)

        with open(Path(out_dir) / f"round_{row.round_id}.html", "w") as f:
            f.write(
                render_round_html(
                    json.loads(row.doc_json),
                    model_docs=per_round_models.get(row.round_id),
                    geodata_map=geodata,
                    snippet_fn=snippet_fn,
                )
            )


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


def clean_output(
    output_dir: str = "output", rounds: list | None = None, dry_run: bool = False
) -> dict:
    """Selective output-lifecycle clean (reference
    pipeline/clean_output.py:25-100): removes consolidated round files
    (round_<ID>*.jsonld / *.html) and per-round YYYY-MM-DD subdirectories,
    restricted to ``rounds`` when given; ``dry_run`` only reports.

    Returns {"deleted": [...], "would_delete": [...], "errors": [...]}.
    Unlike the reference (print + bool) this returns the plan so callers
    (CLI, tests) can assert it; deletion stays driver-side — it's output
    lifecycle, not data processing.
    """
    import re
    import shutil

    out = {"deleted": [], "would_delete": [], "errors": []}
    root = Path(output_dir)
    if not root.exists():
        return out

    def _matches(name: str) -> bool:
        return rounds is None or any(r in name for r in rounds)

    targets: list[Path] = []
    for pattern in ("round_*.jsonld", "round_*.html"):
        targets.extend(f for f in sorted(root.glob(pattern)) if _matches(f.name))
    for d in sorted(root.iterdir()):
        if d.is_dir() and re.match(r"\d{4}-\d{2}-\d{2}", d.name) and _matches(d.name):
            targets.append(d)

    for t in targets:
        if dry_run:
            out["would_delete"].append(str(t))
            continue
        try:
            if t.is_dir():
                shutil.rmtree(t)
            else:
                t.unlink()
            out["deleted"].append(str(t))
        except OSError as exc:
            out["errors"].append(f"{t}: {exc}")
    return out
