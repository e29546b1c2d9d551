"""Sources (YAML/CSV) and sinks (JSON-LD files, HTML, roster validation)."""

import json
from pathlib import Path

import yaml
from pyspark.sql import functions as F

from smh_to_jsonld_spark.operators import sinks
from smh_to_jsonld_spark.plans.pipeline import kg_pipeline_from_transcripts
from smh_to_jsonld_spark.sources import readers, synth


def _write_yaml_dir(spec, tmp_path):
    rnd = spec["rounds"][0]
    mdir = tmp_path / "model-metadata"
    mdir.mkdir()
    for mdl in rnd["models"]:
        with open(mdir / f"{mdl['model_name']}.yaml", "w") as f:
            yaml.safe_dump(mdl["metadata"], f, sort_keys=False)
    return rnd["round_id"], str(mdir)


def test_read_model_metadata_yaml_matches_direct(spark, spec, tmp_path):
    round_id, mdir = _write_yaml_dir(spec, tmp_path)
    got = readers.read_model_metadata_yaml(spark, mdir, round_id)
    direct = synth.metadata_df(spark, spec).filter(f"round_id = '{round_id}'")
    cols = sorted(direct.columns)
    a = {tuple(str(x) for x in r) for r in got.select(*cols).collect()}
    b = {tuple(str(x) for x in r) for r in direct.select(*cols).collect()}
    assert a == b


def test_read_model_metadata_yaml_distributed(spark, spec, tmp_path):
    round_id, mdir = _write_yaml_dir(spec, tmp_path)
    got = readers.read_model_metadata_yaml(spark, mdir, round_id, distributed=True)
    assert got.count() == len(spec["rounds"][0]["models"])


def test_read_alias_csv(spark, tmp_path):
    p = tmp_path / "aliases.csv"
    p.write_text("alias,canonical,entity_type\ncalifornia,06,location\n")
    got = readers.read_alias_csv(spark, str(p)).collect()
    assert got[0].alias == "california" and got[0].canonical == "06"


def _run(spark, spec):
    return kg_pipeline_from_transcripts(
        spark,
        synth.transcripts_df(spark, spec),
        synth.target_metadata_df(spark, spec),
        synth.diseases_df(spark, spec),
    )


def test_jsonld_sinks_and_html(spark, spec, tmp_path):
    res = _run(spark, spec)
    docs = res["model_docs"].select("round_id", "doc_id", "doc_json")

    out1 = tmp_path / "ndjson"
    sinks.write_jsonld_files(docs, str(out1))
    back = spark.read.text(str(out1))
    assert back.count() == docs.count()
    assert json.loads(back.first().value)["@context"] == "https://schema.org/"

    out2 = tmp_path / "files"
    sinks.write_jsonld_files(docs, str(out2), one_file_per_doc=True)
    files = list(Path(out2).rglob("*.jsonld"))
    assert len(files) == 10
    # executor-written files are byte-identical to the reference's
    # driver-side json.dump(indent=2) rendering
    for row in docs.collect():  # test-side oracle collect, not the sink's
        name = row.doc_id.split("/")[-1].replace(":", "_") + ".jsonld"
        got = (Path(out2) / row.round_id / name).read_text()
        assert got == json.dumps(json.loads(row.doc_json), indent=2)

    html_dir = tmp_path / "html"
    sinks.write_round_html(res["consolidated"], str(html_dir))
    html_files = sorted(Path(html_dir).glob("*.html"))
    assert len(html_files) == 2
    content = html_files[0].read_text()
    assert "team0-modelA" in content and "RSV" in content


def test_roster_validation(spark, spec):
    res = _run(spark, spec)
    ok = sinks.roster_validation(res["model_docs"], res["consolidated"])
    assert ok == {}

    # drop one model doc from the expected side => flagged as extra
    broken = res["model_docs"].filter("model_name <> 'team0-modelA'")
    bad = sinks.roster_validation(broken, res["consolidated"])
    assert bad["2031-01-05"]["extra"] == ["team0-modelA"]
    assert bad["2031-01-05"]["missing"] == []


def _write_model_parquet(spark, base_dir, round_id, model, filename):
    import pandas as pd

    model_dir = Path(base_dir) / round_id / "model-output" / model
    model_dir.mkdir(parents=True, exist_ok=True)
    pdf = pd.DataFrame(
        {
            "model_id": [model] * 4,
            "target": ["inc hosp"] * 4,
            "value": [1, 2, 3, 4],
        }
    )
    pdf.to_parquet(model_dir / filename)


def test_data_snippet_head_sep_tail(spark, tmp_path):
    """Mirrors reference tests/test_jsonld_to_html_unit.py:29-58: plain
    parquet, the gz.parquet variant, and the missing-file empty case."""
    rid, model = "2025-07-27", "Ensemble"
    _write_model_parquet(spark, tmp_path, rid, model, f"{rid}-{model}.parquet")
    out = sinks.model_output_snippet_html(spark, 3, rid, model, str(tmp_path))
    assert "<table" in out
    assert "inc hosp" in out
    assert ">4<" in out  # tail row survives
    assert "..." in out  # separator row present

    gz_model = "JHU_UNC-flepiMoP"
    _write_model_parquet(spark, tmp_path, rid, gz_model, f"{rid}-{gz_model}.gz.parquet")
    out_gz = sinks.model_output_snippet_html(spark, 3, rid, gz_model, str(tmp_path))
    assert "<table" in out_gz and "inc hosp" in out_gz and ">4<" in out_gz

    assert sinks.model_output_snippet_html(spark, 3, rid, "MissingModel", str(tmp_path)) == ""


def test_license_links_and_geonames_fallback(spark, spec, tmp_path):
    """J3: license map exact upper-case match; J2: geonames URL when the
    CSV maps the code, search fallback otherwise."""
    from smh_to_jsonld_spark.functions.dims import LICENSE_URLS

    res = _run(spark, spec)
    geodata_csv = tmp_path / "geodata.csv"
    geodata_csv.write_text(
        "iso3166_2,geoname_url\nUS-CA,https://www.geonames.org/5332921/\n"
    )
    html_dir = tmp_path / "html_full"
    sinks.write_round_html(
        res["consolidated"], str(html_dir),
        model_docs=res["model_docs"], geodata_csv=str(geodata_csv),
    )
    content = (html_dir / "round_2031-01-05.html").read_text()
    # license rendered as a link for mapped licenses
    assert LICENSE_URLS["CC-BY-4.0"] in content
    # mapped code -> direct geonames URL; unmapped -> search fallback
    assert "https://www.geonames.org/5332921/" in content
    assert "geonames.org/search.html?q=" in content


def test_html_authors_and_temporal_coverage(spark, spec, tmp_path):
    """Reference parity for the two round-2 gaps (jsonld_to_html.py:326-349
    authors grid, 538-553 temporalCoverage interval split): contributor
    name/affiliation/mailto blocks and the start-to-end rendering with any
    time-of-day stripped."""
    res = _run(spark, spec)
    html_dir = tmp_path / "html_at"
    sinks.write_round_html(
        res["consolidated"], str(html_dir), model_docs=res["model_docs"]
    )
    content = (html_dir / "round_2031-01-05.html").read_text()

    # authors: every contributor of a fixture doc appears with mailto link
    doc = json.loads(
        res["model_docs"]
        .filter("model_name = 'team0-modelA' AND round_id = '2031-01-05'")
        .first()
        .doc_json
    )
    assert "<h3>Authors</h3>" in content and 'class="authors-grid"' in content
    for a in doc["author"]:
        assert f"<strong>{a['name']}</strong>" in content
        assert f"mailto:{a['email']}" in content
    # affiliation renders its name, or N/A when absent
    affs = [(a.get("affiliation") or {}).get("name") for a in doc["author"]]
    for aff in affs:
        assert f"<em>{aff}</em>" in content if aff else "<em>N/A</em>" in content

    # temporal coverage: interval split into start 'to' end spans
    start, end = doc["workExample"]["temporalCoverage"].split("/", 1)
    start, end = start.split(" ")[0], end.split(" ")[0]
    assert (
        f'<strong>Temporal Coverage:</strong> <span class="location">{start}</span>'
        f' to <span class="location">{end}</span>' in content
    )

    # non-interval + time-of-day-stripping branches (unit-level)
    single = sinks.render_round_html(
        {"name": "r", "hasPart": [{"name": "m"}], "numberOfItems": 1},
        model_docs={"m": {"workExample": {"temporalCoverage": "2030-01-01 00:00/2030-06-01 12:00"}}},
    )
    assert '<span class="location">2030-01-01</span> to' in single
    assert "2030-06-01</span>" in single and "12:00" not in single


def test_license_url_column(spark):
    from smh_to_jsonld_spark.functions import dims

    df = spark.createDataFrame(
        [("cc-by-4.0",), ("MIT",), ("weird-custom",)], "license string"
    )
    got = [r.u for r in df.select(dims.license_url(F.col("license")).alias("u")).collect()]
    assert got[0] == "https://creativecommons.org/licenses/by/4.0/"
    assert got[1] == "https://opensource.org/license/mit/"
    assert got[2] is None


def test_clean_output_lifecycle(tmp_path):
    """Mirrors reference pipeline/clean_output.py: selective per-round
    clean + dry-run."""
    out = tmp_path / "output"
    (out / "2031-01-05").mkdir(parents=True)
    (out / "2031-02-02").mkdir()
    (out / "2031-01-05" / "doc.jsonld").write_text("{}")
    (out / "round_2031-01-05.jsonld").write_text("{}")
    (out / "round_2031-01-05.html").write_text("<html>")
    (out / "round_2031-02-02.jsonld").write_text("{}")
    (out / "keepme.txt").write_text("x")

    plan = sinks.clean_output(str(out), rounds=["2031-01-05"], dry_run=True)
    assert len(plan["would_delete"]) == 3 and plan["deleted"] == []
    assert (out / "round_2031-01-05.jsonld").exists()  # dry-run touched nothing

    res = sinks.clean_output(str(out), rounds=["2031-01-05"])
    assert len(res["deleted"]) == 3 and res["errors"] == []
    assert not (out / "2031-01-05").exists()
    assert (out / "round_2031-02-02.jsonld").exists()  # other round kept
    assert (out / "keepme.txt").exists()

    res_all = sinks.clean_output(str(out))
    assert (out / "round_2031-02-02.jsonld").exists() is False or res_all
    assert not (out / "2031-02-02").exists()
    # missing dir is a no-op
    assert sinks.clean_output(str(tmp_path / "nope")) == {
        "deleted": [], "would_delete": [], "errors": []
    }
