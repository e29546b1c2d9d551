"""Deterministic corpus synthesis.

Two generators, both seeded and reproducible:

1. ``corpus_spec`` — a tiny driver-side "hub corpus" (rounds -> models ->
   metadata + observed facts + files + tasks config), the analog of the
   reference's checked-in round data (reference tests use 7- and 16-model
   rounds: /root/reference/tests/test_jsonld_v6_integration.py:26-36).
   From one spec we can render:
     - DataFrames for the Spark pipeline (metadata_df / facts_df / files_df)
     - transcript turns that *verbalize* the same facts
       (BASELINE.json input_hint schema: conv_id, turn_idx, role, text,
       tool, ts)
     - an on-disk hub layout (YAML + parquet + tasks.json) so the actual
       reference code can be executed once to produce golden fixtures.

2. ``transcripts_at_scale`` — a pure spark.range generator (no driver-side
   rows) producing arbitrarily many turns with the same verbalization
   templates and a Zipf-skewed head-entity (location "US") distribution,
   used by the benchmarks. This is the 10^12-turn-safe path: generation is
   O(1) on the driver.
"""

from __future__ import annotations

import random
import zlib
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smh_to_jsonld_spark.functions.dims import fips_rows, fips_to_name_map, name_to_abbr_map

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_TARGET_POOL = [
    {
        "target_id": "inc hosp",
        "target_name": "Incident hospitalizations",
        "description": "Weekly new hospitalizations",
        "target_units": "count",
        "target_keys": {"target": "inc hosp"},
        "target_type": "discrete",
        "is_step_ahead": True,
        "time_unit": "week",
        "uri": "http://purl.obolibrary.org/obo/APOLLO_SV_00000HOSP",
        "alternative_name": "incident hospitalizations",
    },
    {
        "target_id": "peak inc hosp",
        "target_name": "Peak incident hospitalizations",
        "description": "Peak weekly hospitalizations",
        "target_units": "count",
        "target_keys": {"target": "peak inc hosp"},
        "target_type": "discrete",
        "is_step_ahead": False,
        "time_unit": None,
        "uri": None,
        "alternative_name": None,
    },
    {
        "target_id": "cum hosp",
        "target_name": "Cumulative hospitalizations",
        "description": "Cumulative hospitalizations over the season",
        "target_units": "count",
        "target_keys": {"target": "cum hosp"},
        "target_type": "continuous",
        "is_step_ahead": True,
        "time_unit": "week",
        "uri": "http://purl.obolibrary.org/obo/APOLLO_SV_00000CUM",
        "alternative_name": None,
    },
]

_LICENSES = ["CC-BY-4.0", "MIT", "NA", "CC-BY-NC-4.0", "TBD"]
_AGE_GROUPS = ["0-130", "0-17", "18-64", "65-130"]
_OUTPUT_TYPES = ["quantile", "sample", "cdf"]
_SCENARIOS = ["A-2031-01-01", "B-2031-01-01"]


def corpus_spec(seed: int = 7, n_rounds: int = 2, models_per_round: int = 5) -> dict:
    """Build the deterministic tiny hub corpus spec (driver-side dict)."""
    rng = random.Random(seed)
    state_fips = [f for f, _, _ in fips_rows() if f != "US"]
    rounds = []
    base = datetime(2031, 1, 5)
    for r in range(n_rounds):
        round_id = (base + timedelta(days=28 * r)).strftime("%Y-%m-%d")
        diseases = [{"name": "RSV", "uri": "http://purl.obolibrary.org/obo/DOID_0080600"}]
        if r == 1:  # exercise the multi-disease list branch (C16)
            diseases = diseases + [
                {"name": "Influenza", "uri": "http://purl.obolibrary.org/obo/DOID_8469"}
            ]
        models = []
        for m in range(models_per_round):
            team_abbr = "" if m == 1 else f"team{m}"
            model_abbr = f"model{chr(ord('A') + m)}"
            name = f"{team_abbr}-{model_abbr}" if team_abbr else model_abbr
            contributors = [
                {
                    "name": f"Contributor {m} Alpha",
                    "affiliation": f"University {m}",
                    "email": f"alpha{m}@example.org",
                }
            ]
            if m % 2 == 0:
                contributors.append(
                    {
                        "name": f"Contributor {m} Beta",
                        "affiliation": None,
                        "email": f"beta{m}@example.org",
                    }
                )
            metadata = {
                "team_abbr": team_abbr,
                "model_abbr": model_abbr,
                "team_name": f"Team {m} Lab",
                "model_version": f"1.{m}",
                "license": _LICENSES[m % len(_LICENSES)],
                "website_url": "NA" if m == 2 else f"https://example.org/{name}",
                "methods": f"Mechanistic model {m}",
                "methods_long": None if m % 2 else f"Long-form methods for model {m}",
                "model_contributors": contributors,
                "data_inputs": f"surveillance feed {m}" if m != 3 else None,
                "team_funding": "NA" if m == 4 else f"Grant G-{m:03d}",
            }
            n_targets = 1 + (m % len(_TARGET_POOL))
            targets = [t["target_id"] for t in _TARGET_POOL[:n_targets]]
            locs = rng.sample(state_fips, 3) + ["US"]
            if m == 0:
                locs.append("06037")  # county-level FIPS branch
            facts = {
                "origin_date": [round_id],
                "scenario_id": _SCENARIOS[: 1 + m % 2],
                "location": locs,
                "age_group": _AGE_GROUPS[: 1 + m % len(_AGE_GROUPS)],
                "target": targets,
                "horizon": list(range(1, 3 + m)),
                "output_type": _OUTPUT_TYPES[: 1 + m % 2],
            }
            n_parquet = 1 + m % 2
            n_gz = m % 3
            files = [f"{round_id}-{name}.parquet"] * 0
            files = [f"{round_id}-{name}_{i}.parquet" for i in range(n_parquet)]
            files += [f"{round_id}-{name}_{i}.gz.parquet" for i in range(n_gz)]
            models.append(
                {"model_name": name, "metadata": metadata, "facts": facts, "files": files}
            )
        rounds.append(
            {
                "round_id": round_id,
                "diseases": diseases,
                "models": models,
                "target_metadata": [dict(t) for t in _TARGET_POOL],
                "output_type_names": sorted(set(_OUTPUT_TYPES)),
            }
        )
    return {"seed": seed, "rounds": rounds}


# ---------------------------------------------------------------------------
# Renderers: spec -> DataFrames
# ---------------------------------------------------------------------------

METADATA_SCHEMA = (
    "round_id string, model_name string, team_abbr string, model_abbr string,"
    " team_name string, model_version string, license string, website_url string,"
    " methods string, methods_long string, data_inputs string, team_funding string,"
    " model_contributors array<struct<name:string,affiliation:string,email:string>>"
)

FACTS_SCHEMA = (
    "round_id string, model_id string, origin_date date, scenario_id string,"
    " location string, age_group string, target string, horizon int,"
    " output_type string, value double"
)


def metadata_df(spark: SparkSession, spec: dict) -> DataFrame:
    rows = []
    for rnd in spec["rounds"]:
        for mdl in rnd["models"]:
            md = mdl["metadata"]
            rows.append(
                (
                    rnd["round_id"],
                    mdl["model_name"],
                    md["team_abbr"],
                    md["model_abbr"],
                    md["team_name"],
                    md["model_version"],
                    md["license"],
                    md["website_url"],
                    md["methods"],
                    md["methods_long"],
                    md["data_inputs"],
                    md["team_funding"],
                    [(c["name"], c["affiliation"], c["email"]) for c in md["model_contributors"]],
                )
            )
    return spark.createDataFrame(rows, schema=METADATA_SCHEMA)


def facts_rows(spec: dict) -> list:
    """Cross-product the per-model fact value sets into observation rows.

    Mirrors what the reference's model-output parquet contains: one row per
    (scenario, location, age_group, target, horizon, output_type) combo.
    """
    rows = []
    for rnd in spec["rounds"]:
        for mdl in rnd["models"]:
            f = mdl["facts"]
            # zlib.crc32 is stable across processes (builtin hash() is salted)
            key = f"{spec['seed']}|{rnd['round_id']}|{mdl['model_name']}".encode()
            rng = random.Random(zlib.crc32(key))
            od = datetime.strptime(f["origin_date"][0], "%Y-%m-%d").date()
            for sid in f["scenario_id"]:
                for loc in f["location"]:
                    for ag in f["age_group"]:
                        for tgt in f["target"]:
                            for h in f["horizon"]:
                                for ot in f["output_type"]:
                                    rows.append(
                                        (
                                            rnd["round_id"],
                                            mdl["model_name"],
                                            od,
                                            sid,
                                            loc,
                                            ag,
                                            tgt,
                                            h,
                                            ot,
                                            round(rng.random() * 100, 3),
                                        )
                                    )
    return rows


def facts_df(spark: SparkSession, spec: dict) -> DataFrame:
    return spark.createDataFrame(facts_rows(spec), schema=FACTS_SCHEMA)


def files_df(spark: SparkSession, spec: dict) -> DataFrame:
    rows = []
    for rnd in spec["rounds"]:
        for mdl in rnd["models"]:
            for fn in mdl["files"]:
                rows.append((rnd["round_id"], mdl["model_name"], fn))
    return spark.createDataFrame(rows, schema="round_id string, model_id string, filename string")


def target_metadata_df(spark: SparkSession, spec: dict) -> DataFrame:
    rows = []
    for rnd in spec["rounds"]:
        for pos, t in enumerate(rnd["target_metadata"]):
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
                    sorted(rnd["output_type_names"]),
                    pos,  # config insertion order (variableMeasured order)
                )
            )
    schema = (
        "round_id string, target_id string, target_name string, description string,"
        " target_units string, target_keys map<string,string>, target_type string,"
        " is_step_ahead boolean, time_unit string, uri string, alternative_name string,"
        " available_output_types array<string>, target_pos int"
    )
    return spark.createDataFrame(rows, schema=schema)


def diseases_df(spark: SparkSession, spec: dict) -> DataFrame:
    rows = []
    for rnd in spec["rounds"]:
        for i, d in enumerate(rnd["diseases"]):
            rows.append((rnd["round_id"], i, d["name"], d["uri"]))
    return spark.createDataFrame(
        rows, schema="round_id string, disease_idx int, name string, uri string"
    )


# ---------------------------------------------------------------------------
# Renderer: spec -> transcript turns (the authoritative engine input)
# ---------------------------------------------------------------------------

def _alias_of(fips: str, i: int) -> str:
    """Deterministically verbalize a location as one of its surface forms:
    raw FIPS, full state name, abbreviation, or a lightly-fuzzed name
    (trailing dot / odd case) that only FUZZY linking can resolve.

    This is what makes the transcript path a genuine entity-linking
    problem rather than string passthrough.
    """
    name = fips_to_name_map().get(fips)
    if name is None:  # county codes etc. — no alias, raw passthrough
        return fips
    abbr = name_to_abbr_map()[name]
    forms = [fips, name, abbr, name + ".", name.upper(), abbr.lower()]
    return forms[i % len(forms)]


def _verbalize_model(round_id: str, mdl: dict) -> list:
    """Turn one model submission into conversation turns (role, text, tool)."""
    md = mdl["metadata"]
    name = mdl["model_name"]
    turns = [
        ("system", f"Round {round_id} submission session.", None),
        (
            "user",
            f"submitting model {name} version {md['model_version']} "
            f"team_abbr [{md['team_abbr']}] model_abbr [{md['model_abbr']}] "
            f"from team [{md['team_name']}].",
            None,
        ),
        ("assistant", f"Registered {name} for round {round_id}.", None),
        ("user", f"license: {md['license']}", None),
        ("user", f"website: {md['website_url']}", None),
    ]
    if md["team_funding"] is not None:
        turns.append(("user", f"funding: {md['team_funding']}", None))
    turns.append(("user", f"methods: {md['methods']}", None))
    if md["methods_long"] is not None:
        turns.append(("user", f"methods_long: {md['methods_long']}", None))
    if md["data_inputs"] is not None:
        turns.append(("user", f"data_inputs: {md['data_inputs']}", None))
    for c in md["model_contributors"]:
        aff = c["affiliation"] if c["affiliation"] is not None else ""
        turns.append(("user", f"contributor: {c['name']} <{c['email']}> ({aff})", None))
    for fn in mdl["files"]:
        turns.append(("tool", f"uploaded file {fn}", "upload"))
    f = mdl["facts"]
    od = f["origin_date"][0]
    i = 0
    for sid in f["scenario_id"]:
        for loc in f["location"]:
            for ag in f["age_group"]:
                for tgt in f["target"]:
                    for h in f["horizon"]:
                        for ot in f["output_type"]:
                            turns.append(
                                (
                                    "tool",
                                    f"observed target={tgt};"
                                    f" location={_alias_of(loc, i)}; age_group={ag};"
                                    f" output_type={ot}; scenario={sid};"
                                    f" origin_date={od}; horizon={h}",
                                    "validate",
                                )
                            )
                            i += 1
    turns.append(("assistant", f"Submission for {name} complete.", None))
    return turns


def transcripts_rows(spec: dict) -> list:
    rows = []
    for rnd in spec["rounds"]:
        rdate = datetime.strptime(rnd["round_id"], "%Y-%m-%d")
        for mi, mdl in enumerate(rnd["models"]):
            conv_id = f"conv-{rnd['round_id']}-{mdl['model_name']}"
            for ti, (role, text, tool) in enumerate(_verbalize_model(rnd["round_id"], mdl)):
                rows.append(
                    (conv_id, ti, role, text, tool, rdate + timedelta(minutes=mi * 500 + ti))
                )
    return rows


def transcripts_df(spark: SparkSession, spec: dict) -> DataFrame:
    return spark.createDataFrame(transcripts_rows(spec), schema=TRANSCRIPT_SCHEMA)


# ---------------------------------------------------------------------------
# Scale generator — pure Spark, no driver rows. Used by bench.
# ---------------------------------------------------------------------------

ROUND_IDS_AT_SCALE = ("2031-01-05", "2031-02-02")  # == corpus_spec rounds


def transcripts_at_scale(
    spark: SparkSession,
    n_conversations: int = 10_000,
    turns_per_conv: int = 24,
    n_models: int = 64,
    partitions: int | None = None,
    n_rounds: int = 1,
) -> DataFrame:
    """Deterministic synthetic transcripts generated distributively.

    Every column is a pure function of (conv, turn) ids, so the same
    arguments always produce byte-identical data, at any parallelism.
    Location mentions are Zipf-skewed toward 'US' (the head entity) to
    exercise salted aggregation, mirroring real hub data where the
    national series dominates.

    ``n_rounds`` (<= len(ROUND_IDS_AT_SCALE)) spreads conversations over
    multiple rounds, matching the fixture-spec round ids so the config
    dims still join — exercises round fan-out + partitioned writes at
    scale.
    """
    assert 1 <= n_rounds <= len(ROUND_IDS_AT_SCALE)
    n = n_conversations * turns_per_conv
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    conv = (F.col("id") / turns_per_conv).cast("long")
    turn = (F.col("id") % turns_per_conv).cast("int")
    round_id = F.element_at(
        F.array(*[F.lit(r) for r in ROUND_IDS_AT_SCALE[:n_rounds]]),
        (F.pmod(conv, F.lit(n_rounds)) + 1).cast("int"),
    )
    model_i = F.pmod(F.xxhash64(conv.cast("string"), F.lit("m")), F.lit(n_models))
    # skew: ~60% of location mentions hit the head entity 'US';
    # surface form cycles fips/name/abbr so linking has real work
    loc_h = F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("loc")), F.lit(100))
    states = [(f, a, n) for f, a, n in fips_rows() if f != "US"]
    idx = (F.pmod(loc_h, F.lit(56)) + 1).cast("int")
    form = F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("form")), F.lit(3))
    state = (
        F.when(form == 0, F.element_at(F.array(*[F.lit(f) for f, _, _ in states]), idx))
        .when(form == 1, F.element_at(F.array(*[F.lit(n) for _, _, n in states]), idx))
        .otherwise(F.element_at(F.array(*[F.lit(a) for _, a, _ in states]), idx))
    )
    head = (
        F.when(form == 0, F.lit("US"))
        .when(form == 1, F.lit("United States"))
        .otherwise(F.lit("us"))
    )
    loc = F.when(loc_h < 60, head).otherwise(state)
    tgt = F.element_at(
        F.array(F.lit("inc hosp"), F.lit("peak inc hosp"), F.lit("cum hosp")),
        (F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("t")), F.lit(3)) + 1).cast("int"),
    )
    ag = F.element_at(
        F.array(*[F.lit(a) for a in _AGE_GROUPS]),
        (F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("a")), F.lit(4)) + 1).cast("int"),
    )
    ot = F.element_at(
        F.array(F.lit("quantile"), F.lit("sample")),
        (F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("o")), F.lit(2)) + 1).cast("int"),
    )
    h = (F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("h")), F.lit(8)) + 1).cast("int")
    model_name = F.concat(F.lit("teamX-model"), model_i.cast("string"))
    fact_text = F.concat(
        F.lit("observed target="), tgt,
        F.lit("; location="), loc,
        F.lit("; age_group="), ag,
        F.lit("; output_type="), ot,
        F.lit("; scenario=A-2031-01-01; origin_date="), round_id,
        F.lit("; horizon="), h.cast("string"),
    )
    # chatter turns: ~40 words of deterministic filler prose (realistic
    # agent-transcript shape — most turns carry no extractable facts, but
    # the extractor must still scan them)
    vocab = F.array(
        *[
            F.lit(w)
            for w in (
                "the model projects a steady rise across regions while the team "
                "reviews calibration notes and compares scenario inputs against "
                "surveillance trends observed during recent weeks of reporting "
                "data quality checks continue pending further updates"
            ).split()
        ]
    )
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(F.col("id"), i), F.size(vocab)) + 1).cast("int")
            ),
        ),
        " ",
    )
    text = (
        F.when(turn == 0, F.concat(F.lit("Round "), round_id, F.lit(" submission session.")))
        .when(
            turn == 1,
            F.concat(
                F.lit("submitting model "), model_name,
                F.lit(" version 1.0 team_abbr [teamX] model_abbr [model"),
                model_i.cast("string"), F.lit("] from team [Team X Lab]."),
            ),
        )
        .when(F.pmod(turn, F.lit(2)) == 1, filler)
        .otherwise(fact_text)
    )
    return df.select(
        F.concat(F.lit("conv-"), conv.cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(turn < 2, F.lit("user"))
        .when(F.pmod(turn, F.lit(2)) == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
        .alias("role"),
        text.alias("text"),
        F.when((turn >= 2) & (F.pmod(turn, F.lit(2)) == 0), F.lit("validate")).alias("tool"),
        (F.to_timestamp(F.lit("2031-01-05 00:00:00")) + (F.col("id") * F.expr("INTERVAL 1 SECOND"))).alias("ts"),
    )
