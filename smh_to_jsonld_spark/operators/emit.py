"""JSON-LD emission — the reference's @context/@id/@type rules, Spark-first.

Per-model documents are assembled ENTIRELY with nested Catalyst structs +
``to_json`` (null-dropping reproduces the reference's conditional-key
insertion and recursive None-stripping, /root/reference/utils/jsonld.py:111-118,
145-186). The only Python that touches data is the bounded per-round
consolidation (one group per round, group size = #models), done with
applyInPandas exactly as SURVEY.md §2.9 prescribes.

Fidelity notes (cited into /root/reference):
- license sentinel LEAK: license is set in the dict literal before the
  sentinel check, so sentinel values stay in the output
  (utils/jsonld.py:137,147-148) — we therefore emit license verbatim.
- website only when non-null and not a sentinel (utils/jsonld.py:150-151).
- workExample only on enriched models (create_jsonld_v6_0_0.py:354-372).
- spatialCoverage is always a list (possibly empty) once enriched
  (utils/jsonld.py:58).
- disease singleton-vs-list shape (create_jsonld_v6_0_0.py:425-428).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smh_to_jsonld_spark.functions import exprcache, scalars
from smh_to_jsonld_spark.operators.joins import location_lookup

JSON_OPTS = {"ignoreNullFields": "true"}

_NONEMPTY = lambda c: F.when(F.length(F.coalesce(c, F.lit(""))) > 0, c)  # noqa: E731


def _sorted_values(kv_list_col):
    """array_sort a collect_list of struct(k, v) by k only, return the vs.

    A custom comparator is required because v may contain MapType fields,
    which are not orderable — a plain sort_array(struct) would fail analysis.
    """
    ordered = F.array_sort(
        kv_list_col,
        lambda l, r: F.when(l["k"] < r["k"], -1).when(l["k"] > r["k"], 1).otherwise(0),
    )
    return F.transform(ordered, lambda x: x["v"])


def _variable_measured(
    field_values: DataFrame, target_meta: DataFrame, dialect: str = "v6"
) -> DataFrame:
    """J4+F8: per-model variableMeasured array.

    Dialect split (SURVEY.md §7.4-2/4):
    - v6: EMPTY observed set keeps ALL targets (the bypass branch,
      create_jsonld_v6_0_0.py:237-241);
    - v5: plain semi-join, empty observed set keeps none
      (utils/tasks_smh.py:96), and v5's dataclass has no alternative_name
      field so alternateName is never emitted (utils/tasks_json_parser.py:
      24-34).
    """
    pairs = field_values.select(
        "round_id", "model_id", F.col("target").alias("__observed")
    ).join(F.broadcast(target_meta), "round_id")
    if dialect == "v6":
        # NULL observed set behaves like the reference's empty set (keeps
        # all targets): ANSI size(NULL) is NULL, so coalesce to 0 first
        # (create_jsonld_v6_0_0.py:237-241, `if observed_targets and ...`).
        pairs = pairs.filter(
            (F.coalesce(F.size("__observed"), F.lit(0)) == 0)
            | F.array_contains(F.col("__observed"), F.col("target_id"))
        )
    else:
        pairs = pairs.filter(F.array_contains(F.col("__observed"), F.col("target_id")))
    has_pos = "target_pos" in target_meta.columns

    def build():
        alt_name = (
            F.col("alternative_name") if dialect == "v6"
            else F.lit(None).cast("string")
        )
        target_obj = F.struct(
            F.lit("PropertyValue").alias("@type"),
            F.coalesce(_NONEMPTY(F.col("target_name")), F.col("target_id")).alias("name"),
            F.col("uri").alias("identifier"),
            alt_name.alias("alternateName"),
            F.col("description").alias("description"),
            F.col("target_units").alias("unitText"),
            F.col("target_id").alias("target_id"),
            F.col("target_type").alias("target_type"),
            F.col("target_keys").alias("target_keys"),
            F.when(F.size("available_output_types") > 0, F.col("available_output_types")).alias(
                "available_output_types"
            ),
            F.when(
                F.col("is_step_ahead") & F.col("time_unit").isNotNull(), F.col("time_unit")
            ).alias("temporalUnit"),
        )
        # order by tasks-config insertion position (target_pos) when the
        # dim carries it — build_target_objects iterates dict order
        # (create_jsonld_v6_0_0.py:239) — else fall back to target_id
        kv = F.struct(
            (F.col("target_pos") if has_pos else F.col("target_id")).alias("k"),
            target_obj.alias("v"),
        ).alias("__kv")
        return kv, _sorted_values(F.collect_list("__kv")).alias("variableMeasured")

    kv, vm_agg = exprcache.memo(f"emit.vm:{dialect}:{has_pos}", build)
    return (
        pairs.select("round_id", "model_id", kv)
        .groupBy("round_id", "model_id")
        .agg(vm_agg)
    )


def _spatial_coverage(field_values: DataFrame, spark: SparkSession) -> DataFrame:
    """J1: per-model spatialCoverage node array via broadcast FIPS lookup."""
    # explode_outer keeps zero-location models so they still get the
    # always-present-when-enriched empty spatialCoverage list
    # (utils/jsonld.py:58 sets [] unconditionally).
    # posexplode preserves the location array's order through the lookup
    # join + re-collect, so spatialCoverage mirrors field_values order
    # (reference utils/jsonld.py:56-63 appends in distinct-list order).
    locs = field_values.select(
        "round_id", "model_id", F.posexplode_outer("location").alias("pos", "fips")
    )
    enriched = location_lookup(locs, spark, fips_col="fips")

    def build():
        ctx = F.struct(
            F.lit("http://www.iso.org/iso-3166-1#").alias("iso3166-1"),
            F.lit("http://www.iso.org/iso-3166-2#").alias("iso3166-2"),
            F.lit("http://www.geonames.org/ontology#").alias("gn"),
            F.lit("http://www.w3.org/2003/01/geo/wgs84_pos#").alias("geo"),
        )
        node = F.struct(
            ctx.alias("@context"),
            F.col("location_iri").alias("@id"),
            F.lit("gn:Feature").alias("@type"),
            F.col("location_name").alias("gn:name"),
            F.lit("US").alias("iso3166-1:alpha2"),
            F.lit("USA").alias("iso3166-1:alpha3"),
            F.lit("840").alias("iso3166-1:numeric"),
            F.col("fips").cast("string").alias("gn:fipsCode"),
            F.when(
                F.length(F.coalesce(F.col("state_abbr"), F.lit(""))) > 0,
                F.concat(F.lit("US-"), F.col("state_abbr")),
            ).alias("iso3166-2:code"),
        )
        # collect_list skips NULL entries => zero-location models collect []
        kv = F.when(
            F.col("fips").isNotNull(),
            F.struct(F.col("pos").alias("k"), node.alias("v")),
        ).alias("__kv")
        return kv, _sorted_values(F.collect_list("__kv")).alias("spatialCoverage")

    kv, sc_agg = exprcache.memo("emit.sc", build)
    return (
        enriched.select("round_id", "model_id", kv)
        .groupBy("round_id", "model_id")
        .agg(sc_agg)
    )


def model_docs(
    spark: SparkSession,
    metadata: DataFrame,
    field_values: DataFrame,
    target_meta: DataFrame,
    file_hist: DataFrame,
    dialect: str = "v6",
) -> DataFrame:
    """Assemble one JSON-LD doc per (round_id, model_name).

    Inputs:
      metadata      one row per (round_id, model_name) — entity dimension
      field_values  output of aggregates.distinct_field_values
      target_meta   config dim (round_id, target_id, ... metadata)
      file_hist     output of aggregates.file_type_histogram

    Returns (round_id, model_name, doc_id, doc_json, enriched).
    """
    vm = _variable_measured(field_values, target_meta, dialect)
    sc = _spatial_coverage(field_values, spark)

    fv = (
        field_values.join(vm, ["round_id", "model_id"], "left")
        .join(sc, ["round_id", "model_id"], "left")
        .join(file_hist, ["round_id", "model_id"], "left")
    )

    df = metadata.join(
        fv.withColumnRenamed("model_id", "model_name"), ["round_id", "model_name"], "left"
    )

    enriched, doc = exprcache.memo("emit.doc", _build_doc_exprs)

    return df.select(
        "round_id",
        "model_name",
        F.concat(F.lit("doc:"), F.col("round_id"), F.lit("/"), F.col("model_name")).alias(
            "doc_id"
        ),
        F.to_json(doc, JSON_OPTS).alias("doc_json"),
        # the typed pre-to_json document: triples.triples_from_structs
        # flattens THIS column JVM-side, skipping the JSON round-trip
        doc.alias("doc_struct"),
        enriched.alias("enriched"),
    )


def _build_doc_exprs():
    """The (dialect-independent) document expression tree — built once per
    process (exprcache): ~150 Column constructions, measured ~1s of py4j
    plan-build per query before memoization."""
    enriched = F.col("output_type").isNotNull()  # model had any facts

    encoding = F.when(
        (F.coalesce(F.col("n_parquet"), F.lit(0)) > 0)
        | (F.coalesce(F.col("n_gz_parquet"), F.lit(0)) > 0),
        F.array(
            F.struct(
                F.lit("FileFormat").alias("@type"),
                F.lit("Apache Parquet").alias("name"),
                F.lit(".parquet").alias("fileExtension"),
            )
        ),
    )

    # size(NULL) is NULL => the whole predicate is NULL => when() falls
    # through to NULL => key dropped, matching safe_temporal_coverage's
    # missing-field bypass (create_jsonld_v6_0_0.py:281-293).
    temporal = F.when(
        (F.size(F.col("origin_date")) > 0) & (F.size(F.col("horizon")) > 0),
        scalars.temporal_interval(
            F.col("origin_date_max"),
            scalars.temporal_end_date(F.col("origin_date_max"), F.col("max_horizon")),
        ),
    )

    work_example = F.struct(
        F.lit("Dataset").alias("@type"),
        F.lit("RSV disease projection outputs").alias("description"),
        F.struct(
            F.lit("Event").alias("@type"),
            F.concat(F.lit("Round "), F.col("round_id")).alias("name"),
            F.col("round_id").alias("identifier"),
        ).alias("isPartOf"),
        F.array(F.col("output_type")).alias("output_type"),
        encoding.alias("encodingFormat"),
        F.when(F.size(F.col("variableMeasured")) > 0,
               F.col("variableMeasured")).alias("variableMeasured"),
        F.col("spatialCoverage").alias("spatialCoverage"),
        F.when(F.size(F.col("age_group")) > 0,
               F.col("age_group")).alias("ageGroups"),
        temporal.alias("temporalCoverage"),
    )

    author = F.when(
        F.size(F.col("model_contributors")) > 0,
        F.transform(
            F.col("model_contributors"),
            lambda c: F.struct(
                F.lit("Person").alias("@type"),
                c["name"].alias("name"),
                F.when(
                    F.length(F.coalesce(c["affiliation"], F.lit(""))) > 0,
                    F.struct(
                        F.lit("Organization").alias("@type"),
                        c["affiliation"].alias("name"),
                    ),
                ).alias("affiliation"),
                c["email"].alias("email"),
            ),
        ),
    )

    producer = F.struct(
        F.lit("Organization").alias("@type"),
        F.col("team_name").alias("name"),
        F.when(
            _NONEMPTY(F.col("team_funding")).isNotNull()
            & ~scalars.is_missing_sentinel(F.col("team_funding")),
            F.struct(
                F.lit("Organization").alias("@type"),
                F.col("team_funding").alias("description"),
            ),
        ).alias("funder"),
    )

    doc = F.struct(
        F.lit("https://schema.org/").alias("@context"),
        F.lit("Dataset").alias("@type"),
        scalars.mint_model_name(F.col("team_abbr"), F.col("model_abbr")).alias("name"),
        scalars.description_of(F.col("methods_long"), F.col("methods")).alias("description"),
        F.col("model_version").alias("version"),
        F.col("license").alias("license"),  # sentinel leak — see module doc
        F.when(
            F.col("website_url").isNotNull()
            & ~scalars.is_missing_sentinel(F.col("website_url")),
            F.col("website_url"),
        ).alias("website"),
        producer.alias("producer"),
        author.alias("author"),
        F.when(
            _NONEMPTY(F.col("data_inputs")).isNotNull(),
            F.struct(
                F.lit("Dataset").alias("@type"),
                F.col("data_inputs").alias("description"),
            ),
        ).alias("isBasedOn"),
        F.when(enriched, work_example).alias("workExample"),
    )

    return enriched, doc


CONSOLIDATED_SCHEMA = "round_id string, doc_id string, doc_json string"


def consolidated_round_docs(
    docs: DataFrame, diseases: DataFrame, dialect: str = "v6"
) -> DataFrame:
    """S8/J6/A5/C16: one consolidated JSON-LD per round.

    Grouped applyInPandas over round_id — bounded group (models per round),
    matching /root/reference/pipeline/create_jsonld_v6_0_0.py:386-450:
    hasPart in model-name order, numberOfItems = len(hasPart).
    Disease shape rule by dialect (SURVEY.md §7.4-2):
    - v6: 1 disease => object, >1 => array (create_jsonld_v6_0_0.py:425-428)
    - v5: LAST disease wins, always an object (utils/jsonld.py:223-231)
    """
    joined = _docs_with_diseases(docs, diseases)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        round_id, doc_id, consolidated = _assemble_consolidated(pdf, dialect)
        return pd.DataFrame(
            [(round_id, doc_id, json.dumps(consolidated))],
            columns=["round_id", "doc_id", "doc_json"],
        )

    return joined.groupBy("round_id").applyInPandas(assemble, schema=CONSOLIDATED_SCHEMA)


def _docs_with_diseases(docs: DataFrame, diseases: DataFrame) -> DataFrame:
    dz_agg = exprcache.memo(
        "emit.dz_agg",
        lambda: F.to_json(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("disease_idx", "name", "uri"))
                ),
                lambda d: F.struct(d["name"].alias("name"), d["uri"].alias("uri")),
            )
        ).alias("diseases_json"),
    )
    disease_arrays = diseases.groupBy("round_id").agg(dz_agg)
    return docs.join(disease_arrays, "round_id", "left")


def _assemble_consolidated(pdf: pd.DataFrame, dialect: str):
    """One round's consolidated document as a Python dict — the shared
    group body of ``consolidated_round_docs`` (emits its JSON) and
    ``consolidated_round_triples`` (flattens it in the same stage)."""
    round_id = pdf["round_id"].iloc[0]
    dj = pdf["diseases_json"].iloc[0]
    diseases_list = json.loads(dj) if isinstance(dj, str) else []
    consolidated = {
        "@context": "https://schema.org/",
        "@type": "Dataset",
        "name": f"Round {round_id} Scenario Projection Models Collection",
        "description": f"Collection of model output from round {round_id}",
        "identifier": round_id,
        "roundId": round_id,
        "hasPart": [],
        "workExample": {
            "@type": [
                "Dataset",
                "https://midasnetwork.us/ontology/class-datasetsmidas97.html",
                "https://midasnetwork.us/ontology/class-oboobcs_0000267.html",
            ],
            "description": "RSV disease projection outputs",
        },
    }
    if dialect == "v6":
        entries = [
            {"@type": "MedicalCondition", "name": d.get("name"), "uri": d.get("uri")}
            for d in diseases_list
            if d.get("name") or d.get("uri")
        ]
        if len(entries) == 1:
            consolidated["healthCondition"] = entries[0]
        elif entries:
            consolidated["healthCondition"] = entries
    else:  # v5: loop overwrites => last disease wins
        for d in diseases_list:
            consolidated["healthCondition"] = {
                "@type": "MedicalCondition",
                "name": d.get("name"),
                "uri": d.get("uri"),
            }
    for doc_json in pdf.sort_values("model_name")["doc_json"]:
        consolidated["hasPart"].append(json.loads(doc_json))
    consolidated["numberOfItems"] = len(consolidated["hasPart"])
    return round_id, f"doc:round_{round_id}", consolidated


def consolidated_round_triples(
    docs: DataFrame, diseases: DataFrame, dialect: str = "v6"
) -> DataFrame:
    """Fused assemble+flatten (r6 perf): the consolidated doc is built
    AND flattened to (subj, pred, obj, round_id) inside ONE grouped
    Python stage — the unfused path (``consolidated_round_docs`` →
    ``triples_from_docs``) paid a second Python stage plus an exchange
    and a JSON dump/re-parse just to hand the dict to the flattener.
    Calls the SAME ``_assemble_consolidated`` and the SAME
    ``flatten_doc`` rules, so triples are identical by construction
    (``json.dumps``/``loads`` round-trips the dict to itself — strings,
    ints, lists, dicts only); pinned by
    ``test_consolidated_triples_fused_matches_unfused``."""
    from smh_to_jsonld_spark.operators.triples import flatten_doc

    joined = _docs_with_diseases(docs, diseases)

    def assemble_flatten(pdf: pd.DataFrame) -> pd.DataFrame:
        round_id, doc_id, consolidated = _assemble_consolidated(pdf, dialect)
        rows = [
            (s, p, o, round_id)
            for s, p, o in flatten_doc(consolidated, doc_id)
        ]
        return pd.DataFrame(rows, columns=["subj", "pred", "obj", "round_id"])

    return joined.groupBy("round_id").applyInPandas(
        assemble_flatten,
        schema="subj string, pred string, obj string, round_id string",
    )


def materialize_graph(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Node + edge tables from a triple set (the KG materialization).

    Nodes: every subject, with its @type values collected.
    Edges: triples whose object is another node (obj appears as a subject).
    """
    subs = triples.select(F.col("subj").alias("iri")).distinct()
    types = (
        triples.filter(F.col("pred") == "@type")
        .groupBy(F.col("subj").alias("iri"))
        .agg(F.sort_array(F.collect_set("obj")).alias("types"))
    )
    nodes = subs.join(types, "iri", "left")
    passthrough = [c for c in triples.columns if c not in ("subj", "pred", "obj")]
    edges = triples.join(
        subs.withColumnRenamed("iri", "obj"), "obj", "left_semi"
    ).select("subj", "pred", "obj", *passthrough)
    return nodes, edges
