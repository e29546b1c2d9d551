"""JSON-LD <-> triple flattening (the P/R comparison substrate).

A JSON-LD document is flattened into (subj, pred, obj) rows with
deterministic skolemization:

- a nested object's node id is its ``@id`` when present, else
  ``<parent>/<key>`` (singleton) or ``<parent>/<key>#<content-hash>``
  (array element) — content-hashing makes array-order IRRELEVANT to the
  triple set, which is what makes P/R comparison meaningful
  (the reference's pandas first-appearance ordering vs our sort_array
  ordering then cancel out; SURVEY.md §7.4-5).
- scalars are serialized with json.dumps (canonical bools/numbers).

``flatten_doc`` is pure Python so the *same* code flattens both the
reference-produced golden docs (in tests) and our engine's docs (via the
Arrow-batched ``triples_from_docs`` operator).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smh_to_jsonld_spark.functions import exprcache

TRIPLE_SCHEMA = "subj string, pred string, obj string"


def _scalar(v) -> str:
    return json.dumps(v, ensure_ascii=False)


def _canonical(obj):
    """Recursively canonicalize: dict keys sorted, LIST ORDER ERASED
    (elements sorted by their canonical serialization). Triple flattening
    treats arrays as sets, so skolem hashes must too — otherwise the
    reference's first-appearance ordering vs our sort_array ordering would
    spuriously change node ids of containing documents."""
    if isinstance(obj, dict):
        return {k: _canonical(v) for k, v in sorted(obj.items())}
    if isinstance(obj, list):
        items = [_canonical(v) for v in obj]
        return sorted(
            items, key=lambda x: json.dumps(x, sort_keys=True, separators=(",", ":"))
        )
    return obj


def _content_id(parent: str, key: str, item: dict) -> str:
    if isinstance(item, dict) and item.get("@id"):
        return str(item["@id"])
    canon = json.dumps(
        _canonical(item), sort_keys=True, separators=(",", ":"), ensure_ascii=False
    )
    h = hashlib.sha1(canon.encode("utf-8")).hexdigest()[:12]
    return f"{parent}/{key}#{h}"


def flatten_doc(doc: dict, subj: str, out: list | None = None) -> list:
    """Flatten one JSON-LD dict into a list of (subj, pred, obj) tuples."""
    if out is None:
        out = []
    for key, val in doc.items():
        if key == "@id":
            continue  # identity, not an edge
        if isinstance(val, dict):
            nid = val.get("@id") or f"{subj}/{key}"
            out.append((subj, key, str(nid)))
            flatten_doc(val, str(nid), out)
        elif isinstance(val, list):
            _flatten_list(val, subj, key, out)
        else:
            out.append((subj, key, _scalar(val)))
    return out


def _flatten_list(items: list, subj: str, key: str, out: list) -> None:
    for item in items:
        if isinstance(item, dict):
            nid = _content_id(subj, key, item)
            out.append((subj, key, nid))
            flatten_doc(item, nid, out)
        elif isinstance(item, list):
            _flatten_list(item, subj, key, out)  # nested arrays flatten
        else:
            out.append((subj, key, _scalar(item)))


def triples_from_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    json_col: str = "doc_json",
    passthrough: list | None = None,
) -> DataFrame:
    """Distributed flattening: (doc_id, doc_json) -> (subj, pred, obj).

    mapInPandas keeps parsing Arrow-batched; one doc can emit many triples
    so this is a flatMap shape, not a scalar UDF. ``passthrough`` columns
    (e.g. the partition key round_id) are copied onto every triple of
    their document — lineage at triple granularity for free.
    """
    extra = list(passthrough or [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for tup in zip(pdf[id_col], pdf[json_col], *[pdf[c] for c in extra]):
                doc_id, doc_json, extras = tup[0], tup[1], tup[2:]
                if doc_json is None:
                    continue
                for t in flatten_doc(json.loads(doc_json), str(doc_id)):
                    rows.append(t + extras)
            yield pd.DataFrame(rows, columns=["subj", "pred", "obj"] + extra)

    schema = TRIPLE_SCHEMA + "".join(f", {c} string" for c in extra)
    return docs.select(id_col, json_col, *extra).mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Catalyst flattening over the TYPED doc struct (no JSON re-parse).
#
# ``triples_from_structs`` walks the struct's STATIC schema at plan time and
# compiles the same skolemization rules as ``flatten_doc`` into one nested
# Catalyst expression: array<struct<subj,pred,obj>> -> explode. Zero Python
# stages — the whole flatten runs JVM-side on the pre-``to_json`` columns,
# so the hot path never serializes docs to JSON and re-parses them
# (VERDICT r3 task 4). ``triples_from_docs`` stays as the semantic
# reference; ``test_triples`` pins expression == Python on the fixtures.
#
# Known (test-verified-irrelevant) deltas vs the Python path, both confined
# to data we never generate: control chars inside strings may hex-escape
# with different case, and non-ASCII array elements could sort differently
# (Python's canonical sort key is the ensure_ascii=True dump).
# ---------------------------------------------------------------------------

from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    BooleanType,
    ByteType,
    DateType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

_TRIPLE_ARR = "array<struct<subj:string,pred:string,obj:string>>"
_EMPTY = f"CAST(array() AS {_TRIPLE_ARR})"
_CANON_OPTS_SQL = "map('ignoreNullFields', 'true')"


def _bq(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _slit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


class _Gen:
    """SQL-text generator for the flatten expression.

    The flattener is emitted as ONE SQL string handed to a single
    ``F.expr`` call. Building the same tree out of pyspark ``Column``
    objects costs thousands of py4j round-trips (~8s of driver time per
    query build, measured); the SQL text builds in microseconds, parses
    JVM-side in milliseconds, and is cached per document schema.

    Node ids and struct values are bound as lambda variables via the
    ``transform(array(x), v -> ...)`` idiom so nested levels reference a
    short variable instead of re-inlining their parent's expression —
    keeps the generated text linear in the schema size."""

    def __init__(self):
        self.n = 0

    def var(self, stem: str) -> str:
        self.n += 1
        return f"{stem}{self.n}"

    # -- scalar JSON serialization (json.dumps equivalence) -------------
    def json_scalar(self, e: str, dt) -> str:
        if isinstance(dt, BooleanType):
            return (
                f"(CASE WHEN {e} THEN 'true' WHEN NOT {e} THEN 'false' "
                f"ELSE 'null' END)"
            )
        if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
            return f"coalesce(CAST({e} AS STRING), 'null')"
        if isinstance(dt, (StringType, DateType, TimestampType)):
            # to_json-singleton-array trick: quoting/escaping is exactly
            # what the JSON path produced ('["escaped"]' -> '"escaped"')
            return (
                f"substring(to_json(array({e})), 2, "
                f"length(to_json(array({e}))) - 2)"
            )
        raise NotImplementedError(f"scalar JSON serialization for {dt}")

    # -- canonical JSON (sorted keys, list order erased) ----------------
    def canon_sort_key(self, e: str, dt) -> str:
        if isinstance(dt, (StructType, ArrayType, MapType)):
            return f"to_json({e}, {_CANON_OPTS_SQL})"
        return self.json_scalar(e, dt)

    def canon_reorder(self, e: str, dt) -> str:
        """Rewrite a value so one ``to_json`` renders its canonical form:
        struct fields sorted by name at plan time, arrays sorted by their
        elements' canonical dumps, map entries sorted by key."""
        if isinstance(dt, StructType):
            inner = ", ".join(
                f"{_slit(n)}, {self.canon_reorder(f'{e}.{_bq(n)}', dt[n].dataType)}"
                for n in sorted(f.name for f in dt.fields)
            )
            return f"(CASE WHEN {e} IS NOT NULL THEN named_struct({inner}) END)"
        if isinstance(dt, ArrayType):
            et = dt.elementType
            x, l, r = self.var("x"), self.var("l"), self.var("r")
            lk, rk = self.canon_sort_key(l, et), self.canon_sort_key(r, et)
            return (
                f"array_sort(transform({e}, {x} -> {self.canon_reorder(x, et)}), "
                f"({l}, {r}) -> (CASE WHEN {lk} < {rk} THEN -1 "
                f"WHEN {lk} > {rk} THEN 1 ELSE 0 END))"
            )
        if isinstance(dt, MapType):
            x, l, r = self.var("x"), self.var("l"), self.var("r")
            entries = (
                f"array_sort(map_entries({e}), ({l}, {r}) -> "
                f"(CASE WHEN {l}.key < {r}.key THEN -1 "
                f"WHEN {l}.key > {r}.key THEN 1 ELSE 0 END))"
            )
            return (
                f"map_from_entries(transform({entries}, {x} -> named_struct("
                f"'key', {x}.key, 'value', "
                f"{self.canon_reorder(f'{x}.value', dt.valueType)})))"
            )
        return e

    def canon_json(self, e: str, dt) -> str:
        if isinstance(dt, (StructType, ArrayType, MapType)):
            return f"to_json({self.canon_reorder(e, dt)}, {_CANON_OPTS_SQL})"
        return self.json_scalar(e, dt)

    # -- the flatten itself ---------------------------------------------
    def triple(self, s: str, p: str, o: str) -> str:
        return f"named_struct('subj', {s}, 'pred', {p}, 'obj', {o})"

    def _struct_body(self, e: str, dt, subj: str, key: str, nid: str) -> str:
        """Triples of a dict node given its already-computed node id
        expression. Binds (value, nid) as one lambda variable so children
        reference ``v.s`` / ``v.n`` instead of re-inlining ``e``/``nid``."""
        v = self.var("v")
        parts = [f"array({self.triple(subj, key, f'{v}.n')})"]
        for f in dt.fields:
            if f.name == "@id":
                continue  # identity, not an edge
            parts.append(
                self.flatten(f"{v}.s.{_bq(f.name)}", f.dataType, f"{v}.n",
                             _slit(f.name))
            )
        body = f"concat({', '.join(parts)})"
        return (
            f"flatten(transform(array(named_struct('s', {e}, 'n', {nid})), "
            f"{v} -> {body}))"
        )

    def flatten(self, e: str, dt, subj: str, key: str) -> str:
        """array<triple> for one (possibly nested) value. ``subj``/``key``
        are SQL expressions so array-element recursion threads
        content-hash node ids."""
        if isinstance(dt, StructType):
            fallback = f"concat({subj}, '/', {key})"
            if "@id" in dt.names:
                nid = (
                    f"(CASE WHEN length(coalesce({e}.`@id`, '')) > 0 "
                    f"THEN {e}.`@id` ELSE {fallback} END)"
                )
            else:
                nid = fallback
            body = self._struct_body(e, dt, subj, key, nid)
            return f"(CASE WHEN {e} IS NOT NULL THEN {body} ELSE {_EMPTY} END)"
        if isinstance(dt, MapType):
            nid = f"concat({subj}, '/', {key})"
            x = self.var("x")
            per_entry = self.flatten(f"{x}.value", dt.valueType, nid, f"{x}.key")
            body = (
                f"concat(array({self.triple(subj, key, nid)}), "
                f"flatten(transform(map_entries({e}), {x} -> {per_entry})))"
            )
            return f"(CASE WHEN {e} IS NOT NULL THEN {body} ELSE {_EMPTY} END)"
        if isinstance(dt, ArrayType):
            et = dt.elementType
            if isinstance(et, StructType):
                it = self.var("it")
                content_id = (
                    f"concat({subj}, '/', {key}, '#', substring(sha1(encode("
                    f"{self.canon_json(it, et)}, 'utf-8')), 1, 12))"
                )
                if "@id" in et.names:
                    nid = (
                        f"(CASE WHEN length(coalesce({it}.`@id`, '')) > 0 "
                        f"THEN {it}.`@id` ELSE {content_id} END)"
                    )
                else:
                    nid = content_id
                body = self._struct_body(it, et, subj, key, nid)
                out = f"flatten(transform({e}, {it} -> {body}))"
            elif isinstance(et, (ArrayType, MapType)):
                # nested arrays flatten under the same key (_flatten_list)
                x = self.var("x")
                out = (
                    f"flatten(transform({e}, {x} -> "
                    f"{self.flatten(x, et, subj, key)}))"
                )
            else:
                x = self.var("x")
                out = (
                    f"transform({e}, {x} -> "
                    f"{self.triple(subj, key, self.json_scalar(x, et))})"
                )
            return f"(CASE WHEN {e} IS NOT NULL THEN {out} ELSE {_EMPTY} END)"
        return (
            f"(CASE WHEN {e} IS NOT NULL THEN "
            f"array({self.triple(subj, key, self.json_scalar(e, dt))}) "
            f"ELSE {_EMPTY} END)"
        )


_FLATTEN_SQL_CACHE: dict = {}


def flatten_sql_for(dt: StructType, id_col: str, struct_col: str) -> str:
    """The full flatten expression (SQL text) for a document schema —
    memoized: schema-identical frames reuse the compiled text across
    queries and sessions."""
    ck = (dt.json(), id_col, struct_col)
    if ck not in _FLATTEN_SQL_CACHE:
        g = _Gen()
        parts = [
            g.flatten(f"{_bq(struct_col)}.{_bq(f.name)}", f.dataType,
                      _bq(id_col), _slit(f.name))
            for f in dt.fields
            if f.name != "@id"
        ]
        _FLATTEN_SQL_CACHE[ck] = f"concat({', '.join(parts)})"
    return _FLATTEN_SQL_CACHE[ck]


def triples_from_structs(
    docs: DataFrame,
    id_col: str = "doc_id",
    struct_col: str = "doc_struct",
    passthrough: list | None = None,
) -> DataFrame:
    """Pure-Catalyst flattening: (doc_id, doc_struct) -> (subj, pred, obj).

    Compiles the document schema into a single JVM-side expression at plan
    time — explode(flatten), no Python workers, no JSON round-trip, no
    py4j-per-node build cost (the expression ships as one SQL string).
    Equivalent to
    ``triples_from_docs(docs.withColumn('doc_json', to_json(doc_struct)))``
    (pinned by tests/test_triples.py).

    Known (test-verified-irrelevant) deltas vs the Python path, confined
    to data we never generate: control chars inside strings may
    hex-escape with different case, and non-ASCII array elements could
    sort differently (Python's canonical sort key is the
    ensure_ascii=True dump)."""
    extra = list(passthrough or [])
    dt = docs.schema[struct_col].dataType
    if not isinstance(dt, StructType):
        raise TypeError(f"{struct_col} must be a struct, got {dt}")
    sql = flatten_sql_for(dt, id_col, struct_col)
    # the parsed Column is memoized too: F.expr re-parses the (large)
    # flatten text JVM-side on every call otherwise. Keyed on the FULL
    # sql text (ADVICE r5): hash(sql) is a salted 64-bit hash whose
    # collision between two doc schemas in one process would silently
    # reuse the wrong flatten expression; the dict lives in memory
    # anyway, so the long key costs nothing.
    exploded = exprcache.memo(
        f"triples.flatten:{sql}",
        lambda: F.explode(F.expr(sql)).alias("__t"),
    )
    return (
        docs.filter(F.col(struct_col).isNotNull())
        .select(exploded, *extra)
        .select("__t.subj", "__t.pred", "__t.obj", *extra)
    )


def triples_from_fact_mentions(mentions: DataFrame, spark) -> DataFrame:
    """Per-TURN fact triples, stateless: one (subj, pred, obj) row per
    non-null fact field of each fact mention, with the location surface
    resolved through the EXACT broadcast alias dictionary (the speed-layer
    contract: no fuzzy pass on the hot path — the batch job upgrades
    misses at the next commit, exactly like linked_entity_counts_stream).

    subj = ``kg:conv/<conv_id>/turn/<turn_idx>`` — turn-grain provenance,
    deliberately finer than the batch factory's doc-level JSON-LD triples
    (which need full-conversation and corpus context and stay batch).
    Every expression is a per-row projection plus one stream-static
    broadcast join, so the same function serves the batch replica and the
    append-mode stream with no watermark or state."""
    from smh_to_jsonld_spark.functions.dims import alias_dim
    from smh_to_jsonld_spark.operators.link import normalize_surface

    facts = mentions.filter(F.col("kind") == "fact")
    dim = alias_dim(spark).select(
        F.col("alias").alias("__norm"), F.col("canonical")
    )
    linked = (
        facts.withColumn("__norm", normalize_surface(F.col("f2")))
        .join(F.broadcast(dim), "__norm", "left")
        .withColumn("__loc", F.coalesce(F.col("canonical"), F.col("f2")))
    )
    subj = F.concat(
        F.lit("kg:conv/"), F.col("conv_id"), F.lit("/turn/"),
        F.col("turn_idx").cast("string"),
    )
    fields = [
        ("target", F.col("f1")),
        ("location", F.col("__loc")),
        ("age_group", F.col("f3")),
        ("output_type", F.col("f4")),
        ("scenario_id", F.col("f5")),
        ("origin_date", F.col("f6")),
        ("horizon", F.col("f7")),
    ]
    triples = F.filter(
        F.array(
            *[
                F.when(
                    c.isNotNull() & (F.length(c) > 0),
                    F.struct(subj.alias("subj"), F.lit(p).alias("pred"),
                             c.alias("obj")),
                )
                for p, c in fields
            ]
        ),
        lambda t: t.isNotNull(),
    )
    return linked.select(F.explode(triples).alias("t")).select(
        "t.subj", "t.pred", "t.obj"
    )


def precision_recall(mine: set, golden: set) -> tuple[float, float]:
    """Set precision/recall of triple tuples."""
    if not mine or not golden:
        return (0.0, 0.0)
    inter = len(mine & golden)
    return (inter / len(mine), inter / len(golden))
