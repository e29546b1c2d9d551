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


def precision_recall(mine: set, golden: set) -> tuple[float, float]:
    """Set precision/recall of triple tuples."""
    if not mine or not golden:
        return (0.0, 0.0)
    inter = len(mine & golden)
    return (inter / len(mine), inter / len(golden))
