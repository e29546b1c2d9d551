"""Property-based tests (hypothesis) for the pure kernels: triple
flattening invariants and surface normalization. Spark-free — these cover
the logic shared between fixture generation and the distributed operators.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from smh_to_jsonld_spark.operators.triples import _canonical, flatten_doc

scalars = st.one_of(
    st.text(max_size=8),
    st.integers(min_value=-1000, max_value=1000),
    st.booleans(),
    st.none(),
)

json_docs = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=6), children, max_size=4),
    ),
    max_leaves=20,
).filter(lambda d: isinstance(d, dict))


@settings(max_examples=200, deadline=None)
@given(json_docs)
def test_flatten_is_deterministic(doc):
    assert flatten_doc(doc, "d") == flatten_doc(doc, "d")


def _shuffle_lists(obj, rev=True):
    if isinstance(obj, dict):
        return {k: _shuffle_lists(v, rev) for k, v in reversed(list(obj.items()))}
    if isinstance(obj, list):
        out = [_shuffle_lists(v, rev) for v in obj]
        return list(reversed(out)) if rev else out
    return obj


@settings(max_examples=200, deadline=None)
@given(json_docs)
def test_flatten_triple_set_is_list_order_insensitive(doc):
    """Reversing every array and dict insertion order never changes the
    triple SET — the property that makes P/R vs the reference meaningful."""
    a = set(flatten_doc(doc, "d"))
    b = set(flatten_doc(_shuffle_lists(doc), "d"))
    assert a == b


@settings(max_examples=200, deadline=None)
@given(json_docs)
def test_canonicalization_roundtrips_as_json(doc):
    c = _canonical(doc)
    # canonical form is json-serializable and idempotent
    assert _canonical(c) == c
    json.dumps(c)


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=6), scalars, min_size=1, max_size=6))
def test_flat_docs_emit_one_triple_per_non_null_key(doc):
    triples = flatten_doc(doc, "d")
    keys = [k for k in doc if k != "@id"]
    assert len(triples) == len(keys)
    assert {t[1] for t in triples} == set(keys)


@given(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=40)
)
@settings(max_examples=300, deadline=None)
def test_subword_segmentation_invariants(word):
    """Maximal-munch invariants on arbitrary [a-z0-9] words: the pieces
    are a PARTITION of the word (concat reconstructs it exactly), every
    piece is a vocab token or a single UNK char, the count helper agrees
    with the segmenter, and greediness holds (each piece is the longest
    vocab prefix at its position)."""
    from smh_to_jsonld_spark.operators.textstats import (
        load_subword_vocab,
        subword_count_word,
        subword_segment_word,
    )

    vocab = frozenset(load_subword_vocab())
    ml = max(map(len, vocab))
    pieces = subword_segment_word(word, vocab, ml)
    assert "".join(pieces) == word
    assert subword_count_word(word, vocab, ml) == len(pieces)
    pos = 0
    for p in pieces:
        assert p in vocab or len(p) == 1
        # greediness: no LONGER vocab token starts at this position
        for ln in range(len(p) + 1, min(ml, len(word) - pos) + 1):
            assert word[pos : pos + ln] not in vocab
        pos += len(p)
