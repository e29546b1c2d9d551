"""Extraction tier: transcripts -> mentions -> reconstructed frames."""

from pyspark.sql import functions as F

from smh_to_jsonld_spark.operators import extract
from smh_to_jsonld_spark.plans.pipeline import turn_order_check
from smh_to_jsonld_spark.sources import synth


def test_turn_order_invariant(spark, spec):
    assert turn_order_check(synth.transcripts_df(spark, spec)) == 0


def test_mention_kinds_present(spark, spec):
    m = extract.extract_mentions(synth.transcripts_df(spark, spec))
    kinds = {r.kind for r in m.select("kind").distinct().collect()}
    assert kinds == {"round", "header", "kv", "contributor", "file", "fact"}


def test_spotted_mention_kinds(spark, spec):
    s = extract.spot_mentions(synth.transcripts_df(spark, spec))
    kinds = {r.kind for r in s.select("kind").distinct().collect()}
    assert kinds == {"entity", "concept", "date"}
    # fact turns verbalize state names => spotted as entities
    ents = {r.term for r in s.filter("kind = 'entity'").select("term").distinct().collect()}
    assert "United States" in ents


def test_extract_jvm_matches_pandas(spark, spec):
    """The Catalyst extraction (CASE WHEN rlike + regexp_extract /
    regexp_extract_all) must emit exactly the rows the retained Arrow
    reference implementations emit — including multiplicity (spot rows are
    one per occurrence)."""
    tr = synth.transcripts_df(spark, spec)

    def bag(df):
        out = {}
        for r in df.collect():
            out[tuple(r)] = out.get(tuple(r), 0) + 1
        return out

    assert bag(extract.extract_mentions(tr)) == bag(extract.extract_mentions_pandas(tr))
    assert bag(extract.spot_mentions(tr)) == bag(extract.spot_mentions_pandas(tr))


def test_conversation_dim(spark, spec):
    m = extract.extract_mentions(synth.transcripts_df(spark, spec))
    cd = extract.conversation_dim(m)
    row = cd.filter(F.col("conv_id") == "conv-2031-01-05-team0-modelA").first()
    assert row.round_id == "2031-01-05"
    assert row.model_name == "team0-modelA"
    assert row.team_abbr == "team0"
    assert row.team_name == "Team 0 Lab"


def test_metadata_roundtrip_equals_direct_frames(spark, spec):
    """Reconstructed metadata from TEXT must equal the directly-rendered
    metadata dimension (the per-turn text-equality invariant made useful)."""
    m = extract.extract_mentions(synth.transcripts_df(spark, spec))
    cd = extract.conversation_dim(m)
    rebuilt = extract.metadata_from_mentions(m, cd)
    direct = synth.metadata_df(spark, spec)

    cols = sorted(direct.columns)
    a = {tuple(str(x) for x in r) for r in rebuilt.select(*cols).collect()}
    b = {tuple(str(x) for x in r) for r in direct.select(*cols).collect()}
    assert a == b


def test_metadata_wide_equals_mentions_path(spark, spec):
    """The one-shuffle conv_wide path (r5 hot path) must reproduce the
    three-shuffle reference reconstruction exactly: same metadata rows,
    same conv_dim membership (round/header-bearing conversations only,
    including NULL-field shapes for header-only or round-only convs)."""
    m = extract.extract_mentions(synth.transcripts_df(spark, spec))
    cw = extract.conversation_wide(m)

    ref_dim = extract.conversation_dim(m)
    new_dim = extract.conv_dim_from_wide(cw)
    a = {tuple(str(x) for x in r) for r in new_dim.collect()}
    b = {tuple(str(x) for x in r) for r in ref_dim.collect()}
    assert a == b

    ref_meta = extract.metadata_from_mentions(m, ref_dim)
    new_meta = extract.metadata_from_conv_wide(cw)
    cols = sorted(ref_meta.columns)
    assert sorted(new_meta.columns) == cols
    a = {tuple(str(x) for x in r) for r in new_meta.select(*cols).collect()}
    b = {tuple(str(x) for x in r) for r in ref_meta.select(*cols).collect()}
    assert a == b


def test_facts_roundtrip_counts(spark, spec):
    m = extract.extract_mentions(synth.transcripts_df(spark, spec))
    cd = extract.conversation_dim(m)
    rebuilt = extract.facts_from_mentions(m, cd)
    assert rebuilt.count() == len(synth.facts_rows(spec))


def test_files_wide_equals_mentions_path(spark, spec):
    """files_from_conv_wide must emit the same multiset of file rows as
    the mention-scan + conv join reference path."""
    m = extract.extract_mentions(synth.transcripts_df(spark, spec))
    ref = extract.files_from_mentions(m, extract.conversation_dim(m))
    new = extract.files_from_conv_wide(extract.conversation_wide(m))
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, ref.collect()))


def test_files_roundtrip(spark, spec):
    m = extract.extract_mentions(synth.transcripts_df(spark, spec))
    cd = extract.conversation_dim(m)
    rebuilt = extract.files_from_mentions(m, cd)
    direct = synth.files_df(spark, spec)
    a = {tuple(r) for r in rebuilt.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b
