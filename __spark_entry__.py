"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps SURVEY.md §2 operator families + the training-data ops
(dedup / similarity / textstats / multimodal / KG) onto the driver's
testdata tables; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.
Numeric discipline for hash-stable comparisons:
- sums go through DECIMAL(18,4) (exact, order-independent) then cast to
  double;
- float outputs are rounded to 4 decimals or omitted (ranks/ids only);
- every computed column is aliased identically on both sides.
Every query carries an oracle (zero rows-only checks). Ops with no
natural SQL expression are pinned one of three ways:
- implementation-equivalence oracles: the DuckDB SQL replicates the same
  deterministic algorithm (SimHash via md5_number_upper, LSH ANN via
  embedded hyperplane literals);
- verified-output equivalence: LSH candidate generation tuned for recall
  1.0 on this data + exact verification => output equals the exact-pair
  SQL (MinHash J>=0.8, embedding LSH);
- reference-derived constants: the triple factory's per-pred counts vs a
  VALUES table generated from the reference-executed golden fixture;
  connected components vs a recursive-CTE reachability oracle.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dec_sum(col, alias):
    return F.sum(col.cast("decimal(18,4)")).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG mention extraction over the documents table — term
    mentions -> (doc, term) edges -> per-term aggregates with a broadcast
    term dictionary join (the reference's J1 lookup shape)."""
    docs = _t(spark, SF_DEFAULT, "documents")
    terms = F.regexp_extract_all(F.col("text"), F.lit(r"\b(spark|join|hash|merge|window|scan)\b"), 1)
    mentions = docs.select("doc_id", "lang", F.explode(terms).alias("term"))
    dim = spark.createDataFrame(
        [("spark", "engine"), ("join", "operator"), ("hash", "operator"),
         ("merge", "operator"), ("window", "operator"), ("scan", "operator")],
        "term string, kind string",
    )
    return (
        mentions.join(F.broadcast(dim), "term", "left")
        .groupBy("term", "kind")
        .agg(F.count("*").alias("n_mentions"),
             F.countDistinct("doc_id").alias("n_docs"))
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_distinct_values_per_group(spark, sf):
    """A1/A2: per-group sorted-distinct value sets (the reference's core
    metadata aggregation, utils/model_output_smh.py:65-72)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.count("*").alias("n_rows"),
    )


def q_max_per_group(spark, sf):
    """A3 (max horizon analog)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
    )


def q_histogram(spark, sf):
    """A4 (file-type histogram analog)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


def q_top1_per_group(spark, sf):
    """A8/O5: latest order per customer (argmax per group).

    r6 perf shape: ``max(struct(o_orderdate, o_orderkey))`` — the
    lexicographic struct max IS the (date desc, orderkey desc) argmax
    row, computed with map-side partial aggregation instead of a full
    shuffle + per-partition sort + row_number (guide §2.3 "aggregate
    before you shuffle": the exchange carries one partial max per
    (customer, map task), not every order row). Output identical to the
    r5 window form (oracle-hashed; the window operator itself remains
    exercised by aggregates.top1_per_group and the topk query)."""
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("m"))
        .select(
            "o_custkey",
            F.col("m.o_orderkey").alias("latest_orderkey"),
            F.date_format(F.col("m.o_orderdate"), "yyyy-MM-dd").alias("latest_date"),
        )
    )


def q_first_wins_dedup(spark, sf):
    """A7: first-appearance-wins dedup.

    r6: min(struct) partial-aggregable argmin — same rewrite as
    q_top1_per_group (guide §2.3), output identical to the window form.
    """
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.min(F.struct("o_orderdate", "o_orderkey")).alias("m"))
        .select("o_custkey", F.col("m.o_orderkey").alias("first_orderkey"))
    )


def q_broadcast_lookup(spark, sf):
    """J1/J2: broadcast dim lookup with miss fallback."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .withColumn("nation", F.coalesce(F.col("n_name"), F.lit("Unknown")))
        .groupBy("nation")
        .agg(
            F.count("*").alias("n_customers"),
            _dec_sum(F.col("c_acctbal"), "total_acctbal"),
        )
    )


def q_pricing_summary(spark, sf):
    """TPC-H Q1 shape: the partial+final agg workhorse. Decimal sums for
    order-independent exactness."""
    li = _t(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), "sum_qty"),
        _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.count("*").alias("count_order"),
    )


def q_semi_join(spark, sf):
    """U3/J4: left-semi (observed-targets shape).

    r6 perf shape: the probe side is reduced to DISTINCT keys before the
    join (guide §2.3 "aggregate before you shuffle") — semi-join against
    the distinct key set is definitionally the same predicate, but the
    6M-key fact scan collapses map-side to ~200k keys BEFORE the
    single-threaded broadcast-relation build that previously swallowed
    the raw column (measured 4.4s -> 1.1s at sf1.0)."""
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    return (
        p.join(
            li.select(F.col("l_partkey").alias("p_partkey")).distinct(),
            "p_partkey",
            "left_semi",
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


def q_anti_join(spark, sf):
    """U2/J7: anti-join roster-difference shape."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q_sentinel_filter(spark, sf):
    """F4: missing-sentinel predicate."""
    d = _t(spark, sf, "documents")
    return (
        d.filter(~F.col("lang").isin("zh", "de"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_regex_filter(spark, sf):
    """F6/C4: regex predicate pushed at the scan."""
    d = _t(spark, sf, "documents")
    return (
        d.filter(F.col("text").rlike("spark [a-z]+ join"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_name_minting(spark, sf):
    """C1/C2/C6: concat-based name/IRI minting."""
    s = _t(spark, sf, "supplier")
    return s.select(
        "s_suppkey",
        F.concat_ws("-", F.col("s_name"), F.col("s_nationkey").cast("string")).alias(
            "minted"
        ),
        F.concat(F.lit("kg:supplier/"), F.col("s_suppkey").cast("string")).alias("iri"),
    )


def q_date_arithmetic(spark, sf):
    """C7/C8: date arithmetic + ISO formatting (temporal coverage shape:
    end = date - 1 day + h weeks)."""
    o = _t(spark, sf, "orders")
    end = F.date_add(F.to_date("o_orderdate"), 3 * 7 - 1)
    return o.groupBy("o_orderpriority").agg(
        F.date_format(F.min(end), "yyyy-MM-dd").alias("min_end"),
        F.date_format(F.max(end), "yyyy-MM-dd").alias("max_end"),
    )


def q_interval_string(spark, sf):
    """C9: 'start/end' interval strings."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(
            "/",
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd"),
        ).alias("coverage")
    )


def q_topk(spark, sf):
    """O1/O3: global top-k with deterministic tie-break.

    r6: orderBy+limit plans as TakeOrderedAndProject (per-partition
    top-10, parallel) instead of funnelling every row through the
    single-partition global window; the row_number then ranks only the
    10 survivors. Same rows, same ranks (total order is identical)."""
    o = _t(spark, sf, "orders")
    top = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


def q_case_insensitive_sort(spark, sf):
    """O2: rank by lower(name)."""
    n = _t(spark, sf, "nation")
    w = Window.orderBy(F.lower("n_name").asc(), F.col("n_nationkey").asc())
    return n.select("n_name", F.row_number().over(w).alias("rank"))


def q_union_distinct(spark, sf):
    """U1: union + dedup."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


def q_token_count(spark, sf):
    """textstats: whitespace + BPE-ish token counting."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("n_tokens"),
        textstats.bpe_ish_token_count(F.col("text")).alias("n_pieces"),
    )


def q_subword_token_count(spark, sf):
    """textstats: REAL greedy longest-match subword tokenizer (broadcast
    vocab pandas UDF). ORACLE-CHECKED cross-engine: the DuckDB side
    re-implements maximal munch as a recursive CTE over the same
    checked-in vocab (functions/subword_vocab.txt) — a genuinely
    independent implementation, not an embedded constant."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        textstats.subword_token_count(F.col("text")).alias("n_subword_tokens"),
    )


def q_quality_score(spark, sf):
    """textstats: length/punct/stopword quality features."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return textstats.quality_features(d).select(
        "doc_id", "n_tokens", "stopword_ratio", "quality"
    )


def q_repetition_score(spark, sf):
    """textstats: Gopher-style repetition filters (duplicate lines /
    duplicate n-grams) — the boilerplate/spam gate of a training-data
    pipeline. Pure Catalyst map-only projection."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    return textstats.repetition_features(d).select(
        "doc_id", "dup_line_ratio", "dup_2gram_ratio", "dup_3gram_ratio"
    )


def q_pii_scrub(spark, sf):
    """textstats: PII redaction (emails/SSNs/phones/IPv4 -> typed
    placeholders) + per-category counts. The corpus text is augmented
    with deterministic synthetic PII per doc (both engines apply the
    identical augmentation) so the scrubber is exercised on every row,
    not just on accidental matches."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    aug = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat(F.lit("user"), F.col("doc_id"), F.lit("@mail.example.com")),
            F.concat(F.lit("042-68-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
            F.concat(F.lit("555-867-530"), (F.col("doc_id") % 10).cast("string")),
            F.concat(F.lit("192.168."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
        ).alias("text"),
    )
    return textstats.pii_scrub(aug).select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4",
        F.md5(F.col("scrubbed")).alias("scrub_hash"),
    )


def q_tfidf_top_terms(spark, sf):
    """textstats: per-doc top-3 TF-IDF terms (corpus keyword extraction).
    Integer-only output (tf, df, rank) so the cross-engine compare never
    rides on ln() ulp differences."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return textstats.tfidf_top_terms(d, k=3)


def q_language_id(spark, sf):
    """textstats: stopword-heuristic language ID vs the labeled lang col."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents")
    return (
        d.select("lang", textstats.language_id(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


def q_fingerprint(spark, sf):
    """textstats: md5 document fingerprint."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", textstats.fingerprint(F.col("text")).alias("fp"))


def q_exact_dedup_stats(spark, sf):
    """dedup: exact-dup statistics per lang (hash-key shuffle, never text)."""
    from smh_to_jsonld_spark.operators import textstats

    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(textstats.fingerprint(F.col("text"))).alias("n_distinct"),
    )


def q_jaccard_pairs(spark, sf):
    """dedup: token-set Jaccard pairs via shingle blocking WITH the
    stop-shingle cap engaged (max_bucket=120 drops the most ubiquitous
    token bucket — 'batch' appears in 125 of the 150 docs), so
    the scale path's drop semantics are themselves oracle-checked: the
    SQL replica applies the identical bucket-size filter, and shared
    counts/jaccard reflect surviving buckets only (a documented lower
    bound, threshold applied to it on both sides)."""
    from smh_to_jsonld_spark.operators import dedup

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 150)
    return dedup.jaccard_pairs(d, n=1, threshold=0.5, max_bucket=120)


def q_minhash_lsh_pairs(spark, sf):
    """dedup: MinHash+LSH candidates, exact-Jaccard verified. ORACLE-
    CHECKED: at 32 hashes / 16 bands (r=2) a J>=0.8 pair is missed with
    prob (1-J^2)^16 < 1e-7, so the verified output equals the exact
    J>=0.8 pair set the DuckDB oracle computes (deterministic seeds =>
    stable). max_bucket=500 exercises the degenerate-band cap."""
    from smh_to_jsonld_spark.operators import dedup

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return dedup.minhash_lsh_pairs(
        d, num_hashes=32, bands=16, shingle_n=1, threshold=0.8, max_bucket=500
    )


def q_near_dup_clusters(spark, sf):
    """dedup: near-dup CLUSTERING (verified MinHash pairs -> connected
    components -> min-id representative). ORACLE-CHECKED: the pair set
    equals the exact J>=0.8 set (see minhash_lsh_pairs), and the DuckDB
    side recomputes components over those exact pairs with a recursive
    reachability CTE plus singleton passthrough."""
    from smh_to_jsonld_spark.operators import dedup

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return dedup.near_dup_clusters(
        d, num_hashes=32, bands=16, shingle_n=1, threshold=0.8, max_bucket=500
    )


def q_simhash_neardup(spark, sf):
    """dedup: SimHash hamming near-dups. ORACLE-CHECKED: the signature is
    md5-low64-based (DuckDB md5_number_upper recomputes it exactly) and
    16-bit pigeonhole blocking is EXACT for hamming<=3, so blocked output
    equals the all-pairs SQL result."""
    from smh_to_jsonld_spark.operators import dedup

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return dedup.simhash_neardup_pairs(d, max_hamming=3)


def q_embedding_neardup(spark, sf):
    """dedup: brute-force cosine near-dup pairs (ids only, float-free)."""
    from smh_to_jsonld_spark.operators.dedup import cosine_expr

    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    a = e.select(F.col("vec_id").alias("id_a"),
                 F.transform("embedding", lambda x: x.cast("double")).alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"),
                 F.transform("embedding", lambda x: x.cast("double")).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_expr(F.col("va"), F.col("vb")) >= 0.40)
        .select("id_a", "id_b")
    )


def q_embedding_neardup_lsh(spark, sf):
    """dedup: (k,L) hyperplane-LSH near-dup, exact-cosine verified.
    ORACLE-CHECKED against the brute-force SQL: at threshold 0.40
    (p_bit=0.63), k=2 planes x L=16 tables miss a true pair with
    (1-0.63^2)^16 ~ 3e-4 — verified empirically to equal the exact set on
    this data (deterministic seeds => stable). Production defaults
    (k=16, L=8) suit the usual 0.9 threshold; a 0.40 threshold makes the
    similarity graph inherently dense (low-k LSH, quadratic-ish output),
    so the query bounds its input — the unbounded scale path for
    embeddings is cosine_topk."""
    from smh_to_jsonld_spark.operators import dedup

    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 1000)
    return dedup.embedding_neardup_pairs(
        e, threshold=0.40, n_planes=2, n_tables=16, max_bucket=100_000
    )


def q_cosine_topk(spark, sf):
    """similarity: exact brute-force cosine top-k (ids + rank, float-free)."""
    from smh_to_jsonld_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    corpus = e.filter(F.col("vec_id") >= 5)
    return similarity.brute_force_topk(corpus, queries, k=3).select(
        "query_id", "neighbor_id", "rank"
    )


def q_cosine_topk_lsh(spark, sf):
    """similarity: LSH-bucketed ANN top-k. ORACLE-CHECKED as an
    implementation-equivalence oracle: the DuckDB SQL replicates the
    same algorithm (identical hyperplane literals, bucket packing,
    hamming-1 multiprobe, rank) so bucket assignment and the resulting
    approximate top-k must agree engine-to-engine."""
    from smh_to_jsonld_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    corpus = e.filter(F.col("vec_id") >= 5)
    return similarity.lsh_topk(corpus, queries, k=3, n_planes=4).select(
        "query_id", "neighbor_id", "rank"
    )


def q_ivf_assign(spark, sf):
    """similarity: IVF coarse quantization (argmax-cosine centroid
    assignment). ORACLE-CHECKED as implementation equivalence: the DuckDB
    SQL embeds the same seeded centroid literals and picks the same
    first-max index."""
    from smh_to_jsonld_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    return similarity.ivf_assign(e).select("vec_id", "centroid")


def q_ivf_topk(spark, sf):
    """similarity: IVF search (probe nprobe nearest cells, exact-score
    inside). ORACLE-CHECKED as implementation equivalence: the DuckDB SQL
    embeds the same seeded centroid literals, ranks probe cells with the
    same (score desc, cell asc) tie-break, and applies the same first-max
    corpus cell assignment."""
    from smh_to_jsonld_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    cents = similarity.seeded_centroids(16, 64, 7)
    return similarity.ivf_topk(
        e.filter(F.col("vec_id") >= 5), e.filter(F.col("vec_id") < 5),
        cents, k=3, nprobe=2,
    ).select("query_id", "neighbor_id", "rank")


def q_kmeans_iteration(spark, sf):
    """similarity: ONE distributed Lloyd's iteration (spherical k-means)
    from the fixed seeded centroids — the unit of kmeans_train.
    ORACLE-CHECKED as implementation equivalence: the DuckDB SQL embeds
    the same centroid literals, replicates argmax-dot assignment,
    per-cluster element-wise mean and unit renormalization."""
    from smh_to_jsonld_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    cents = similarity.seeded_centroids(16, 64, 7)
    return similarity.kmeans_update_once(e, cents).select(
        "centroid", "pos", F.round("value", 4).alias("value")
    )


def q_kg_mentions(spark, sf):
    """KG extraction: vocabulary mention spotting over documents."""
    d = _t(spark, sf, "documents")
    terms = F.regexp_extract_all(
        F.col("text"), F.lit(r"\b(spark|join|hash|merge|window|scan)\b"), 1
    )
    return (
        d.select(F.explode(terms).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_mentions"))
    )


def q_events_daily(spark, sf):
    """windowed aggregation (batch analog of streaming tumbling window)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count("*").alias("n"), _dec_sum(F.col("value"), "total_value"))


def q_events_json_extract(spark, sf):
    """semi-structured props extraction (C3/C4 regex family)."""
    ev = _t(spark, sf, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("bigint")
    return ev.groupBy("event_type").agg(_dec_sum(k, "sum_k"))


def q_multimodal_features(spark, sf):
    """multimodal plumbing: binary payload -> Arrow-batched feature extract
    (decode stubbed; byte_len/digest verifiable in SQL)."""
    from smh_to_jsonld_spark.operators import multimodal

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    media = multimodal.attach_media(d, "doc_id", "text")
    return multimodal.extract_features(media).select("media_id", "byte_len", "digest")


def q_transcript_triples(spark, sf):
    """The transcript triple factory end-to-end on the deterministic
    fixture corpus. ORACLE-CHECKED against a constant table of per-pred
    DISTINCT triple counts derived from tests/fixtures/golden_triples.json
    — which was produced by EXECUTING the reference implementation on the
    same corpus (tools/gen_reference_fixture.py), so this pins the whole
    extraction->linking->emit->flatten path to reference output."""
    from smh_to_jsonld_spark.plans.pipeline import kg_pipeline_from_transcripts
    from smh_to_jsonld_spark.sources import synth

    spec = synth.corpus_spec()
    res = kg_pipeline_from_transcripts(
        spark,
        synth.transcripts_df(spark, spec),
        synth.target_metadata_df(spark, spec),
        synth.diseases_df(spark, spec),
    )
    return (
        res["triples"]
        .select("subj", "pred", "obj")
        .distinct()
        .groupBy("pred")
        .agg(F.count("*").alias("n_triples"))
    )


def q_salted_agg(spark, sf):
    """link.salted_count / salted_collect_set: the skew-defusing two-phase
    aggregations (north_rule 'salted repartitioning to defuse head-entity
    skew'). ORACLE-CHECKED: the salted plan must equal the plain GROUP BY
    — lineitem's l_returnflag is the skewed key here."""
    from smh_to_jsonld_spark.operators import link

    li = _t(spark, sf, "lineitem")
    counts = link.salted_count(li, ["l_returnflag"], salt_buckets=16)
    sets = link.salted_collect_set(li, ["l_returnflag"], "l_linestatus", salt_buckets=16)
    return counts.join(sets, "l_returnflag").select(
        "l_returnflag",
        F.col("count").alias("n_rows"),
        F.array_join("l_linestatus_set", ",").alias("statuses"),
    )


def q_graph_materialize(spark, sf):
    """emit.materialize_graph: node/edge tables from a triple set (the KG
    materialization step of the job). Input triples are SQL-expressible
    (order/part containment + @type triples over lineitem), so the whole
    node/edge derivation is oracle-checked."""
    from smh_to_jsonld_spark.operators.emit import materialize_graph

    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 200)
    contain = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("subj"),
        F.lit("hasPart").alias("pred"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("obj"),
    ).distinct()
    types = contain.select(
        F.col("subj"), F.lit("@type").alias("pred"), F.lit("Order").alias("obj")
    ).distinct().unionByName(
        contain.select(
            F.col("obj").alias("subj"), F.lit("@type").alias("pred"),
            F.lit("Part").alias("obj"),
        ).distinct()
    )
    nodes, edges = materialize_graph(contain.unionByName(types))
    return (
        nodes.select(
            "iri", F.array_join(F.coalesce(F.col("types"), F.array()), ",").alias("types")
        )
        .join(
            edges.groupBy(F.col("subj").alias("iri")).agg(F.count("*").alias("out_edges")),
            "iri",
            "left",
        )
        .withColumn("out_edges", F.coalesce("out_edges", F.lit(0)))
    )


def q_connected_components(spark, sf):
    """canon: connected components over a bipartite order-part graph
    (iterative self-join fixpoint). ORACLE-CHECKED against a DuckDB
    recursive-CTE reachability formulation of min-label components."""
    from smh_to_jsonld_spark.operators import canon

    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 60)
    edges = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    ).distinct()
    cc = canon.connected_components(edges)
    return cc.groupBy("component").agg(F.count("*").alias("size"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "distinct_values_per_group": q_distinct_values_per_group,
        "max_per_group": q_max_per_group,
        "histogram": q_histogram,
        "top1_per_group": q_top1_per_group,
        "first_wins_dedup": q_first_wins_dedup,
        "broadcast_lookup": q_broadcast_lookup,
        "pricing_summary": q_pricing_summary,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "sentinel_filter": q_sentinel_filter,
        "regex_filter": q_regex_filter,
        "name_minting": q_name_minting,
        "date_arithmetic": q_date_arithmetic,
        "interval_string": q_interval_string,
        "topk": q_topk,
        "case_insensitive_sort": q_case_insensitive_sort,
        "union_distinct": q_union_distinct,
        "token_count": q_token_count,
        "subword_token_count": q_subword_token_count,
        "quality_score": q_quality_score,
        "repetition_score": q_repetition_score,
        "pii_scrub": q_pii_scrub,
        "tfidf_top_terms": q_tfidf_top_terms,
        "language_id": q_language_id,
        "fingerprint": q_fingerprint,
        "exact_dedup_stats": q_exact_dedup_stats,
        "jaccard_pairs": q_jaccard_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "near_dup_clusters": q_near_dup_clusters,
        "simhash_neardup": q_simhash_neardup,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "cosine_topk": q_cosine_topk,
        "cosine_topk_lsh": q_cosine_topk_lsh,
        "ivf_assign": q_ivf_assign,
        "ivf_topk": q_ivf_topk,
        "kmeans_iteration": q_kmeans_iteration,
        "kg_mentions": q_kg_mentions,
        "events_daily": q_events_daily,
        "events_json_extract": q_events_json_extract,
        "multimodal_features": q_multimodal_features,
        "transcript_triples": q_transcript_triples,
        "connected_components": q_connected_components,
        "graph_materialize": q_graph_materialize,
        "salted_agg": q_salted_agg,
    }


def _lsh_topk_oracle_sql() -> str:
    """DuckDB replica of similarity.lsh_topk(n_planes=4, k=3, multiprobe):
    identical hyperplane literals (same seed), identical bucket packing
    (plane 0 = high bit), identical hamming-1 probe set — an
    implementation-equivalence oracle for the approximate ANN path."""
    from smh_to_jsonld_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, 4, 42)

    def dot(vec_expr, plane):
        lits = ", ".join(repr(float(w)) for w in plane)
        return f"(CASE WHEN list_dot_product({vec_expr}, [{lits}]) > 0 THEN 1 ELSE 0 END)"

    def bucket(vec_expr):
        # _bucket_expr folds out = out*2 + bit, plane 0 first => high bit
        terms = [f"{dot(vec_expr, p)} * {1 << (len(planes) - 1 - i)}" for i, p in enumerate(planes)]
        return "(" + " + ".join(terms) + ")"

    return f"""
        WITH c AS (
          SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
                 {bucket('embedding::DOUBLE[]')} AS bucket
          FROM embeddings WHERE vec_id >= 5),
        q AS (
          SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                 {bucket('embedding::DOUBLE[]')} AS b0
          FROM embeddings WHERE vec_id < 5),
        probes AS (
          SELECT query_id, qv,
                 unnest([b0, xor(b0, 1), xor(b0, 2), xor(b0, 4), xor(b0, 8)]) AS bucket
          FROM q),
        scored AS (
          SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos
          FROM probes JOIN c USING (bucket))
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored QUALIFY rank <= 3
    """


def _ivf_assign_oracle_sql() -> str:
    """DuckDB replica of similarity.ivf_assign: same seeded unit-norm
    centroid literals, argmax dot product, first-max tie-break (Spark
    array_position == DuckDB list_indexof, both 1-based first match)."""
    import numpy as np

    rng = np.random.RandomState(7)
    cents = rng.randn(16, 64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    dots = ", ".join(
        "list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(float(x)) for x in c)
        + "])"
        for c in cents
    )
    return f"""
        WITH s AS (SELECT vec_id, [{dots}] AS scores FROM embeddings)
        SELECT vec_id,
               (list_indexof(scores, list_max(scores)) - 1)::INT AS centroid
        FROM s
    """


def _ivf_topk_oracle_sql() -> str:
    """DuckDB replica of similarity.ivf_topk(k=3, nprobe=2) with the
    seed-7 centroids: query probe ranking = row_number over (dot DESC,
    cell ASC) — the same total order as Spark's array_sort over
    (neg-score, cell-index) structs; corpus cell = first-max argmax
    (list_indexof); exact cosine re-scoring inside probed cells."""
    import numpy as np

    rng = np.random.RandomState(7)
    cents = rng.randn(16, 64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    dots = ", ".join(
        "list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + "])"
        for c in cents
    )
    return f"""
        WITH s AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), sc AS (
            SELECT vec_id, v, [{dots}] AS scores FROM s
        ), corpus AS (
            SELECT vec_id AS neighbor_id, v AS cv,
                   (list_indexof(scores, list_max(scores)) - 1)::INT AS cell
            FROM sc WHERE vec_id >= 5
        ), qc AS (
            SELECT vec_id AS query_id, v AS qv, (r.range)::INT AS ci,
                   scores[r.range + 1] AS sc_val
            FROM sc, range(0, 16) r WHERE vec_id < 5
        ), ranked AS (
            SELECT query_id, qv, ci,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sc_val DESC, ci ASC) AS pr
            FROM qc
        ), probes AS (
            SELECT query_id, qv, ci AS cell FROM ranked WHERE pr <= 2
        ), cand AS (
            SELECT p.query_id, c.neighbor_id,
                   list_cosine_similarity(p.qv, c.cv) AS cos
            FROM probes p JOIN corpus c USING (cell)
        )
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM cand QUALIFY rank <= 3
    """


def _kmeans_iteration_oracle_sql() -> str:
    """DuckDB replica of ONE similarity.kmeans_update_once iteration from
    the seed-7 centroids: same argmax-dot assignment (list_indexof ==
    array_position, both 1-based first-max), per-cluster per-position mean
    via a range(1,65) position join, unit renormalization, round(4)."""
    import numpy as np

    rng = np.random.RandomState(7)
    cents = rng.randn(16, 64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    dots = ", ".join(
        "list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + "])"
        for c in cents
    )
    return f"""
        WITH s AS (
            SELECT embedding::DOUBLE[] AS v FROM embeddings
        ), sc AS (
            SELECT v, [{dots}] AS scores FROM s
        ), a AS (
            SELECT (list_indexof(scores, list_max(scores)) - 1)::INT
                       AS centroid, v
            FROM sc
        ), e AS (
            SELECT centroid, (r.range - 1)::INT AS pos, v[r.range] AS val
            FROM a, range(1, 65) r
        ), m AS (
            SELECT centroid, pos, avg(val) AS m FROM e GROUP BY centroid, pos
        ), n AS (
            SELECT centroid, sqrt(sum(m * m)) AS norm FROM m GROUP BY centroid
        )
        SELECT m.centroid, m.pos,
               ROUND(CASE WHEN n.norm > 0 THEN m.m / n.norm ELSE m.m END, 4)
                   AS value
        FROM m JOIN n ON m.centroid = n.centroid
    """


def _subword_token_count_oracle_sql() -> str:
    """Cross-engine replica of textstats.subword_token_count: greedy
    longest-prefix (maximal munch) segmentation as a DuckDB RECURSIVE CTE
    — per distinct word, each recursion step consumes the longest vocab
    token that prefixes the remainder (or 1 UNK char), so max(cnt) is the
    word's segment count; doc totals weight by word multiplicity."""
    from smh_to_jsonld_spark.operators.textstats import load_subword_vocab

    values = ", ".join(f"('{t}')" for t in load_subword_vocab())
    return f"""
        WITH RECURSIVE vocab(tok) AS (
            SELECT * FROM (VALUES {values}) v(tok)
        ), dw AS (
            SELECT doc_id, w, count(*) AS n FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
                FROM documents WHERE doc_id < 100
            ) WHERE w <> '' GROUP BY doc_id, w
        ), words AS (
            SELECT DISTINCT w FROM dw
        ), seg(w, rem, cnt) AS (
            SELECT w, w, 0::BIGINT FROM words
            UNION ALL
            SELECT w,
                   substr(rem, 1 + coalesce((SELECT max(length(tok))
                                             FROM vocab
                                             WHERE starts_with(rem, tok)), 1)),
                   cnt + 1
            FROM seg WHERE rem <> ''
        ), per_word AS (
            SELECT w, max(cnt) AS toks FROM seg GROUP BY w
        ), per_doc AS (
            SELECT doc_id, sum(dw.n * per_word.toks) AS t
            FROM dw JOIN per_word USING (w) GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(p.t, 0)::BIGINT AS n_subword_tokens
        FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
        LEFT JOIN per_doc p USING (doc_id)
    """


def _golden_pred_counts_sql() -> str:
    """Constant-table oracle: per-pred DISTINCT triple counts from the
    reference-executed golden fixture (tests/fixtures/golden_triples.json).
    P/R=1.0 set equality (tests/test_golden_pr.py) implies these counts."""
    import json as _json

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "fixtures", "golden_triples.json")
    from collections import Counter

    with open(path) as f:
        counts = Counter(t[1] for t in _json.load(f))
    vals = ", ".join(f"('{p}', {n})" for p, n in sorted(counts.items()))
    return f"SELECT * FROM (VALUES {vals}) AS t(pred, n_triples)"


def oracle_sql() -> dict[str, str]:
    return {
        "distinct_values_per_group": """
            SELECT l_returnflag,
                   array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        """,
        "max_per_group": """
            SELECT l_returnflag,
                   round(max(l_quantity), 2) AS max_qty,
                   round(min(l_quantity), 2) AS min_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "histogram": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "top1_per_group": """
            SELECT o_custkey, o_orderkey AS latest_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS latest_date
            FROM orders
            QUALIFY row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        """,
        "first_wins_dedup": """
            SELECT o_custkey, o_orderkey AS first_orderkey
            FROM orders
            QUALIFY row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
        """,
        "broadcast_lookup": """
            SELECT coalesce(n.n_name, 'Unknown') AS nation,
                   count(*) AS n_customers,
                   CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
            FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                            (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                        AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "semi_join": """
            SELECT p_brand, count(*) AS n_parts FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
            GROUP BY p_brand
        """,
        "anti_join": """
            SELECT c_mktsegment, count(*) AS n_customers FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            GROUP BY c_mktsegment
        """,
        "sentinel_filter": """
            SELECT lang, count(*) AS n_docs FROM documents
            WHERE lang NOT IN ('zh', 'de') GROUP BY lang
        """,
        "regex_filter": """
            SELECT lang, count(*) AS n_docs FROM documents
            WHERE regexp_matches(text, 'spark [a-z]+ join') GROUP BY lang
        """,
        "name_minting": """
            SELECT s_suppkey,
                   s_name || '-' || CAST(s_nationkey AS VARCHAR) AS minted,
                   'kg:supplier/' || CAST(s_suppkey AS VARCHAR) AS iri
            FROM supplier
        """,
        "date_arithmetic": """
            SELECT o_orderpriority,
                   strftime(min(CAST(o_orderdate AS DATE) + 20), '%Y-%m-%d') AS min_end,
                   strftime(max(CAST(o_orderdate AS DATE) + 20), '%Y-%m-%d') AS max_end
            FROM orders GROUP BY o_orderpriority
        """,
        "interval_string": """
            SELECT o_orderpriority,
                   strftime(min(o_orderdate), '%Y-%m-%d') || '/' ||
                   strftime(max(o_orderdate), '%Y-%m-%d') AS coverage
            FROM orders GROUP BY o_orderpriority
        """,
        "topk": """
            SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank,
                   o_orderkey, round(o_totalprice, 2) AS price
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "case_insensitive_sort": """
            SELECT n_name,
                   row_number() OVER (ORDER BY lower(n_name) ASC, n_nationkey ASC) AS rank
            FROM nation
        """,
        "union_distinct": """
            SELECT DISTINCT nationkey FROM (
                SELECT c_nationkey AS nationkey FROM customer
                UNION ALL SELECT s_nationkey FROM supplier)
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_pieces
            FROM documents WHERE doc_id < 100
        """,
        "subword_token_count": _subword_token_count_oracle_sql(),
        "quality_score": """
            WITH f AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         x -> list_contains(['the','a','of','and','to','in','is'], x))) AS n_stop,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                     length(text) AS n_chars
              FROM documents WHERE doc_id < 100)
            SELECT doc_id, n_tokens,
                   round(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END, 4) AS stopword_ratio,
                   round(least(n_tokens / 64.0, 1.0) * 0.4
                         + least(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END * 4, 1.0) * 0.4
                         + (1 - least(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0 END * 10, 1.0)) * 0.2,
                         4) AS quality
            FROM f
        """,
        "repetition_score": """
            WITH f AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\n'),
                                 l -> length(trim(l)) > 0) AS lines,
                     CASE WHEN length(trim(text)) = 0 THEN []
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
              FROM documents WHERE doc_id < 500),
            g AS (
              SELECT doc_id, lines, toks,
                     len(toks) AS n_tok,
                     len(toks) - 1 AS t2,
                     len(toks) - 2 AS t3
              FROM f)
            SELECT doc_id,
                   round(CASE WHEN len(lines) > 0
                         THEN 1 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE)
                         ELSE 0 END, 4) AS dup_line_ratio,
                   round(CASE WHEN t2 > 0
                         THEN 1 - len(list_distinct(list_transform(generate_series(1, t2),
                              i -> toks[i] || ' ' || toks[i+1]))) / CAST(t2 AS DOUBLE)
                         ELSE 0 END, 4) AS dup_2gram_ratio,
                   round(CASE WHEN t3 > 0
                         THEN 1 - len(list_distinct(list_transform(generate_series(1, t3),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) / CAST(t3 AS DOUBLE)
                         ELSE 0 END, 4) AS dup_3gram_ratio
            FROM g
        """,
        "pii_scrub": """
            WITH aug AS (
              SELECT doc_id,
                     text || ' ' ||
                     'user' || doc_id || '@mail.example.com' || ' ' ||
                     '042-68-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ||
                     '555-867-530' || CAST(doc_id % 10 AS VARCHAR) || ' ' ||
                     '192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
              FROM documents WHERE doc_id < 500),
            s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
                     regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
              FROM aug),
            s2 AS (
              SELECT doc_id, n_email,
                     len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn,
                     regexp_replace(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS t
              FROM s1),
            s3 AS (
              SELECT doc_id, n_email, n_ssn,
                     len(regexp_extract_all(t, '\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}')) AS n_phone,
                     regexp_replace(t, '\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}', '<PHONE>', 'g') AS t
              FROM s2),
            s4 AS (
              SELECT doc_id, n_email, n_ssn, n_phone,
                     len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
                     regexp_replace(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g') AS t
              FROM s3)
            SELECT doc_id, n_email, n_ssn, n_phone, n_ipv4, md5(t) AS scrub_hash
            FROM s4
        """,
        "tfidf_top_terms": """
            WITH toks AS (
              SELECT doc_id AS doc, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
              FROM documents WHERE doc_id < 300),
            tf AS (
              SELECT doc, token, count(*) AS tf
              FROM toks WHERE length(token) > 0 GROUP BY doc, token),
            dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM documents WHERE doc_id < 300),
            scored AS (
              SELECT tf.doc, tf.token, tf.tf, dfreq.df,
                     tf.tf * (ln((n.n + 1) / CAST(dfreq.df + 1 AS DOUBLE)) + 1) AS tfidf
              FROM tf JOIN dfreq USING (token) CROSS JOIN n),
            ranked AS (
              SELECT doc, token, tf, df,
                     row_number() OVER (PARTITION BY doc ORDER BY tfidf DESC, token ASC) AS rank
              FROM scored)
            SELECT doc AS doc_id, token, tf, df, rank FROM ranked WHERE rank <= 3
        """,
        "language_id": """
            WITH s AS (
              SELECT lang,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
              FROM documents),
            sc AS (
              SELECT lang,
                     len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en,
                     len(list_filter(toks, x -> list_contains(['el','la','de','los','que','y'], x))) AS s_es,
                     len(list_filter(toks, x -> list_contains(['le','la','les','des','et','un'], x))) AS s_fr,
                     len(list_filter(toks, x -> list_contains(['der','die','das','und','ein','ist'], x))) AS s_de
              FROM s)
            SELECT lang,
                   CASE
                     WHEN s_de > greatest(s_en, s_es, s_fr, 0) THEN 'de'
                     WHEN s_fr > greatest(s_en, s_es, 0) THEN 'fr'
                     WHEN s_es > greatest(s_en, 0) THEN 'es'
                     WHEN s_en > 0 THEN 'en'
                     ELSE 'und' END AS predicted,
                   count(*) AS n
            FROM sc GROUP BY 1, 2
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents WHERE doc_id < 100
        """,
        "exact_dedup_stats": """
            SELECT lang, count(*) AS n_rows,
                   count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS n_distinct
            FROM documents GROUP BY lang
        """,
        "jaccard_pairs": """
            WITH t AS (
              SELECT doc_id,
                     list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
              FROM documents WHERE doc_id < 150),
            e0 AS (SELECT doc_id, len(toks) AS sz, unnest(toks) AS g FROM t),
            -- the stop-shingle cap, replicated: buckets > 120 are dropped
            -- BEFORE pair expansion (max_bucket=120 on the Spark side)
            bs AS (SELECT g FROM e0 GROUP BY g HAVING count(*) <= 120),
            e AS (SELECT e0.* FROM e0 JOIN bs USING (g)),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
                     count(*) AS shared
              FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b,
                   round(shared / CAST(sa + sb - shared AS DOUBLE), 4) AS jaccard
            FROM p WHERE shared / CAST(sa + sb - shared AS DOUBLE) >= 0.5
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 200 AND b.vec_id < 200
              AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.40
        """,
        # LSH variant: (k=2, L=16) hyperplane tables + exact verification
        # has empirical recall 1.0 on this data, so the output equals the
        # exact >= 0.40 pair set (cosine reported for value-hash parity).
        "embedding_neardup_lsh": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 1000 AND b.vec_id < 1000
              AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.40
        """,
        # MinHash LSH at 32/16 bands: candidate recall at J>=0.8 is
        # 1-(1-J^2)^16 > 1-1e-7; verification is exact, so output equals
        # the exact J>=0.8 token-set pairs.
        "minhash_lsh_pairs": """
            WITH t AS (
              SELECT doc_id,
                     list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
              FROM documents WHERE doc_id < 300),
            e AS (SELECT doc_id, len(toks) AS sz, unnest(toks) AS g FROM t),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
                     count(*) AS shared
              FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b,
                   round(shared / CAST(sa + sb - shared AS DOUBLE), 4) AS jaccard
            FROM p WHERE shared / CAST(sa + sb - shared AS DOUBLE) >= 0.8
        """,
        "near_dup_clusters": """
            WITH RECURSIVE t AS (
              SELECT doc_id,
                     list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
              FROM documents WHERE doc_id < 300),
            e AS (SELECT doc_id, len(toks) AS sz, unnest(toks) AS g FROM t),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
                     count(*) AS shared
              FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4),
            pe AS (
              SELECT id_a AS a, id_b AS b FROM p
              WHERE shared / CAST(sa + sb - shared AS DOUBLE) >= 0.8),
            ud AS (SELECT a, b FROM pe UNION SELECT b, a FROM pe),
            r AS (
              SELECT v, v AS m FROM (SELECT a AS v FROM ud UNION SELECT b FROM ud)
              UNION
              SELECT ud.a AS v, r.m FROM ud JOIN r ON ud.b = r.v),
            comp AS (SELECT v, min(m) AS cluster FROM r GROUP BY v)
            SELECT d.doc_id,
                   coalesce(c.cluster, d.doc_id) AS cluster,
                   (d.doc_id = coalesce(c.cluster, d.doc_id)) AS is_representative
            FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
            LEFT JOIN comp c ON d.doc_id = c.v
        """,
        # SimHash: md5_number_upper == Spark's md5-low64 (first 8 digest
        # bytes, little-endian); 16-bit pigeonhole blocking is exact for
        # hamming<=3, so all-pairs SQL equals the blocked Spark result.
        "simhash_neardup": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS tok
              FROM documents WHERE doc_id < 300),
            bits AS (
              SELECT doc_id, b.b AS b,
                     sum(CASE WHEN (md5_number_upper(tok) >> b.b) & 1 = 1
                              THEN 1 ELSE -1 END) AS s
              FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
              GROUP BY doc_id, b.b),
            usig AS (
              SELECT doc_id,
                     sum(CASE WHEN s > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS u
              FROM bits GROUP BY doc_id),
            sig AS (
              SELECT d.doc_id,
                     coalesce(CAST(u::HUGEINT
                       - CASE WHEN u >= (1::HUGEINT << 63)::UBIGINT
                              THEN (1::HUGEINT << 64) ELSE 0 END AS BIGINT), 0) AS sig
              FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
              LEFT JOIN usig u USING (doc_id))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.sig, b.sig)) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 3
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
                 c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
                       FROM embeddings WHERE vec_id >= 5)
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id ASC) AS rank
            FROM q CROSS JOIN c
            QUALIFY rank <= 3
        """,
        "cosine_topk_lsh": _lsh_topk_oracle_sql(),
        "ivf_assign": _ivf_assign_oracle_sql(),
        "ivf_topk": _ivf_topk_oracle_sql(),
        "kmeans_iteration": _kmeans_iteration_oracle_sql(),
        "transcript_triples": _golden_pred_counts_sql(),
        "salted_agg": """
            SELECT l_returnflag, count(*) AS n_rows,
                   array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
            FROM lineitem GROUP BY l_returnflag
        """,
        "graph_materialize": """
            WITH contain AS (
              SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS subj,
                              'p' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem WHERE l_orderkey < 200),
            nodes AS (
              SELECT DISTINCT subj AS iri, 'Order' AS types FROM contain
              UNION
              SELECT DISTINCT obj AS iri, 'Part' AS types FROM contain),
            outdeg AS (SELECT subj AS iri, count(*) AS out_edges
                       FROM contain GROUP BY subj)
            SELECT n.iri, n.types, coalesce(o.out_edges, 0) AS out_edges
            FROM nodes n LEFT JOIN outdeg o USING (iri)
        """,
        # min-label connected components as a reachability recursive CTE:
        # component(v) = min vertex id reachable from v (undirected).
        "connected_components": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS a,
                              'p' || CAST(l_partkey AS VARCHAR) AS b
              FROM lineitem WHERE l_orderkey < 60),
            ud AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
            r AS (
              SELECT v, v AS m FROM (SELECT a AS v FROM ud UNION SELECT b FROM ud)
              UNION
              SELECT ud.a AS v, r.m FROM ud JOIN r ON ud.b = r.v
            ),
            comp AS (SELECT v, min(m) AS component FROM r GROUP BY v)
            SELECT component, count(*) AS size FROM comp GROUP BY component
        """,
        "kg_mentions": """
            SELECT term, count(*) AS n_mentions FROM (
              SELECT unnest(regexp_extract_all(
                  text, '\\b(spark|join|hash|merge|window|scan)\\b', 1)) AS term
              FROM documents)
            GROUP BY term
        """,
        "events_daily": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "events_json_extract": """
            SELECT event_type,
                   CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS DECIMAL(18,4))) AS DOUBLE) AS sum_k
            FROM events GROUP BY event_type
        """,
        "multimodal_features": """
            SELECT doc_id AS media_id,
                   octet_length(encode(text)) AS byte_len,
                   substr(sha256(text), 1, 16) AS digest
            FROM documents WHERE doc_id < 100
        """,
    }
