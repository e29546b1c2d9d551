"""Entity linking: blocked candidate generation + broadcast alias dictionary
+ salted repartitioning for head-entity skew.

Generalizes the reference's lookup-dict joins (J1/J2/J3:
/root/reference/utils/location.py:74-112,
/root/reference/pipeline/jsonld_to_html.py:384-405) into the KG linking
stage mandated by BASELINE.json north_star:

1. exact pass — normalize surface form, broadcast-join the alias dict
   (dictionary is config-sized; NEVER shuffle the mention table for it);
2. fuzzy pass — only the exact-pass MISSES (a tiny fraction) go through
   token-prefix blocking + trigram-Jaccard scoring against the dictionary,
   then top-1 per surface form;
3. misses keep their surface form (the reference emits "Unknown" nodes on
   lookup miss rather than dropping rows — same row-preserving contract).

Skew: at 10^12 turns the head entity ("US") dominates mention counts. Plain
groupBy(entity).agg(collect_set(...)) puts one hot key on one reducer;
``salted_collect_set``/``salted_count`` do a two-phase agg
(key+salt partial -> key final) so the hot key fans out over S reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_surface(col):
    """lower + trim + strip trailing punctuation — the cheap, always-safe
    normalization applied before any dictionary work."""
    return F.regexp_replace(F.lower(F.trim(col)), r"[.\s]+$", "")


def link_exact(
    mentions: DataFrame, alias_dim: DataFrame, surface_col: str = "location_surface"
) -> DataFrame:
    """Broadcast alias-dict join. Adds `canonical` (NULL on miss)."""
    norm = normalize_surface(F.col(surface_col)).alias("__norm")
    return mentions.withColumn("__norm", norm).join(
        F.broadcast(alias_dim.select(F.col("alias").alias("__norm"),
                                     F.col("canonical"))),
        "__norm",
        "left",
    ).drop("__norm")


def _trigrams(col):
    # sliding 3-grams via sequence+transform (pure Catalyst, no UDF)
    padded = F.concat(F.lit("  "), col, F.lit("  "))
    n = F.length(padded) - 2
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: padded.substr(i, F.lit(3)))
    )


def fuzzy_candidates(
    misses: DataFrame,
    alias_dim: DataFrame,
    surface_col: str = "surface",
    block_prefix: int = 2,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Blocked fuzzy matching of DISTINCT unresolved surface forms.

    Candidate generation is an equi-join on the first `block_prefix` chars
    (token-prefix blocking) — the classic trick to avoid the O(n*m)
    cross join. Scoring is trigram Jaccard via array_intersect/array_union
    (pure Catalyst). Returns (surface, canonical, score), top-1 per surface.
    """
    left = (
        misses.select(normalize_surface(F.col(surface_col)).alias("surface"))
        .distinct()
        .withColumn("block", F.substring("surface", 1, block_prefix))
        .withColumn("grams", _trigrams(F.col("surface")))
    )
    right = (
        alias_dim.select(F.col("alias"), F.col("canonical"))
        .withColumn("block", F.substring("alias", 1, block_prefix))
        .withColumn("agrams", _trigrams(F.col("alias")))
    )
    scored = (
        left.join(F.broadcast(right), "block")
        .withColumn(
            "score",
            F.size(F.array_intersect("grams", "agrams"))
            / F.size(F.array_union("grams", "agrams")),
        )
        .filter(F.col("score") >= min_jaccard)
    )
    from smh_to_jsonld_spark.operators.aggregates import top1_per_group

    ranked = scored.select("surface", "canonical", "score", "alias")
    # deterministic top-1 with a TOTAL order: score desc, then alias asc.
    # (struct asc over (-score, alias): ties on score fall through to the
    # lexicographically smallest alias — no nondeterministic row_number.)
    best = top1_per_group(
        ranked.withColumn(
            "__ord", F.struct((F.lit(0) - F.col("score")).alias("s"), F.col("alias"))
        ),
        ["surface"],
        "__ord",
        desc=False,
    )
    return best.select("surface", "canonical", "score")


def _minhash_band_keys(grams_col, num_hashes: int = 16, bands: int = 8):
    """Banded MinHash keys over a token/trigram array column: h_i =
    min(xxhash64(gram, i)), bands of r = num_hashes/bands rows hashed to
    one key each. Returns an array<long> of band keys (seeded per band via
    the hash index, so bands are independent)."""
    r = num_hashes // bands

    def _seeded(seed: int):
        # helper factory, NOT a default-arg lambda: PySpark binds a
        # 2-param HOF lambda as (element, index)
        return lambda g: F.xxhash64(g, F.lit(seed))

    hashes = [
        F.array_min(F.transform(grams_col, _seeded(i))) for i in range(num_hashes)
    ]
    return F.array(
        *[
            F.xxhash64(F.lit(b), *hashes[b * r : (b + 1) * r])
            for b in range(bands)
        ]
    )


def fuzzy_candidates_minhash(
    misses: DataFrame,
    alias_dim: DataFrame,
    surface_col: str = "surface",
    num_hashes: int = 16,
    bands: int = 8,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """MinHash-blocked fuzzy matching — the OTHER blocking family the
    north_star names ("MinHash/token-prefix blocking"). Prefix blocking
    misses first-char typos ('kalifornia'); banded MinHash over trigram
    sets blocks by CONTENT similarity instead: with 16 hashes / 8 bands
    (r=2) a J=0.5 pair shares a band with prob 1-(1-0.25)^8 ~ 0.90, at
    any edit position.

    Same scoring and deterministic top-1 tie-break as the prefix path
    (exact trigram Jaccard; score desc, alias asc) — only candidate
    GENERATION differs: explode band keys on both sides, equi-join on
    (band key), dedup pairs. The dictionary side stays broadcast-sized.
    """
    left = (
        misses.select(normalize_surface(F.col(surface_col)).alias("surface"))
        .distinct()
        .withColumn("grams", _trigrams(F.col("surface")))
        .withColumn("bk", _minhash_band_keys(F.col("grams"), num_hashes, bands))
        .select("surface", "grams", F.explode("bk").alias("bk"))
    )
    right = (
        alias_dim.select("alias", "canonical")
        .withColumn("agrams", _trigrams(F.col("alias")))
        .withColumn("bk", _minhash_band_keys(F.col("agrams"), num_hashes, bands))
        .select("alias", "canonical", "agrams", F.explode("bk").alias("bk"))
    )
    cand = (
        left.join(F.broadcast(right), "bk")
        .select("surface", "grams", "alias", "canonical", "agrams")
        .distinct()
    )
    scored = cand.withColumn(
        "score",
        F.size(F.array_intersect("grams", "agrams"))
        / F.size(F.array_union("grams", "agrams")),
    ).filter(F.col("score") >= min_jaccard)
    from smh_to_jsonld_spark.operators.aggregates import top1_per_group

    best = top1_per_group(
        scored.select("surface", "canonical", "score", "alias").withColumn(
            "__ord", F.struct((F.lit(0) - F.col("score")).alias("s"), F.col("alias"))
        ),
        ["surface"],
        "__ord",
        desc=False,
    )
    return best.select("surface", "canonical", "score")


def link_locations(
    facts: DataFrame, spark: SparkSession, surface_col: str = "location_surface",
    fuzzy_blocking: str = "prefix", vocab: DataFrame | None = None,
) -> DataFrame:
    """Full linking pass: exact broadcast dictionary + fuzzy for residual
    surfaces, surface-form passthrough for true misses. Adds `location`.

    ``fuzzy_blocking``: candidate-generation family for the fuzzy pass —
    "prefix" (token-prefix equi-join, the default; oracle-pinned) or
    "minhash" (banded MinHash over trigram sets — robust to first-char
    typos). Scoring and tie-breaks are identical either way.

    ``vocab``: optional cheaper source for the surface vocabulary — a
    DataFrame with one ``surface`` column (raw forms; normalized and
    deduped here) whose surface SET is a superset of the fact table's.
    Without it the vocabulary pass scans ``facts`` itself, which re-executes
    the whole upstream fact subplan (extraction + conv joins) a second
    time per action; callers that hold a persisted upstream (e.g. the
    mention cache in plans.pipeline.extract_and_link) pass the surface
    column from THAT instead. Superset vocabularies are harmless: linking
    is per-surface deterministic and the mapping stays key-unique, so
    extra entries simply go unused by the final join.

    Single-consumption design: the vocabulary is a partial-agg shuffle of
    a tiny distinct set, the fuzzy matcher runs only on vocabulary misses,
    and the union of (alias dict + fuzzy matches) becomes ONE broadcast
    mapping joined back in a single pass. The big table is never shuffled
    and never consumed twice by the linking plan itself.
    """
    from smh_to_jsonld_spark.functions.dims import alias_dim

    dim = alias_dim(spark)
    surfaces = (
        vocab.select(normalize_surface(F.col("surface")).alias("surface"))
        if vocab is not None
        else facts.select(normalize_surface(F.col(surface_col)).alias("surface"))
    ).distinct()
    misses = surfaces.join(
        F.broadcast(dim.select(F.col("alias").alias("surface"))), "surface", "left_anti"
    )
    fuzzy_fn = {
        "prefix": fuzzy_candidates,
        "minhash": fuzzy_candidates_minhash,
    }[fuzzy_blocking]
    fuzzy = fuzzy_fn(misses, dim).select(
        F.col("surface").alias("__norm"), F.col("canonical")
    )
    mapping = dim.select(F.col("alias").alias("__norm"), F.col("canonical")).unionByName(
        fuzzy
    )
    out = (
        facts.withColumn("__norm", normalize_surface(F.col(surface_col)))
        .join(F.broadcast(mapping), "__norm", "left")
        .withColumn("location", F.coalesce(F.col("canonical"), F.col(surface_col)))
        .drop("__norm", "canonical")
    )
    return out


# ---------------------------------------------------------------------------
# Skew-defusing two-phase aggregations
# ---------------------------------------------------------------------------

def salted_count(df: DataFrame, key_cols, salt_buckets: int = 16) -> DataFrame:
    """count(*) per key with an explicit salt stage.

    (Spark's hash agg already does map-side partial counts; the explicit
    salt matters when the planner falls back to object agg or when the
    final agg itself is the bottleneck — and it documents the pattern the
    north_star requires.)
    """
    keys = [F.col(k) for k in (key_cols if isinstance(key_cols, (list, tuple)) else [key_cols])]
    salt = F.pmod(F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
                  F.lit(salt_buckets)).alias("__salt")
    partial = df.select(*keys, salt).groupBy(*keys, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("count"))


def salted_collect_set(
    df: DataFrame, key_cols, value_col: str, salt_buckets: int = 16
) -> DataFrame:
    """collect_set(value) per key, two-phase: hot keys fan out over
    `salt_buckets` reducers in phase 1, then tiny per-key set-union in
    phase 2. Use whenever a collected set per key can be large AND keys
    are skewed (head entities)."""
    keys = key_cols if isinstance(key_cols, (list, tuple)) else [key_cols]
    salt = F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(salt_buckets)).alias(
        "__salt"
    )
    partial = (
        df.select(*[F.col(k) for k in keys], F.col(value_col), salt)
        .groupBy(*keys, "__salt")
        .agg(F.collect_set(value_col).alias("__s"))
    )
    return partial.groupBy(*keys).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("__s")))).alias(
            f"{value_col}_set"
        )
    )
