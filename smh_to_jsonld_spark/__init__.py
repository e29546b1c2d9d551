"""smh_to_jsonld_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
midas-network/smh-to-jsonld (reference at /root/reference, read-only).

This is NOT a port. The reference is a single-node, driver-side Python ETL
(per-model loop, pandas aggregation, dict-built JSON-LD). This engine
re-expresses every capability Spark-first:

- scans/filters/projections  -> DataFrame API, Catalyst pushdown/pruning
- per-model distinct values  -> groupBy + collect_set (map-side partial agg)
- dimension lookups          -> broadcast joins (FIPS/alias dictionaries)
- target semi-join           -> left_semi with empty-observed-set bypass
- JSON-LD assembly           -> nested struct + to_json (null-dropping),
                                grouped applyInPandas only for the bounded
                                per-round consolidation
- triple factory             -> Arrow-batched pandas UDF extraction over
                                transcript text, explode
- entity linking             -> token/minhash blocking + broadcast alias dict
                                + salted repartition for head entities
- canonicalization           -> connected components (iterative self-join,
                                checkpointed)

Modules
-------
session      SparkSession factory (AQE, Arrow, tuned shuffle partitions)
sources      deterministic corpus synthesis + table IO w/ snapshot manifests
functions    scalar column functions (C1-C17 of SURVEY.md §2.7) + dims
operators    aggregates, joins, extract, link, canon, emit, dedup,
             similarity, textstats, multimodal
plans        end-to-end pipeline orchestration, checkpoint/resume, metrics
streaming    structured-streaming ingestion of transcript turns
"""

__version__ = "0.1.0"
