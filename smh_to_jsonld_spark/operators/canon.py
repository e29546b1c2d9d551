"""Canonicalization: connected components over same-as edges + stable IRI
minting.

Catalyst has no fixpoint operator (SURVEY.md §4), so connected components
is the one genuinely iterative piece of the engine: min-label propagation
via repeated self-join, with ``localCheckpoint`` every few rounds to cut
lineage (otherwise the plan tree grows exponentially and the driver OOMs
long before the data does). Convergence is detected with a count of
changed labels. All randomness-free; label = lexicographic min vertex id,
so results are deterministic at any parallelism.

IRI minting follows the reference's rule shape
(/root/reference/utils/location.py:88-98: a deterministic id computed from
the entity key): here the canonical IRI is a hash of the component's full
sorted member set, so it is stable under re-runs and insensitive to which
member was the propagation winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Return (vertex, component) where component = min vertex id in the
    connected component (undirected).

    Cost model: each iteration is one shuffle of the edge table + one of
    the label table; iterations needed = graph diameter (alias clusters
    are star-shaped => 2-3 iterations in practice).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()

    labels = (
        und.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
    )

    for i in range(max_iterations):
        neighbor_labels = und.join(
            labels, und["a"] == labels["vertex"], "inner"
        ).select(F.col("b").alias("vertex"), F.col("label"))
        new_labels = (
            labels.select("vertex", "label")
            .union(neighbor_labels)
            .groupBy("vertex")
            .agg(F.min("label").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select("vertex", F.col("label").alias("component"))


def mint_component_iris(components: DataFrame, prefix: str = "kg:entity/") -> DataFrame:
    """(vertex, component) -> (vertex, component, iri).

    iri = prefix + sha1(sorted member set) — stable under re-runs and
    independent of label-propagation tie-breaking.
    """
    member_sets = components.groupBy("component").agg(
        F.sha1(
            F.to_binary(
                F.concat_ws("", F.sort_array(F.collect_set("vertex"))), F.lit("utf-8")
            )
        ).alias("__h")
    )
    return components.join(member_sets, "component").select(
        "vertex",
        "component",
        F.concat(F.lit(prefix), F.col("__h")).alias("iri"),
    )


def sameas_edges_from_linking(linked: DataFrame, surface_col: str, canonical_col: str) -> DataFrame:
    """Build the same-as edge set from linking output: every resolved
    surface form is connected to its canonical entity key. Distinct pairs
    only — corpus-size-independent (bounded by vocabulary)."""
    return (
        linked.select(
            F.col(surface_col).cast("string").alias("src"),
            F.col(canonical_col).cast("string").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
