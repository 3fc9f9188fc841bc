"""Transitive duplicate clusters: iterative min-label propagation.

The greedy keeper assignment (queries/llm.py) is single-pass; true
cluster collapse needs connected components over the near-dup pair
graph.  This is the alternating-rounds large-star/small-star idea in
its simplest form: every node repeatedly adopts the smallest label among
itself and its neighbors until no label changes.  Each round is one
join + one aggregation (all shuffles on doc_id); rounds needed =
graph diameter (near-dup clusters are shallow — single digits).

Driver-side iteration with a convergence check is the idiomatic Spark
shape for fixpoint algorithms (same as GraphX/Pregel under the hood);
``localCheckpoint`` truncates the growing lineage each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Labels (doc_id, cluster_id) for every node in the pair graph
    (d1, d2), cluster_id = min doc_id reachable.

    Nodes absent from ``pairs`` are absent from the output (join with
    the corpus and coalesce to self for a total assignment).
    """
    edges = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .union(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter exceeds the budget); labels would "
            "be wrong — raise max_iterations"
        )
    return labels
