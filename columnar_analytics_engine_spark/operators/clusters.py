"""Transitive duplicate clusters: min-label propagation + pointer jumping.

The greedy keeper assignment (queries/llm.py) is single-pass; true
cluster collapse needs connected components over the near-dup pair
graph.  Each round every node adopts the smallest label among itself
and its neighbors (one join + one aggregation, shuffles on doc_id),
then POINTER-JUMPS: adopts its label's label (one self-join).  The jump
is the large-star/small-star idea in label space — label chains halve
every round, so convergence needs O(log diameter) rounds instead of
O(diameter), which is what makes the operator safe on 100 TB graphs
with long chains (a pathological crawl with a 10^6-long duplicate chain
converges in ~20 rounds, not 10^6).

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
        # checkpoint BEFORE the pointer-jump self-join: both sides of
        # that join read `propagated`, and an uncheckpointed plan would
        # execute the (heavy) edges-join twice per round.  Carrying the
        # previous label through as `old` also makes the convergence
        # check a plain filter on checkpointed data instead of a
        # join-per-round against the old labels.
        propagated = (
            labels.select("doc_id", F.col("cluster_id").alias("old"))
            .join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                "old",
                F.least(F.col("old"), F.coalesce("nbr_min", F.col("old"))).alias(
                    "mid"
                ),
            )
            .localCheckpoint()
        )
        # pointer jump: adopt the label's label.  Every mid is itself a
        # node (it is the min doc_id seen so far), so the inner
        # self-join is total; chains halve each round -> O(log diameter).
        new_labels = (
            propagated.alias("x")
            .join(
                propagated.select(
                    F.col("doc_id").alias("ld"), F.col("mid").alias("lm")
                ),
                F.col("x.mid") == F.col("ld"),
            )
            .select(
                F.col("x.doc_id").alias("doc_id"),
                F.col("x.old").alias("old"),
                F.col("lm").alias("cluster_id"),
            )
            # lazy: the `changed` count right below is this frame's
            # first action and materializes the checkpoint — eager=True
            # would spend one extra job per round on the same work
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.filter(F.col("cluster_id") != F.col("old")).limit(1).count()
        )
        labels = new_labels.select("doc_id", "cluster_id")
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
