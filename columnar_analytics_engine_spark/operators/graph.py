"""Deterministic integer PageRank over a pair graph.

Complements :mod:`operators.clusters` (connected components): components
tell you WHICH docs form a duplication cluster, PageRank tells you which
node is the cluster's hub — the canonical-representative / template-spam
signal a curation pipeline ranks by.

Exactness contract (same philosophy as the quantized k-means in
queries/training.py): ranks are integers on a ``scale`` grid
(default 1e12 mass total), damping and out-degree division use integer
floor division, and iterations are a fixed count — so the result is
bit-reproducible on any engine and a SQL oracle can replay every round.
Floor-division truncation leaks a little mass per step (bounded by
#edges per node per round); that loss is deterministic and identical in
the oracle.

Scale shape: each round is one join of the rank table with the edge
list (both keyed on node ids) plus a dst-keyed aggregation — the
standard distributed PageRank; no driver-side state, no window, rounds
add plan depth only.  Cap iterations (3 by default) or persist the
rank frame per round for long chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.functions.caching import persist_once

PR_SCALE = 10**12
PR_DAMP_NUM = 85   # damping 0.85 as an exact rational
PR_DAMP_DEN = 100


def pagerank(edges: DataFrame, iterations: int = 3, scale: int = PR_SCALE) -> DataFrame:
    """(node, degree, rank) after ``iterations`` exact-integer PageRank
    rounds over directed ``edges`` (src, dst) — pass both directions for
    an undirected graph.  Edges must be distinct; every node needs
    out-degree >= 1 (true by construction for symmetrized pair graphs,
    so there are no dangling nodes).
    """
    adj = edges.select("src", "dst")
    deg = adj.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("degree"))
    n1 = deg.agg(F.count("*").alias("n_nodes"))
    # node-sized and referenced by the init AND every round's rebuild:
    # persisted, or each of the iterations+1 consumers re-runs the
    # degree aggregation + cross join (duplicate_join_subtrees class)
    nodes = persist_once(deg.crossJoin(F.broadcast(n1)))
    teleport = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    r = nodes.withColumn("rank", F.expr(f"{scale} div n_nodes"))
    for _ in range(iterations):
        out = r.select(
            F.col("node").alias("_src"),
            F.expr(f"(rank * {PR_DAMP_NUM} div {PR_DAMP_DEN}) div degree").alias(
                "_out"
            ),
        )
        inc = (
            adj.join(out, adj["src"] == F.col("_src"))
            .groupBy(F.col("dst").alias("_node"))
            .agg(F.sum("_out").alias("_inc"))
        )
        r = (
            nodes.join(inc, nodes["node"] == F.col("_node"), "left")
            .select(
                "node",
                "degree",
                "n_nodes",
                (
                    F.expr(f"{teleport} div n_nodes")
                    + F.coalesce(F.col("_inc"), F.lit(0))
                ).alias("rank"),
            )
        )
    return r.select("node", "degree", "rank")


def pagerank_round_sql(prev: str, cur: str, edges: str = "edges", scale: int = PR_SCALE) -> str:
    """One PageRank round as a DuckDB CTE, replaying :func:`pagerank`
    bit-for-bit (``//`` and ``div`` agree on nonnegative integers)."""
    teleport = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    return f"""
{cur} AS (
  SELECT d.node, d.degree, d.n_nodes,
         CAST({teleport} // d.n_nodes
           + COALESCE(SUM((r.rank * {PR_DAMP_NUM} // {PR_DAMP_DEN}) // r.degree), 0)
           AS BIGINT) AS rank
  FROM {prev} d
  LEFT JOIN {edges} e ON e.dst = d.node
  LEFT JOIN {prev} r ON r.node = e.src
  GROUP BY 1, 2, 3
)"""
