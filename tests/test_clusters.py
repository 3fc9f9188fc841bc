"""Connected-components clustering vs a driver-side union-find oracle."""

from __future__ import annotations

from columnar_analytics_engine_spark.io import read_table
from columnar_analytics_engine_spark.operators.clusters import connected_components
from columnar_analytics_engine_spark.operators.dedup import minhash_near_duplicates


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_graph_collapses_to_one_cluster(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], "d1 long, d2 long")
    labels = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_match_union_find_on_real_pairs(spark, sf_small):
    docs = read_table(spark, sf_small, "documents")
    pairs_df = minhash_near_duplicates(docs, threshold=0.8)
    pairs = [(r["d1"], r["d2"]) for r in pairs_df.collect()]
    want = _union_find(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs_df).collect()}
    assert got == want


def test_connected_components_raises_on_non_convergence(spark):
    # a 5-node path graph has diameter 4; one iteration cannot converge
    import pytest
    from columnar_analytics_engine_spark.operators.clusters import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "d1 long, d2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1)


def test_long_chain_converges_in_log_rounds(spark):
    """A 300-node path graph has diameter 300 — pure min-propagation
    would need 300 rounds and blow the 20-round budget; pointer jumping
    must converge inside it."""
    from columnar_analytics_engine_spark.operators.clusters import (
        connected_components,
    )

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "d1 long, d2 long"
    )
    out = connected_components(pairs, max_iterations=20).collect()
    assert len(out) == n + 1
    assert {r["cluster_id"] for r in out} == {0}


def test_cluster_size_histogram_accounts_for_every_doc(spark, sf_small):
    from pyspark.sql import functions as F

    from columnar_analytics_engine_spark.queries.llm import (
        dedup_cluster_size_histogram,
    )
    from columnar_analytics_engine_spark.queries._util import t as t_

    hist = dedup_cluster_size_histogram(spark, sf_small).collect()
    n_docs = t_(spark, sf_small, "documents").count()
    assert sum(r["n_docs"] for r in hist) == n_docs
    assert all(r["n_docs"] == r["cluster_size"] * r["n_clusters"] for r in hist)
