"""operators/graph.pagerank: exact-integer PageRank invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.operators.graph import PR_SCALE, pagerank


def _edges(spark, pairs):
    und = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(und)), "src long, dst long")


def test_star_center_ranks_highest(spark):
    # star: 0 -- {1..5}; the hub must outrank every leaf
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    r = {row.node: row for row in pagerank(e).collect()}
    assert r[0].degree == 5
    assert all(r[0].rank > r[i].rank for i in range(1, 6))
    # leaves are symmetric => identical ranks
    assert len({r[i].rank for i in range(1, 6)}) == 1


def test_symmetric_pair_splits_mass_equally(spark):
    e = _edges(spark, [(1, 2)])
    r = {row.node: row.rank for row in pagerank(e).collect()}
    assert r[1] == r[2]


def test_mass_is_conserved_up_to_truncation(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    out = pagerank(e).collect()
    total = sum(r.rank for r in out)
    # floor division leaks < 1 unit per division; 3 rounds x (n + m) divisions
    n, m = 4, 10
    assert PR_SCALE - 3 * (n + m + n) <= total <= PR_SCALE


def test_deterministic_under_repartition(spark):
    pairs = [(i, (i * 7 + 1) % 23) for i in range(23) if i != (i * 7 + 1) % 23]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, pagerank(e).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(13)).collect()))
    assert a == b
