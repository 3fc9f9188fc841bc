"""Similarity search: brute-force correctness properties + IVF recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.io import read_table
from columnar_analytics_engine_spark.operators.similarity import cosine_topk, ivf_topk


def test_bruteforce_topk_shape(spark, sf_small):
    emb = read_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk(queries, emb, k=10)
    rows = out.collect()
    per_query = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append(r)
        assert r["query_id"] != r["neighbor_id"]
        assert -1.0001 <= r["cos_sim"] <= 1.0001
    for qid, neighbors in per_query.items():
        assert len(neighbors) == 10
        ranked = sorted(neighbors, key=lambda r: r["rank"])
        sims = [r["cos_sim"] for r in ranked]
        assert sims == sorted(sims, reverse=True)


def test_ivf_recall_vs_bruteforce(spark, sf_small):
    emb = read_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(queries, emb, k=10).collect()
    approx = ivf_topk(queries, emb, k=10, n_lists=8, n_probe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # probing half the lists should recover well over half the true top-k
    assert mean_recall >= 0.5, f"mean recall {mean_recall:.2f}, per-query {recalls}"


def test_lsh_recall_vs_bruteforce(spark, sf_small):
    from columnar_analytics_engine_spark.operators.similarity import lsh_topk

    emb = read_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(queries, emb, k=10).collect()
    # this corpus has weak neighbor structure (max pairwise cosine ~0.5),
    # so use short 4-bit buckets with many tables: collision probability
    # for cos≈0.5 is (1-θ/π)^4 ≈ 0.2 per table → ~0.83 over 8 tables
    approx = lsh_topk(queries, emb, k=10, n_planes=4, n_tables=8).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.4, f"mean recall {mean_recall:.2f}"


def test_lsh_deterministic(spark, sf_small):
    from columnar_analytics_engine_spark.operators.similarity import lsh_topk

    emb = read_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    a = sorted(tuple(r) for r in lsh_topk(queries, emb, k=5).collect())
    b = sorted(tuple(r) for r in lsh_topk(queries, emb, k=5).collect())
    assert a == b
