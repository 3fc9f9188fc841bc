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


def test_ivf_probe_topk_matches_inplan_ivf(spark, sf_small, tmp_path):
    """Probing a PERSISTED index (ivf_assignments written out, then
    ivf_probe_topk) must return exactly what the in-plan ivf_topk
    composition returns — the deployment split is a pure refactor of
    the one-shot form."""
    from columnar_analytics_engine_spark.operators.similarity import (
        ivf_assignments,
        ivf_probe_topk,
    )

    emb = read_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(queries, emb, k=5, n_lists=8, n_probe=3).collect()
    }

    seeds, assigned = ivf_assignments(emb, n_lists=8)
    seeds.write.parquet(str(tmp_path / "seeds"))
    assigned.write.parquet(str(tmp_path / "index"))
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_probe_topk(
            queries,
            spark.read.parquet(str(tmp_path / "seeds")),
            spark.read.parquet(str(tmp_path / "index")),
            k=5,
            n_probe=3,
        ).collect()
    }
    assert got == want
    assert len(want) == 10 * 5


def test_synthetic_embeddings_table(spark):
    """Generator contract: fixture schema, deterministic values, real
    cluster structure (a vector's nearest neighbor shares its label)."""
    from columnar_analytics_engine_spark.sources.synthetic import embeddings_table

    emb = embeddings_table(spark, 2000, dim=16, n_clusters=10)
    assert [f.name for f in emb.schema.fields] == ["vec_id", "embedding", "label"]
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
    first = emb.orderBy("vec_id").limit(3).collect()
    again = embeddings_table(spark, 2000, dim=16, n_clusters=10).orderBy(
        "vec_id"
    ).limit(3).collect()
    assert [r["embedding"] for r in first] == [r["embedding"] for r in again]
    assert all(len(r["embedding"]) == 16 for r in first)

    # locality: >90% of queries' top-1 neighbors share the query's label
    queries = emb.filter(F.col("vec_id") < 30)
    top1 = cosine_topk(queries, emb, k=1)
    labels = emb.select("vec_id", "label")
    joined = (
        top1.join(labels.withColumnRenamed("vec_id", "query_id"), "query_id")
        .withColumnRenamed("label", "q_label")
        .join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
    )
    rows = joined.collect()
    same = sum(1 for r in rows if r["q_label"] == r["label"])
    assert same / len(rows) > 0.9


def test_ivf_append_versioned_lifecycle(spark, sf_small, tmp_path):
    """Index maintenance loop (VERDICT r10): build -> snapshot v0 ->
    append a batch assigned to the FROZEN centroids -> snapshot v1 ->
    probe from the latest snapshot.  The appended index must serve
    exactly what a from-scratch assignment of the grown corpus against
    the same centroids serves, history must show both snapshots, and
    vacuum must retire v0 without touching the head."""
    from columnar_analytics_engine_spark import versioned
    from columnar_analytics_engine_spark.operators.similarity import (
        _assign_to_seeds, ivf_append, ivf_assignments, ivf_probe_topk,
    )
    from columnar_analytics_engine_spark.functions.similarity import with_norms

    emb = read_table(spark, sf_small, "embeddings")
    base = emb.filter(F.col("vec_id") % 8 != 7)
    batch = emb.filter(F.col("vec_id") % 8 == 7)
    tbl = str(tmp_path / "ivf_entries")

    seeds, assigned_base = ivf_assignments(base, n_lists=8)
    assert versioned.write_version(assigned_base, tbl) == 0
    appended = ivf_append(batch, seeds)
    v1 = versioned.read_version(spark, tbl, 0).unionByName(appended)
    assert versioned.write_version(v1, tbl) == 1

    queries = emb.filter(F.col("vec_id") < 5)
    served = sorted(map(tuple, ivf_probe_topk(
        queries, seeds, versioned.read_version(spark, tbl), k=10, n_probe=4
    ).collect()))
    # ground truth: assign the WHOLE grown corpus to the same centroids
    all_n = with_norms(emb, "embedding").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("sq_norm").alias("cn"),
    )
    scratch = sorted(map(tuple, ivf_probe_topk(
        queries, seeds, _assign_to_seeds(all_n, seeds), k=10, n_probe=4
    ).collect()))
    assert served == scratch and len(served) > 0

    hist = {r.version: r for r in versioned.table_history(spark, tbl).collect()}
    assert set(hist) == {0, 1} and hist[1].n_bytes > 0
    assert versioned.vacuum(tbl, keep_last=1) == [0]
    assert versioned.read_version(spark, tbl).count() == emb.count()
