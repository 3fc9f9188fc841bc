"""Composed pipeline pass invariants (oracle equality is covered by
tests/test_oracle.py; these assert the semantic contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.queries.pipeline import (
    embedding_quantize,
    pipeline_clean_corpus,
    text_tfidf_top_terms,
)


def test_clean_corpus_survivors_are_unique_and_high_quality(spark, sf_small):
    out = pipeline_clean_corpus(spark, sf_small).cache()
    assert out.count() == out.select("doc_id").distinct().count()
    assert out.filter(F.col("quality") == "poor").count() == 0
    # pipeline must actually drop something on this dup-heavy corpus
    total = spark.read.parquet(f"{sf_small}/documents.parquet").count()
    assert out.count() < total
    out.unpersist()


def test_tfidf_ranks_are_dense_per_doc(spark, sf_small):
    out = text_tfidf_top_terms(spark, sf_small)
    ranks = (
        out.groupBy("doc_id")
        .agg(F.collect_set("term_rank").alias("rs"), F.count("*").alias("n"))
        .collect()
    )
    for r in ranks:
        assert sorted(r["rs"]) == list(range(1, r["n"] + 1))
        assert r["n"] <= 3


def test_quantize_roundtrip_error_bounded(spark, sf_small):
    out = embedding_quantize(spark, sf_small)
    # |dequantized - original| <= scale/2 by construction
    orig = (
        spark.read.parquet(f"{sf_small}/embeddings.parquet")
        .select("vec_id", F.posexplode("embedding").alias("dim", "val"))
        .select("vec_id", F.col("dim").cast("long").alias("dim"), F.col("val").cast("double").alias("val"))
    )
    joined = out.join(orig, ["vec_id", "dim"])
    bad = joined.filter(
        F.abs(F.col("q") * F.col("scale") - F.col("val")) > F.col("scale") / 2 + 1e-12
    ).count()
    assert bad == 0
    assert out.agg(F.max(F.abs("q"))).first()[0] <= 127
