"""Null-semantics tests — the documented superset (SURVEY §7.4-2).

The reference is null-free by construction; this engine follows standard
Spark SQL three-valued logic.  These tests pin the behavior so it's a
contract, not an accident.
"""

from __future__ import annotations

from pyspark.sql import functions as F
import pytest

from columnar_analytics_engine_spark.ops import AggFunc, CompareOp, Query


@pytest.fixture(scope="module")
def with_nulls(spark):
    return spark.createDataFrame(
        [(1, 100, "A"), (2, None, "B"), (3, 150, None), (4, None, None), (5, 250, "A")],
        "id long, value int, category string",
    )


def test_filters_drop_null_comparisons(with_nulls):
    # NULL > 100 is UNKNOWN → row filtered out (not an error, not a match)
    got = Query(with_nulls).add_filter("value", CompareOp.GT, 100).execute()
    assert sorted(r["id"] for r in got.collect()) == [3, 5]
    # NE also drops nulls (three-valued logic)
    got = Query(with_nulls).add_filter("value", CompareOp.NE, 100).execute()
    assert sorted(r["id"] for r in got.collect()) == [3, 5]


def test_aggregates_skip_nulls_count_star_does_not(with_nulls):
    row = Query(with_nulls).set_aggregation(AggFunc.SUM, "value").execute().first()
    assert row["count"] == 5      # count(*) counts rows
    assert row["sum"] == 500      # sum skips nulls
    assert row["min"] == 100 and row["max"] == 250


def test_group_by_keeps_null_key_group(with_nulls):
    rows = Query(with_nulls).set_group_by("category").execute().collect()
    counts = {r["category"]: r["count"] for r in rows}
    assert counts == {"A": 2, "B": 1, None: 2}


def test_join_null_keys_never_match(spark):
    a = spark.createDataFrame([(1, "x"), (None, "y")], "k long, v string")
    b = spark.createDataFrame([(1, "p"), (None, "q")], "k long, w string")
    out = a.join(b, "k").collect()
    assert len(out) == 1 and out[0]["v"] == "x"  # NULL = NULL is not TRUE


def test_null_safe_equality_operator(spark):
    a = spark.createDataFrame([(1,), (None,)], "k long")
    b = spark.createDataFrame([(1,), (None,)], "k long")
    out = a.join(b, a["k"].eqNullSafe(b["k"]))
    assert out.count() == 2  # <=> matches NULL with NULL


@pytest.fixture(scope="module")
def null_text_sf(spark, tmp_path_factory):
    """A documents table containing NULL and empty text/lang/source rows
    alongside normal ones — the dirty-crawl shape every text operator
    must survive."""
    out = str(tmp_path_factory.mktemp("null_text_sf"))
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "s0", 36),
        (1, None, "en", "s0", None),
        (2, "", None, None, 0),
        (3, "alpha beta gamma delta epsilon zeta", "fr", "s1", 36),
        (4, "   ", "en", "s1", 3),
        (5, "solo", "en", "s1", 4),  # exactly one token: bigram/shingle edge
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    return out


_TEXT_QUERIES = [
    "dedup_exact",
    "dedup_containment",
    "text_token_stats",
    "text_language_id",
    "text_token_entropy",
    "text_fingerprint",
    "corpus_drift_report",
    "text_inverted_index",
    "sample_weighted_reservoir",
    "quality_gopher_rules",
    # round-6 second-session text consumers
    "classifier_nb_confusion",
    "dedup_passage_removal",
    "text_url_domains",
    "graph_pagerank_dupgraph",
    "training_shard_checksums",
    "training_mixture_temperature",
    # round-6 third-session: sequence(1, size-1) index-0 guards
    "quality_repetition_filters",
    "dedup_ngram_jaccard",
    "text_collocations_pmi",
    "text_bigram_lm_quality",
    "training_bpe_merges",
]


@pytest.mark.parametrize("name", _TEXT_QUERIES)
def test_text_queries_survive_null_and_empty_text(spark, null_text_sf, name):
    from columnar_analytics_engine_spark.queries import all_queries

    assert all_queries()[name].fn(spark, null_text_sf).count() >= 0
