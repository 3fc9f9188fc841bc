"""Semantic invariants for the retrieval / LM-quality / analytics ops.

The oracle sweep (test_oracle.py) proves cross-engine equality; these
tests pin the *meaning*: BM25 ranks term-bearing docs first, the
unigram LM scores rare-token docs lower, the HLL sketches estimate
within the algorithm's error bound and merge associatively, and the
EWMA equals a direct per-row recomputation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.queries.retrieval import (
    BM25_TERMS,
    _EWMA_WEIGHTS,
    events_ewma_value,
    retrieval_bm25_topk,
    sketch_distinct_users,
    text_inverted_index,
    text_unigram_lm_quality,
)
from columnar_analytics_engine_spark.queries._util import t


def test_bm25_hits_contain_query_terms(spark, sf_small):
    """Every returned doc must actually contain >= n_query_terms_hit of
    the fixed query terms, and scores must be positive and sorted."""
    rows = retrieval_bm25_topk(spark, sf_small).collect()
    assert rows, "top-k must be non-empty on the fixture corpus"
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.bm25 > 0 for r in rows)
    docs = {
        r.doc_id: set(r.text.split())
        for r in t(spark, sf_small, "documents").collect()
    }
    for r in rows:
        n_present = sum(1 for term in BM25_TERMS if term in docs[r.doc_id])
        assert n_present == r.n_query_terms_hit


def test_inverted_index_postings_sorted_and_df_consistent(spark, sf_small):
    rows = text_inverted_index(spark, sf_small).collect()
    assert rows
    for r in rows[:50]:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == len(set(ids)) == r.df


def test_unigram_lm_prob_bounds_and_rarity(spark, sf_small):
    """Probabilities are in (0, 1]; a doc made of the corpus's rarest
    tokens cannot outscore one made of its commonest token."""
    pdf = text_unigram_lm_quality(spark, sf_small).toPandas()
    assert ((pdf.mean_tok_prob > 0) & (pdf.mean_tok_prob <= 1)).all()
    assert (pdf.min_tok_count >= 1).all()
    # monotonicity: corpus_hits/n_tokens ordering matches score ordering
    # for equal n_tokens (same denominator)
    by_n = pdf.groupby("n_tokens")
    for _, grp in list(by_n)[:5]:
        g = grp.sort_values("corpus_hits")
        assert g.mean_tok_prob.is_monotonic_increasing


def test_ewma_matches_direct_recomputation(spark, sf_small):
    """Replay the weighted sum in plain Python for a few users."""
    out = {
        (r.user_id, r.event_id): r.ewma_value
        for r in events_ewma_value(spark, sf_small).collect()
    }
    assert out, "fixture users have >= 8 events"
    ev = (
        t(spark, sf_small, "events")
        .select("user_id", "event_id", "ts", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for user, rows in by_user.items():
        cents = [round(r.value * 100) for r in rows]
        for i in range(7, len(rows)):
            expect = sum(
                _EWMA_WEIGHTS[j] * cents[i - j] for j in range(8)
            ) / 100.0
            got = out[(user, rows[i].event_id)]
            assert got == pytest.approx(expect, abs=1e-9)
            checked += 1
        if checked > 200:
            break
    assert checked > 0


def test_hll_sketch_accuracy_and_merge(spark, sf_small):
    """Estimates within HLL's error envelope of exact counts; the
    union row agrees with a direct global sketch (merge associativity
    — the property that makes the sketch shard-safe at 1000 executors)."""
    est = {
        r.event_type: r.est_users
        for r in sketch_distinct_users(spark, sf_small).collect()
    }
    ev = t(spark, sf_small, "events")
    exact_all = ev.select("user_id").distinct().count()
    exact_by = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # lgConfigK=12 default => relative error ~1.04/sqrt(2^12) ~ 1.6%; 5% margin
    for k, exact in exact_by.items():
        assert abs(est[k] - exact) / exact < 0.05
    assert abs(est["ALL"] - exact_all) / exact_all < 0.05
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long").alias("e")
    ).collect()[0].e
    assert est["ALL"] == direct


def test_cms_overestimates_only_and_detects_heavy_hitter(spark, tmp_path):
    """Count-min property: estimates never undercount, and with more
    keys than counters (forced collisions) at least some estimate
    strictly exceeds its exact count."""
    import datetime as dt

    from columnar_analytics_engine_spark.queries.retrieval import (
        _CMS_WIDTH,
        sketch_heavy_hitters,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # one heavy user (id 7, 500 events) + 3*width light users (1 event each)
    for _ in range(500):
        rows.append((eid, t0, 7, "view", 0.0, "{}")); eid += 1
    for u in range(1000, 1000 + 3 * _CMS_WIDTH):
        rows.append((eid, t0, u, "view", 0.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = sketch_heavy_hitters(spark, str(tmp_path)).collect()
    assert all(r["cms_estimate"] >= r["exact_n"] for r in out)
    top = out[0]
    assert top["user_id"] == 7 and top["exact_n"] == 500
    # heavy hitter estimate is within the CMS error bound eps*N (d=4
    # rows make the min tight here) and some light user collides
    assert top["cms_estimate"] < 600
    assert any(r["cms_estimate"] > r["exact_n"] for r in out)


def test_hybrid_rrf_fuses_both_rankings(spark, sf_small):
    """RRF output contains both modalities' top hits, scores equal
    1/(60+rank) summed over the lists a doc appears in, and a doc in
    both lists beats a same-rank single-list doc."""
    from columnar_analytics_engine_spark.queries.retrieval import (
        _RRF_K,
        retrieval_hybrid_rrf,
    )

    rows = retrieval_hybrid_rrf(spark, sf_small).collect()
    assert rows
    assert any(r["lex_rank"] is not None for r in rows)
    assert any(r["sem_rank"] is not None for r in rows)
    for r in rows:
        expect = 0.0
        if r["lex_rank"] is not None:
            expect += 1.0 / (_RRF_K + r["lex_rank"])
        if r["sem_rank"] is not None:
            expect += 1.0 / (_RRF_K + r["sem_rank"])
        assert abs(r["rrf_score"] - expect) < 1e-12
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
