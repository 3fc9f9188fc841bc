"""Semantic tests for queries/curation.py (the oracle sweep in
test_oracle.py covers cross-engine hashing; these check the semantics
are the intended ones, including on PII-laden fixtures the synthetic
corpus can't exercise)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.queries.curation import (
    _JOURNEY_CAP,
    _PASSAGE_W,
    dedup_duplicate_passages,
    events_user_journey,
    scrub_pii,
    sql_pii_scrub,
    training_mixture_weights,
)


# ---------------------------------------------------------------------------
# duplicated passages
# ---------------------------------------------------------------------------

def test_duplicate_passages_flags_shared_span(spark, tmp_path):
    # docs 1 and 2 share one exact 8-token span; doc 3 shares nothing
    span = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"{span} unique1 tail1"),
            (2, f"prefix2 {span} tail2"),
            (3, "q r s t u v w x y z"),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r.asDict() for r in dedup_duplicate_passages(spark, sf).collect()}
    # doc 1: tokens = 8 span + 2 = 10 → 3 spans, 1 duplicated
    assert out[1]["n_spans"] == 3 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0 and not out[3]["is_near_copy"]


def test_duplicate_passages_ignores_within_doc_repeats(spark, tmp_path):
    # one doc repeating its own span is NOT a cross-doc duplicate
    span = " ".join(f"t{i}" for i in range(_PASSAGE_W))
    docs = spark.createDataFrame(
        [(1, f"{span} {span}")], "doc_id long, text string"
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    row = dedup_duplicate_passages(spark, sf).collect()[0]
    assert row["n_dup_spans"] == 0


# ---------------------------------------------------------------------------
# mixture weights
# ---------------------------------------------------------------------------

def test_mixture_weights_balance(spark, sf_small):
    rows = training_mixture_weights(spark, sf_small).collect()
    total = sum(r["n_tokens"] for r in rows)
    n_src = len(rows)
    for r in rows:
        assert r["natural_share"] == pytest.approx(r["n_tokens"] / total)
        assert r["weight"] == pytest.approx(total / (n_src * r["n_tokens"]))
        assert r["sampling_rate"] <= 1.0
        assert r["needs_upsampling"] == (r["weight"] > 1.0)
    # shares sum to 1
    assert sum(r["natural_share"] for r in rows) == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# PII scrub — real PII fixtures, Spark vs DuckDB on identical input
# ---------------------------------------------------------------------------

_PII_DOCS = [
    (1, "contact me at alice.smith+x@example.co.uk or bob@test.org today"),
    (2, "server at 192.168.1.254 port 8080, backup 10.0.0.1"),
    (3, "call +14155550123 or 415-555-0199 now"),
    (4, "see https://example.com/a?b=c#frag and http://x.io"),
    (5, "mixed: eve@corp.io at 8.8.8.8 via https://cdn.net/pix.png +4915112345678"),
    (6, "clean text with no sensitive content at all"),
]


def test_pii_scrub_detects_and_redacts(spark):
    df = spark.createDataFrame(_PII_DOCS, "doc_id long, text string")
    clean, counts = scrub_pii(F.col("text"))
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in counts.items()],
            clean.alias("clean_text"),
        ).collect()
    }
    assert out[1]["n_emails"] == 2 and "<EMAIL>" in out[1]["clean_text"]
    assert "alice" not in out[1]["clean_text"]
    assert out[2]["n_ipv4"] == 2 and out[2]["clean_text"].count("<IP>") == 2
    assert out[3]["n_phones"] == 2 and out[3]["clean_text"].count("<PHONE>") == 2
    assert out[4]["n_urls"] == 2 and out[4]["clean_text"].count("<URL>") == 2
    assert out[5]["n_emails"] == 1 and out[5]["n_ipv4"] == 1
    assert out[6]["clean_text"] == _PII_DOCS[5][1]  # untouched


def test_pii_scrub_matches_duckdb_on_pii_fixture(spark, tmp_path):
    """The oracle check at sf0.01 sees zero PII; this runs the same two
    expressions (Spark query vs DuckDB twin) on PII-laden rows."""
    df = spark.createDataFrame(_PII_DOCS, "doc_id long, text string")
    path = f"{tmp_path}/documents.parquet"
    df.write.parquet(path)

    from columnar_analytics_engine_spark.queries.curation import text_pii_scrub

    spark_rows = [
        tuple(r) for r in text_pii_scrub(spark, str(tmp_path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    duck_rows = [tuple(r) for r in con.execute(sql_pii_scrub()).fetchall()]
    con.close()
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# user journeys
# ---------------------------------------------------------------------------

def test_user_journey_caps_and_orders(spark, sf_small):
    rows = events_user_journey(spark, sf_small).collect()
    assert rows, "no users"
    for r in rows:
        assert r["n_steps"] <= _JOURNEY_CAP
        assert r["n_steps"] == min(r["n_events"], _JOURNEY_CAP)
        assert len(r["journey"].split(">")) == r["n_steps"]
    # user ordering is deterministic
    ids = [r["user_id"] for r in rows]
    assert ids == sorted(ids)


def test_user_journey_sequence_is_time_ordered(spark, tmp_path):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:02", 7, "click", 1.0, "{}"),
            (2, "2024-01-01 10:00:01", 7, "view", 1.0, "{}"),
            (3, "2024-01-01 10:00:03", 7, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    sf = str(tmp_path)
    events.write.parquet(f"{sf}/events.parquet")
    row = events_user_journey(spark, sf).collect()[0]
    assert row["journey"] == "view>click>purchase"


# ---------------------------------------------------------------------------
# attrition funnel + incremental dedup
# ---------------------------------------------------------------------------

def test_attrition_report_is_consistent_with_clean_corpus(spark, sf_small):
    from columnar_analytics_engine_spark.queries.curation import (
        pipeline_attrition_report,
    )
    from columnar_analytics_engine_spark.queries.pipeline import pipeline_clean_corpus

    rows = pipeline_attrition_report(spark, sf_small).collect()
    assert [r["stage"] for r in rows] == [
        "input", "exact_dedup", "near_dup", "quality_gate",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # monotone shrink
    for prev, r in zip(counts, rows[1:]):
        assert r["n_dropped"] == prev - r["n_docs"]
        assert r["drop_frac"] == pytest.approx(r["n_dropped"] / prev)
    # final stage equals the cleaning pass's survivor count
    assert counts[3] == pipeline_clean_corpus(spark, sf_small).count()


def test_dedup_incremental_classification(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.curation import dedup_incremental

    # doc_id % 5 == 0 → incoming. 0 dups history(2); 5 dups batch doc 0
    # (same text); 10 is new; 15 dups history (17).
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (2, "ALPHA  beta   gamma"),   # history twin of 0 (fingerprint)
            (5, "alpha beta gamma"),      # batch dup of 0 AND history dup
            (10, "unique new content"),
            (15, "delta epsilon"),
            (17, "delta  epsilon"),       # history twin of 15
            (3, "history only text"),
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r.asDict() for r in dedup_incremental(spark, sf).collect()}
    assert set(out) == {0, 5, 10, 15}  # every incoming doc classified
    assert out[0]["status"] == "dup_of_history" and out[0]["matched_id"] == 2
    # history precedence beats batch dup
    assert out[5]["status"] == "dup_of_history" and out[5]["matched_id"] == 2
    assert out[10]["status"] == "new" and out[10]["matched_id"] is None
    assert out[15]["status"] == "dup_of_history" and out[15]["matched_id"] == 17


def test_dedup_incremental_batch_dup_without_history(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.curation import dedup_incremental

    docs = spark.createDataFrame(
        [
            (0, "same text"),
            (5, "same text"),      # batch dup of 0, no history twin
            (10, "other text"),
            (1, "history filler"),
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r.asDict() for r in dedup_incremental(spark, sf).collect()}
    assert out[0]["status"] == "new"
    assert out[5]["status"] == "dup_in_batch" and out[5]["matched_id"] == 0
    assert out[10]["status"] == "new"


def test_bpe_token_count_known_values(spark):
    from columnar_analytics_engine_spark.functions.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [("Hello world, it's 2026!",), ("a1b2",), ("",)], "text string"
    )
    got = [r["n"] for r in df.select(bpe_ish_token_count(F.col("text")).alias("n")).collect()]
    # [Hello][ world][,][ it]['s][ 2026][!] / [a][1][b][2] / []
    assert got == [7, 4, 0]


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def test_cdc_chunks_shift_robust(spark):
    """Inserting tokens BEFORE a shared passage must not change the
    chunks the passage produces — the property fixed-window passage
    dedup lacks and the reason CDC exists."""
    from columnar_analytics_engine_spark.operators.cdc import cdc_chunks

    base = " ".join(f"tok{i}" for i in range(120))
    shifted = "prefix0 prefix1 prefix2 " + base
    docs = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    chunks = cdc_chunks(docs, boundary_bits=3).collect()
    by_doc = {1: set(), 2: set()}
    for r in chunks:
        by_doc[r["doc_id"]].add(r["chunk_hash"])
    common = by_doc[1] & by_doc[2]
    # every chunk of doc 1 except (possibly) the first — whose content
    # is fused with doc 2's prefix until the first boundary — reappears
    # identically in doc 2 despite the 3-token shift
    assert len(common) >= len(by_doc[1]) - 1
    assert len(common) > 0


def test_cdc_chunks_cover_document_exactly(spark):
    from columnar_analytics_engine_spark.operators.cdc import cdc_chunks

    text = " ".join(f"w{i}" for i in range(57))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(cdc_chunks(docs, boundary_bits=2).collect(), key=lambda r: r["chunk_id"])
    # chunks tile the token stream: consecutive ids, positions abut, sizes sum
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    assert rows[0]["start_pos"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_pos"] == prev["start_pos"] + prev["n_tokens"]
    assert sum(r["n_tokens"] for r in rows) == 57


def test_cdc_empty_and_single_token_docs(spark):
    from columnar_analytics_engine_spark.operators.cdc import shared_chunks

    docs = spark.createDataFrame(
        [(1, ""), (2, "lone"), (3, "lone")], "doc_id long, text string"
    )
    out = shared_chunks(docs, boundary_bits=4).collect()
    # the two "lone" docs share their single chunk; the empty doc yields none
    assert len(out) == 1
    assert out[0]["n_docs"] == 2


def test_corpus_drift_kl_properties(spark, sf_small):
    """KL(P||Q) >= 0; identical halves give ~0; and a synthetic corpus
    with a genuine vocabulary shift scores clearly higher than the
    homogeneous test corpus."""
    import os
    import tempfile

    from columnar_analytics_engine_spark.queries.curation import corpus_drift_report

    base = corpus_drift_report(spark, sf_small).first()
    assert base["kl_p_q"] >= 0.0
    assert base["tokens_first_half"] > 0 and base["tokens_second_half"] > 0

    rows = [(i, "alpha beta gamma delta") for i in range(50)] + [
        (i, "omega psi chi phi") for i in range(50, 100)
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    shifted = corpus_drift_report(spark, d).first()
    assert shifted["kl_p_q"] > base["kl_p_q"] * 10

    same = [(i, "alpha beta gamma") for i in range(100)]
    spark.createDataFrame(same, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    flat = corpus_drift_report(spark, d).first()
    assert abs(flat["kl_p_q"]) < 1e-4


def test_user_growth_is_monotone_and_totals(spark, sf_small):
    from pyspark.sql import functions as F

    from columnar_analytics_engine_spark.queries.events import events_user_growth
    from columnar_analytics_engine_spark.queries._util import t as t_

    rows = events_user_growth(spark, sf_small).collect()
    assert rows
    cumulative = [r["cumulative_users"] for r in rows]
    assert cumulative == sorted(cumulative)
    assert sum(r["new_users"] for r in rows) == cumulative[-1]
    total_users = (
        t_(spark, sf_small, "events").select("user_id").distinct().count()
    )
    assert cumulative[-1] == total_users


def test_drift_by_source_flags_planted_outlier(spark, tmp_path):
    """A source emitting a disjoint vocabulary must rank first by a
    wide margin."""
    import os

    from columnar_analytics_engine_spark.queries.curation import (
        corpus_drift_by_source,
    )

    rows = (
        [(i, "common words shared by everyone", "normal_a") for i in range(30)]
        + [(50 + i, "common words shared by everyone", "normal_b") for i in range(30)]
        + [
            (100 + i, "weird outlier vocabulary entirely different", "odd")
            for i in range(10)
        ]
    )
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(
        os.path.join(d, "documents.parquet")
    )
    out = corpus_drift_by_source(spark, d).collect()
    assert out[0]["source"] == "odd"
    assert out[0]["kl_vs_rest"] > 5 * out[1]["kl_vs_rest"]


def test_rfm_scores_partition_customers_evenly(spark, sf_small):
    """Quintile cutoffs put roughly a fifth of customers in each score
    band, and the composite encodes the three digits."""
    from columnar_analytics_engine_spark.queries.advanced import (
        customers_rfm_segments,
    )

    rows = customers_rfm_segments(spark, sf_small).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            assert 1 <= r[col] <= 5
            counts[r[col]] = counts.get(r[col], 0) + 1
        # each band within [5%, 45%] — ties on discrete metrics skew bands
        for c in counts.values():
            assert 0.05 * n <= c <= 0.45 * n, (col, counts)
    for r in rows:
        assert r["rfm"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]


def test_backlog_peaks_then_drains(spark, sf_small):
    """The backlog rises from the first month, is positive throughout
    the order window, and the last month's backlog equals the orders
    still open at the end (none, since every order closes)."""
    from columnar_analytics_engine_spark.queries.advanced import (
        orders_backlog_over_time,
    )

    rows = orders_backlog_over_time(spark, sf_small).collect()
    assert rows
    vals = [r["open_orders"] for r in rows]
    assert all(v > 0 for v in vals)
    assert max(vals) >= vals[0]


def test_passage_removal_keeps_one_copy(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.curation import dedup_passage_removal

    span = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"{span} unique1 tail1"),   # lowest carrier: keeps the span
            (2, f"prefix2 {span} tail2"),   # loses the span
            (3, "q r s t u v w"),           # 7 tokens: too short, passthrough
            (4, None),                      # null text: passthrough, empty
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r.asDict() for r in dedup_passage_removal(spark, sf).collect()}
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == f"{span} unique1 tail1"
    assert out[2]["n_removed"] == 8
    assert out[2]["clean_text"] == "prefix2 tail2"
    assert out[3]["n_removed"] == 0 and out[3]["clean_text"] == "q r s t u v w"
    assert out[4]["n_tokens"] == 0 and out[4]["clean_text"] == ""


def test_passage_removal_overlapping_spans_union_coverage(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.curation import dedup_passage_removal

    # doc 2 contains a 9-token run shared with doc 1 => two overlapping
    # removable spans whose coverage must union to 9 tokens, not 16
    run = "a b c d e f g h i"
    docs = spark.createDataFrame(
        [(1, f"{run} x1 y1"), (2, f"z2 {run} w2")],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r.asDict() for r in dedup_passage_removal(spark, sf).collect()}
    assert out[2]["n_removed"] == 9
    assert out[2]["clean_text"] == "z2 w2"


def test_mixture_temperature_upweights_small_sources(spark, sf_small):
    from columnar_analytics_engine_spark.queries.curation import (
        training_mixture_temperature,
    )

    rows = training_mixture_temperature(spark, sf_small).collect()
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-9
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    # alpha < 1 compresses shares toward uniform: small sources upweight
    assert smallest.weight > 1.0 and smallest.needs_upsampling
    assert largest.weight < 1.0 and not largest.needs_upsampling
    # temperature keeps the ORDER of shares (unlike uniform flattening)
    by_nat = sorted(rows, key=lambda r: r.natural_share)
    by_temp = sorted(rows, key=lambda r: r.temp_share)
    assert [r.source for r in by_nat] == [r.source for r in by_temp]


_URL_DOCS = [
    (1, "see https://Example.COM/page and http://www.example.com/other plus https://sub.Site.org/x"),
    (2, "mailto is not a url; ftp://nope.com either; but https://user:pw@Example.com/ counts"),
    (3, "bare text without links"),
    (4, "dup https://example.com https://example.com and https://other.net/"),
    (5, None),
]


def test_url_domains_matches_duckdb_on_url_fixture(spark, tmp_path):
    """The sf fixtures carry no URLs; pin the regex + aggregation
    semantics against DuckDB on URL-laden rows (PII-scrub precedent)."""
    import duckdb

    from columnar_analytics_engine_spark.queries.curation import (
        sql_url_domains,
        text_url_domains,
    )

    df = spark.createDataFrame(_URL_DOCS, "doc_id long, text string")
    path = f"{tmp_path}/documents.parquet"
    df.write.parquet(path)

    spark_rows = [tuple(r) for r in text_url_domains(spark, str(tmp_path)).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    duck_rows = [tuple(r) for r in con.execute(sql_url_domains()).fetchall()]
    con.close()
    assert spark_rows == duck_rows
    out = dict((d, (nd, nu)) for d, nd, nu in spark_rows)
    # case-folded + www-stripped: doc1 hits example.com twice (COM/www),
    # doc2 once through credentials, doc4 twice
    assert out["example.com"] == (3, 5)
    assert out["sub.site.org"] == (1, 1)
    assert "nope.com" not in out  # ftp is not harvested


def test_moments_constant_group_yields_null_shape_moments(spark, tmp_path):
    """A constant-valued group has zero variance: skewness/kurtosis are
    NULL (undefined), never a 0/0 NaN that engines render differently."""
    import datetime

    from columnar_analytics_engine_spark.queries.advanced import (
        stats_moments_extended,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base, i, "flat", 7.0, "{}") for i in range(10)] + [
        (100 + i, base, i, "vary", float(i), "{}") for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = {r.event_type: r.asDict() for r in stats_moments_extended(spark, str(tmp_path)).collect()}
    assert out["flat"]["var_pop"] == 0.0
    assert out["flat"]["skewness"] is None and out["flat"]["kurtosis"] is None
    assert out["flat"]["mode_value"] == 7.0
    assert out["vary"]["var_pop"] > 0 and out["vary"]["kurtosis"] is not None
