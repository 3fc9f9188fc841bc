"""Semantic pins for the statistics operators added in round 6:
KS test boundary values, trimmed-mean outlier robustness, Welch t-test
sign/zero behavior, and snapshot-diff classification accounting."""

from __future__ import annotations

import datetime


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{path}/events.parquet")


_BASE = datetime.datetime(2024, 1, 1)


def test_ks_disjoint_distributions_give_d_one(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.advanced import stats_ks_test

    rows = [(i, _BASE, i, "click", float(i % 10), "{}") for i in range(50)] + [
        (100 + i, _BASE, i, "purchase", 1000.0 + i, "{}") for i in range(40)
    ]
    _write_events(spark, tmp_path, rows)
    r = stats_ks_test(spark, str(tmp_path)).collect()[0]
    assert r["ks_d"] == 1.0  # completely separated supports
    assert r["n_click"] == 50 and r["n_purchase"] == 40


def test_ks_identical_distributions_give_d_zero(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.advanced import stats_ks_test

    rows = [(i, _BASE, i, "click", float(i % 7), "{}") for i in range(70)] + [
        (100 + i, _BASE, i, "purchase", float(i % 7), "{}") for i in range(70)
    ]
    _write_events(spark, tmp_path, rows)
    r = stats_ks_test(spark, str(tmp_path)).collect()[0]
    assert r["ks_d"] == 0.0  # same empirical CDF at every sample point


def test_trimmed_mean_ignores_planted_outlier(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.advanced import stats_trimmed_mean

    rows = [(i, _BASE, i, "click", 10.0, "{}") for i in range(19)] + [
        (99, _BASE, 99, "click", 1_000_000.0, "{}")
    ]
    _write_events(spark, tmp_path, rows)
    out = {r.event_type: r.asDict() for r in stats_trimmed_mean(spark, str(tmp_path)).collect()}
    # n=20 -> k=1: the outlier and one 10.0 are dropped; survivors all 10.0
    assert out["click"]["n_kept"] == 18
    assert out["click"]["trimmed_mean"] == 10.0


def test_welch_t_zero_for_identical_samples_and_sign(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.advanced import stats_welch_ttest

    rows = [(i, _BASE, i, "click", float(i % 5) + 1, "{}") for i in range(40)] + [
        (100 + i, _BASE, i, "purchase", float(i % 5) + 1, "{}") for i in range(40)
    ]
    _write_events(spark, tmp_path, rows)
    r = stats_welch_ttest(spark, str(tmp_path)).collect()[0]
    assert r["t_stat"] == 0.0

    rows2 = [(i, _BASE, i, "click", 100.0 + (i % 3), "{}") for i in range(30)] + [
        (100 + i, _BASE, i, "purchase", 1.0 + (i % 3), "{}") for i in range(30)
    ]
    _write_events(spark, str(tmp_path) + "_b", rows2)
    r2 = stats_welch_ttest(spark, str(tmp_path) + "_b").collect()[0]
    assert r2["t_stat"] > 0  # click mean >> purchase mean
    assert r2["welch_dof"] > 0


def test_snapshot_diff_classification_counts(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.advanced import snapshot_table_diff

    n = 1000
    spark.createDataFrame(
        [(k, 100.0) for k in range(1, n + 1)],
        "o_orderkey long, o_totalprice double",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    out = snapshot_table_diff(spark, str(tmp_path)).collect()
    got = {}
    for r in out:
        got.setdefault(r["change_type"], set()).add(r["o_orderkey"])
    keys = range(1, n + 1)
    assert got["added"] == {k for k in keys if k % 11 == 0 and k % 13 != 0}
    assert got["removed"] == {k for k in keys if k % 13 == 0 and k % 11 != 0}
    assert got["changed"] == {
        k for k in keys if k % 7 == 0 and k % 11 != 0 and k % 13 != 0
    }
    changed_rows = [r for r in out if r["change_type"] == "changed"]
    assert all(r["new_totalprice"] == r["old_totalprice"] + 1.0 for r in changed_rows)
    added_rows = [r for r in out if r["change_type"] == "added"]
    assert all(r["old_totalprice"] is None for r in added_rows)


def test_mann_whitney_u_invariant_and_hand_example(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.advanced import stats_mann_whitney_u

    # hand example with ties: click {1,2,2}, purchase {2,3}
    # pooled ranks: 1->1; 2,2,2 -> avg 3; 3 -> 5
    # R_click = 1 + 3 + 3 = 7; U_click = 7 - 3*4/2 = 1.0
    rows = [
        (1, _BASE, 1, "click", 1.0, "{}"),
        (2, _BASE, 1, "click", 2.0, "{}"),
        (3, _BASE, 1, "click", 2.0, "{}"),
        (4, _BASE, 1, "purchase", 2.0, "{}"),
        (5, _BASE, 1, "purchase", 3.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    r = stats_mann_whitney_u(spark, str(tmp_path)).collect()[0]
    assert r["u_click"] == 1.0
    assert r["u_purchase"] == 5.0
    assert r["u_click"] + r["u_purchase"] == r["n_click"] * r["n_purchase"]
