"""Semantic tests for the timeout-bounded funnel
(queries/advanced.events_funnel_windowed); the oracle sweep covers
cross-engine parity, these pin the windowFunnel semantics."""

from __future__ import annotations

import datetime as dt


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_funnel_window_and_ordering(spark, tmp_path):
    from columnar_analytics_engine_spark.queries.advanced import (
        events_funnel_windowed,
    )

    t0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: full conversion inside the 7-day windows
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + 2 * day, 1, "click", 0.0, "{}"),
        (3, t0 + 5 * day, 1, "purchase", 0.0, "{}"),
        # user 2: click 8 days after first view — outside the window
        (4, t0, 2, "view", 0.0, "{}"),
        (5, t0 + 8 * day, 2, "click", 0.0, "{}"),
        (6, t0 + 9 * day, 2, "purchase", 0.0, "{}"),
        # user 3: click BEFORE any view — must not count
        (7, t0 + 1 * day, 3, "click", 0.0, "{}"),
        (8, t0 + 2 * day, 3, "view", 0.0, "{}"),
        # user 4: converted but purchase measured from FIRST in-window
        # click (day 1), so a purchase at day 9 is outside click+7
        (9, t0, 4, "view", 0.0, "{}"),
        (10, t0 + 1 * day, 4, "click", 0.0, "{}"),
        (11, t0 + 6 * day, 4, "click", 0.0, "{}"),
        (12, t0 + 9 * day, 4, "purchase", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = events_funnel_windowed(spark, sf).collect()[0].asDict()
    assert row == {
        "n_users": 4,
        "n_viewed": 4,
        "n_clicked_in_window": 2,   # users 1 and 4
        "n_purchased_in_window": 1,  # user 1 only
    }


def test_scd2_history_invariants(spark, sf_small):
    """SCD2 contract: per user, regimes tile the timeline (each
    valid_to equals the next valid_from), exactly one open row, and
    consecutive regimes always change type."""
    from columnar_analytics_engine_spark.queries.events import events_scd2_history

    rows = events_scd2_history(spark, sf_small).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r["valid_from_us"])
        assert sum(1 for r in hist if r["is_current"]) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to_us"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], user
            assert a["event_type"] != b["event_type"], user


def test_time_weighted_avg_bounds_and_exactness(spark, sf_small):
    """TWAP lies within [min, max] of the user's values, and a
    hand-checkable two-interval case reproduces the weighted formula."""
    import datetime as dt

    from pyspark.sql import functions as F

    from columnar_analytics_engine_spark.queries.events import (
        events_time_weighted_avg,
    )
    from columnar_analytics_engine_spark.queries._util import t as t_

    rows = events_time_weighted_avg(spark, sf_small).collect()
    assert rows
    bounds = {
        r["user_id"]: (r["mn"], r["mx"])
        for r in t_(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    for r in rows:
        mn, mx = bounds[r["user_id"]]
        assert mn - 1e-9 <= r["twap_value"] <= mx + 1e-9

    base = dt.datetime(2024, 1, 1)
    tiny = spark.createDataFrame(
        [
            (1, base, 7, "view", 10.0, "{}"),
            (2, base + dt.timedelta(seconds=10), 7, "view", 20.0, "{}"),
            (3, base + dt.timedelta(seconds=40), 7, "view", 99.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    tiny.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = events_time_weighted_avg(spark, d).collect()
    assert len(out) == 1
    # (10.0*10s + 20.0*30s) / 40s = 17.5 ; the 99.0 reading has no interval
    assert out[0]["twap_value"] == 17.5
    assert out[0]["total_secs"] == 40 and out[0]["n_intervals"] == 2
