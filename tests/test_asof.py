"""As-of join semantics on a constructed fixture."""

from __future__ import annotations

import datetime as dt

import pytest

from columnar_analytics_engine_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "l10"), (1, _ts(20), "l20"), (1, _ts(5), "l5"), (2, _ts(10), "l2_10")],
        "key long, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), "r8"), (1, _ts(20), "r20"), (1, _ts(15), "r15"), (3, _ts(1), "r_other")],
        "key long, ts timestamp, rval string",
    )
    return left, right


def test_asof_matches_most_recent_at_or_before(frames):
    left, right = frames
    out = {(r["key"], r["lval"]): r["r_rval"] for r in asof_join(left, right, on="key").collect()}
    assert out[(1, "l10")] == "r8"    # 8 <= 10 < 15
    assert out[(1, "l20")] == "r20"   # inclusive: equal ts matches
    assert out[(1, "l5")] is None     # nothing at or before 5
    assert out[(2, "l2_10")] is None  # no right rows for key 2


def test_asof_preserves_all_left_rows(frames):
    left, right = frames
    assert asof_join(left, right, on="key").count() == left.count()


def test_asof_tie_break_takes_max(spark):
    left = spark.createDataFrame([(1, _ts(10), "l")], "key long, ts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, _ts(10), 1, "low"), (1, _ts(10), 9, "high")],
        "key long, ts timestamp, event_id long, rval string",
    )
    out = asof_join(left, right, on="key", tie_col="event_id").collect()
    assert out[0]["r_rval"] == "high"
