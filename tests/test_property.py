"""Property-based tests (hypothesis): the Query builder must agree with
DuckDB on arbitrary small tables — not just the curated fixtures.

Strategy: generate random (id, value, category) rows with nulls, unicode
categories, and extreme ints; run random filter/agg/group-by configs
through both engines on the exact same data; compare.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_analytics_engine_spark.ops import AggFunc, CompareOp, Query

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.one_of(st.none(), st.integers(min_value=-(10**6), max_value=10**6)),
        st.one_of(st.none(), st.sampled_from(["a", "b", "κ", "日本", "", "z z"])),
    ),
    min_size=0,
    max_size=25,
)

OPS = st.sampled_from(list(CompareOp))
THRESHOLDS = st.integers(min_value=-(10**6) - 5, max_value=10**6 + 5)

_SQL_OP = {
    CompareOp.EQ: "=",
    CompareOp.NE: "!=",
    CompareOp.LT: "<",
    CompareOp.LE: "<=",
    CompareOp.GT: ">",
    CompareOp.GE: ">=",
}

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _mk(spark, rows):
    pdf = pd.DataFrame(rows, columns=["id", "value", "category"]).astype(
        {"id": "int64", "value": "Int64", "category": "object"}
    )
    sdf = spark.createDataFrame(
        [(int(i), None if pd.isna(v) else int(v), c) for i, v, c in rows],
        "id long, value long, category string",
    )
    con = duckdb.connect()
    con.register("tbl", pdf)
    return sdf, con


@given(rows=ROWS, op=OPS, threshold=THRESHOLDS)
@SETTINGS
def test_filter_matches_duckdb(spark, rows, op, threshold):
    sdf, con = _mk(spark, rows)
    got = sorted(
        r["id"]
        for r in Query(sdf).add_filter("value", op, threshold).execute().collect()
    )
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT id FROM tbl WHERE value {_SQL_OP[op]} {threshold}"
        ).fetchall()
    )
    assert got == want


@given(rows=ROWS)
@SETTINGS
def test_global_agg_matches_duckdb(spark, rows):
    sdf, con = _mk(spark, rows)
    got = Query(sdf).set_aggregation(AggFunc.SUM, "value").execute().first()
    want = con.execute(
        "SELECT COUNT(*), CAST(SUM(value) AS BIGINT), MIN(value), MAX(value) FROM tbl"
    ).fetchone()
    assert got["count"] == want[0]
    assert got["sum"] == want[1]
    assert got["min"] == want[2]
    assert got["max"] == want[3]


@given(rows=ROWS)
@SETTINGS
def test_group_by_matches_duckdb(spark, rows):
    sdf, con = _mk(spark, rows)
    got = {
        (r["category"], r["count"])
        for r in Query(sdf).set_group_by("category").execute().collect()
    }
    want = set(
        con.execute("SELECT category, COUNT(*) FROM tbl GROUP BY category").fetchall()
    )
    assert got == want
