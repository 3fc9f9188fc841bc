"""Golden-value parity tests on the reference's canonical 5-row fixture.

Values from tests/test_execution.cpp (via FIXTURES.md F1): the fixture
`id={1..5}, value={100,200,150,300,250}, category={A,B,A,C,B}` and every
golden expectation the reference asserts over it.
"""

from __future__ import annotations

import pytest

from columnar_analytics_engine_spark.ops import AggFunc, CompareOp, Query


@pytest.fixture(scope="module")
def f1(spark):
    return spark.createDataFrame(
        [
            (1, 100, "A"),
            (2, 200, "B"),
            (3, 150, "A"),
            (4, 300, "C"),
            (5, 250, "B"),
        ],
        "id long, value int, category string",
    )


def test_count_is_5(f1):
    # tests/test_execution.cpp:135-149
    row = Query(f1).set_aggregation(AggFunc.COUNT, "value").execute().first()
    assert row["count"] == 5


def test_sum_is_1000(f1):
    # tests/test_execution.cpp:151-166
    row = Query(f1).set_aggregation(AggFunc.SUM, "value").execute().first()
    assert row["sum"] == 1000
    assert row["min"] == 100 and row["max"] == 300  # AggResult carries all four


def test_filter_gt_150_count_3(f1):
    # tests/test_execution.cpp:93-114, 168-183
    q = Query(f1).add_filter("value", CompareOp.GT, 150).set_aggregation(AggFunc.COUNT, "value")
    assert q.execute().first()["count"] == 3


def test_group_by_count(f1):
    # tests/test_execution.cpp:185-211 — {A:2, B:2, C:1}, key-sorted
    rows = Query(f1).set_group_by("category").execute().collect()
    assert [(r["category"], r["count"]) for r in rows] == [("A", 2), ("B", 2), ("C", 1)]


def test_group_by_sum(f1):
    # tests/test_execution.cpp:213-237 — {A:250, B:450, C:300}
    rows = (
        Query(f1)
        .set_group_by("category")
        .set_aggregation(AggFunc.SUM, "value")
        .execute()
        .collect()
    )
    assert [(r["category"], r["sum"]) for r in rows] == [("A", 250), ("B", 450), ("C", 300)]


def test_empty_projection_is_all_columns(f1):
    # src/execution.cpp:252-259 (§2.12-5)
    assert Query(f1).set_projection([]).execute().columns == ["id", "value", "category"]


def test_projection_subset(f1):
    df = Query(f1).set_projection(["id", "category"]).execute()
    assert df.columns == ["id", "category"]
    assert df.count() == 5


def test_all_six_compare_ops(f1):
    # predicate truth table, tests/test_execution.cpp:42-50
    cases = [
        (CompareOp.EQ, 150, 1),
        (CompareOp.NE, 150, 4),
        (CompareOp.LT, 200, 2),
        (CompareOp.LE, 200, 3),
        (CompareOp.GT, 200, 2),
        (CompareOp.GE, 200, 3),
    ]
    for op, val, expected in cases:
        got = Query(f1).add_filter("value", op, val).execute().count()
        assert got == expected, f"{op} {val}: {got} != {expected}"


def test_conjunctive_filters(f1):
    # AND semantics, src/execution.cpp:163-188
    q = (
        Query(f1)
        .add_filter("value", CompareOp.GT, 100)
        .add_filter("value", CompareOp.LT, 300)
        .add_filter("category", CompareOp.NE, "B")
    )
    rows = q.execute().collect()
    assert [r["id"] for r in rows] == [3]


def test_string_filter_works(f1):
    # superset of reference (§2.12-4: reference silently ignores string filters)
    assert Query(f1).add_filter("category", CompareOp.EQ, "A").execute().count() == 2


def test_missing_column_raises(f1, spark):
    # reference throws "Column not found" (src/format.cpp:23)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        Query(f1).set_projection(["nope"]).execute().collect()


def test_decimal_accumulator_matches_scaled_long(spark, sf_small):
    """The ≥SF60 accumulator switch (_util module doc): DECIMAL(38,d)
    summation must reproduce the scaled-BIGINT path bit-for-bit (while
    the latter is in-range) AND match DuckDB's decimal sum — so swapping
    accumulators at 100 TB changes nothing but the overflow ceiling."""
    import duckdb

    from columnar_analytics_engine_spark.queries._util import (
        exact_sum,
        exact_sum_decimal,
        sql_exact_sum_decimal,
        t,
    )

    li = t(spark, sf_small, "lineitem")
    long_path = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag")
        .agg(exact_sum("l_extendedprice", "s", scale=100))
        .collect()
    }
    dec_path = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag")
        .agg(exact_sum_decimal("l_extendedprice", "s", decimals=2))
        .collect()
    }
    assert long_path == dec_path
    oracle = dict(
        duckdb.sql(
            f"""SELECT l_returnflag, {sql_exact_sum_decimal('l_extendedprice', 's', 2)}
                FROM read_parquet('{sf_small}/lineitem.parquet') GROUP BY 1"""
        ).fetchall()
    )
    assert dec_path == oracle
