"""MERGE-upsert and SCD2 emulation tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.operators.merge import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "old-a", 10.0), (2, "old-b", 20.0), (3, "old-c", 30.0)],
        "id long, name string, bal double",
    )
    source = spark.createDataFrame(
        [(2, "new-b", 25.0), (4, "new-d", 40.0)], "id long, name string, bal double"
    )
    out = {r["id"]: (r["name"], r["bal"]) for r in merge_upsert(target, source, "id").collect()}
    assert out == {
        1: ("old-a", 10.0),
        2: ("new-b", 25.0),   # updated
        3: ("old-c", 30.0),
        4: ("new-d", 40.0),   # inserted
    }


def test_scd2_keeps_history(spark):
    import datetime as dt

    hist = spark.createDataFrame(
        [(1, "v1", dt.datetime(2024, 1, 1), True)],
        "id long, val string, updated_at timestamp, is_current boolean",
    )
    src = spark.createDataFrame(
        [(1, "v2", dt.datetime(2024, 2, 1))], "id long, val string, updated_at timestamp"
    )
    out = scd2_apply(hist, src, "id", "updated_at").collect()
    assert len(out) == 2
    current = {r["val"]: r["is_current"] for r in out}
    assert current == {"v1": False, "v2": True}
