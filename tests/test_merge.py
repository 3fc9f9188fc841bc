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


def test_merge_upsert_validate_unique_rejects_dup_keys(spark):
    import pytest

    target = spark.createDataFrame(
        [(1, "a", 1.0), (1, "a2", 2.0)], "id long, name string, bal double"
    )
    source = spark.createDataFrame([(2, "b", 3.0)], "id long, name string, bal double")
    with pytest.raises(ValueError, match="target has duplicate 'id'"):
        merge_upsert(target, source, "id", validate_unique=True)
    with pytest.raises(ValueError, match="source has duplicate 'id'"):
        merge_upsert(source, target, "id", validate_unique=True)
    # compliant sides pass the check and merge normally
    ok_t = spark.createDataFrame([(1, "a", 1.0)], "id long, name string, bal double")
    assert merge_upsert(ok_t, source, "id", validate_unique=True).count() == 2


def test_merge_upsert_dup_key_winner_is_deterministic(spark):
    """Contract violation (duplicate keys within a side) must not be a
    coin flip: the full-row-hash tiebreaker keeps the SAME row on every
    run and partitioning."""
    target = spark.createDataFrame([], "id long, name string, bal double")
    dup_source = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0), (1, "z", 30.0)],
        "id long, name string, bal double",
    )
    winners = set()
    for n_parts in (1, 3, 7):
        out = merge_upsert(target, dup_source.repartition(n_parts), "id").collect()
        assert len(out) == 1
        winners.add((out[0]["name"], out[0]["bal"]))
    assert len(winners) == 1, f"nondeterministic winner: {winners}"


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
