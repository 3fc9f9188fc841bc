"""Versioned-table primitives: snapshot immutability, as-of reads,
history, retention, and key-bounded diffs."""

from __future__ import annotations

import pytest


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_write_read_versions_and_latest(spark, tmp_path):
    from columnar_analytics_engine_spark import versioned as V

    tp = str(tmp_path / "t")
    assert V.write_version(_df(spark, [(1, "a"), (2, "b")]), tp) == 0
    assert V.write_version(_df(spark, [(1, "a"), (2, "B"), (3, "c")]), tp) == 1
    assert V.list_versions(tp) == [0, 1]
    assert V.read_version(spark, tp).count() == 3  # latest
    assert V.read_version(spark, tp, 0).count() == 2  # as-of
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, tp, 7)


def test_versions_are_immutable(spark, tmp_path):
    from columnar_analytics_engine_spark import versioned as V

    tp = str(tmp_path / "t")
    V.write_version(_df(spark, [(1, "a")]), tp)
    with pytest.raises(ValueError):
        V.write_version(_df(spark, [(9, "z")]), tp, version=0)


def test_uncommitted_version_is_invisible(spark, tmp_path):
    from columnar_analytics_engine_spark import versioned as V

    tp = str(tmp_path / "t")
    V.write_version(_df(spark, [(1, "a")]), tp)
    # simulate a crashed write: directory without _SUCCESS
    broken = tmp_path / "t" / "v=1"
    broken.mkdir()
    (broken / "part-00000.parquet").write_bytes(b"garbage")
    assert V.list_versions(tp) == [0]
    assert V.read_version(spark, tp).count() == 1  # still v0


def test_history_and_vacuum(spark, tmp_path):
    from columnar_analytics_engine_spark import versioned as V

    tp = str(tmp_path / "t")
    for i in range(4):
        V.write_version(_df(spark, [(j, "x") for j in range(i + 1)]), tp)
    hist = {r["version"]: r.asDict() for r in V.table_history(spark, tp).collect()}
    assert sorted(hist) == [0, 1, 2, 3]
    assert all(h["n_files"] >= 1 and h["n_bytes"] > 0 for h in hist.values())
    assert V.vacuum(tp, keep_last=2) == [0, 1]
    assert V.list_versions(tp) == [2, 3]
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, tp, 0)
    with pytest.raises(ValueError):
        V.vacuum(tp, keep_last=0)


def test_diff_versions_classifies_delta(spark, tmp_path):
    from columnar_analytics_engine_spark import versioned as V

    tp = str(tmp_path / "t")
    V.write_version(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), tp)
    V.write_version(_df(spark, [(2, "B"), (3, "c"), (4, "d")]), tp)
    out = {r["k"]: r["change_type"] for r in V.diff_versions(spark, tp, 0, 1, "k").collect()}
    assert out == {1: "removed", 2: "changed", 4: "added"}  # 3 unchanged: absent


def test_diff_digest_rejects_nested_maps(spark):
    """Maps break the JSON digest whether top-level or nested: to_json
    serializes map entries in engine-internal order, so equal rows can
    digest differently.  The guard must walk struct fields and
    array/map element types, not just top-level dataTypes."""
    import pytest

    from columnar_analytics_engine_spark.versioned import _contains_map, _row_digest
    from pyspark.sql.types import (
        ArrayType, IntegerType, MapType, StringType, StructField, StructType,
    )

    m = MapType(StringType(), IntegerType())
    assert _contains_map(m)
    assert _contains_map(StructType([StructField("inner", m)]))
    assert _contains_map(ArrayType(m))
    assert _contains_map(ArrayType(StructType([StructField("deep", ArrayType(m))])))
    assert not _contains_map(StructType([StructField("s", StringType())]))
    assert not _contains_map(ArrayType(IntegerType()))

    nested = spark.sql(
        "SELECT 1 AS k, named_struct('tags', map('a', 1)) AS payload"
    )
    with pytest.raises(ValueError, match="payload"):
        _row_digest(nested, "k")
    flat = spark.sql("SELECT 1 AS k, named_struct('s', 'x') AS payload")
    _row_digest(flat, "k")  # map-free nesting is fine


def test_diff_digest_is_null_safe(spark, tmp_path):
    from columnar_analytics_engine_spark import versioned as V

    tp = str(tmp_path / "t")
    V.write_version(_df(spark, [(1, None), (2, "x")]), tp)
    V.write_version(_df(spark, [(1, None), (2, None)]), tp)
    out = {r["k"]: r["change_type"] for r in V.diff_versions(spark, tp, 0, 1, "k").collect()}
    assert out == {2: "changed"}  # NULL==NULL rows are unchanged, x->NULL is a change
