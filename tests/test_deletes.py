"""Deletion vectors: merge-on-read row deletes + physical fold.

Invariant everywhere: ``read_with_deletes`` returns exactly the rows a
plain scan minus the predicate-matched rows would — before AND after
``compact_deletes`` folds the tombstones into rewritten files (the
reference's corruption-suite bar: maintenance never changes results).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.manifest import read_manifest
from columnar_analytics_engine_spark.deletes import (
    compact_deletes,
    delete_where,
    read_with_deletes,
)
from columnar_analytics_engine_spark.io import read_table, write_sorted
from columnar_analytics_engine_spark.skipping import (
    build_stats_index,
    list_parquet_files,
)

COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


def _rows(df):
    return sorted(tuple(r) for r in df.select(*COLS).collect())


@pytest.fixture()
def table(spark, sf_small, tmp_path):
    data = str(tmp_path / "data")
    index = str(tmp_path / "idx")
    dv = str(tmp_path / "dv")
    src = read_table(spark, sf_small, "orders").select(*COLS)
    write_sorted(src, data, ["o_custkey"], n_files=8)
    build_stats_index(spark, data, index)
    return data, index, dv, src


def test_delete_where_merge_on_read(spark, table):
    data, index, dv, src = table
    n = delete_where(spark, data, dv, "o_orderstatus = 'F'")
    expect = src.filter(F.col("o_orderstatus") != "F")
    assert n == src.filter(F.col("o_orderstatus") == "F").count() > 0
    assert _rows(read_with_deletes(spark, data, dv)) == _rows(expect)
    # idempotent: same predicate adds nothing
    assert delete_where(spark, data, dv, "o_orderstatus = 'F'") == 0
    # incremental second delete unions
    n2 = delete_where(spark, data, dv, "o_custkey < 5")
    assert n2 == src.filter(
        (F.col("o_custkey") < 5) & (F.col("o_orderstatus") != "F")
    ).count()
    assert _rows(read_with_deletes(spark, data, dv)) == _rows(
        expect.filter(F.col("o_custkey") >= 5)
    )


def test_read_with_deletes_composes_with_index_pruning(spark, table):
    data, index, dv, src = table
    delete_where(spark, data, dv, "o_orderkey % 3 = 0")
    lo = src.agg(F.min("o_custkey")).first()[0]
    got = read_with_deletes(
        spark, data, dv, index_path=index, predicate=f"o_custkey le {lo + 20}"
    )
    expect = src.filter(
        (F.col("o_custkey") <= lo + 20) & (F.col("o_orderkey") % 3 != 0)
    )
    assert _rows(got) == _rows(expect)


def test_compact_deletes_folds_physically(spark, table):
    data, index, dv, src = table
    delete_where(spark, data, dv, "o_orderstatus = 'F'")
    expect = _rows(src.filter(F.col("o_orderstatus") != "F"))
    before_files = set(list_parquet_files(data))

    out = compact_deletes(spark, data, dv, index)
    assert out["folded_files"] > 0 and out["tombstones_cleared"] > 0
    from columnar_analytics_engine_spark.layout import vacuum_unindexed

    vacuum_unindexed(spark, data, index)

    # physically gone: plain read (no DV) now matches
    assert _rows(spark.read.parquet(data)) == expect
    # DV cleared, merge-on-read path unchanged
    assert spark.read.parquet(dv).count() == 0
    assert _rows(read_with_deletes(spark, data, dv)) == expect
    # index manifest == disk
    disk = set(list_parquet_files(data))
    indexed = {
        r["file"]
        for r in read_manifest(spark, index).select("file").distinct().collect()
    }
    assert disk == indexed
    assert disk != before_files
    # second compact is a no-op
    assert compact_deletes(spark, data, dv, index)["folded_files"] == 0


def test_compact_deletes_drops_fully_deleted_files(spark, tmp_path):
    df = spark.createDataFrame([(i, i % 4) for i in range(400)], "a long, b long")
    data = str(tmp_path / "d")
    index = str(tmp_path / "i")
    dv = str(tmp_path / "v")
    # partition by b: file(s) holding b=2 will be deleted entirely
    df.repartition(4, "b").write.parquet(data)
    build_stats_index(spark, data, index)
    delete_where(spark, data, dv, "b = 2")
    compact_deletes(spark, data, dv, index)
    from columnar_analytics_engine_spark.layout import vacuum_unindexed

    vacuum_unindexed(spark, data, index)
    got = sorted(tuple(r) for r in spark.read.parquet(data).collect())
    assert got == sorted(
        (i, i % 4) for i in range(400) if i % 4 != 2
    )
    # no resurrectable rows anywhere
    assert spark.read.parquet(data).filter(F.col("b") == 2).count() == 0


def test_delete_keys_by_key_set(spark, table):
    from columnar_analytics_engine_spark.deletes import delete_keys

    data, index, dv, src = table
    doomed = src.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    n = delete_keys(spark, data, dv, doomed, "o_orderkey")
    assert n == doomed.count() > 0
    got = read_with_deletes(spark, data, dv)
    assert _rows(got) == _rows(src.filter(F.col("o_orderkey") % 7 != 0))
    # idempotent; null keys dropped
    again = spark.createDataFrame([(None,)], "k long")
    assert delete_keys(spark, data, dv, doomed, "o_orderkey") == 0
    assert delete_keys(spark, data, dv, again, "o_orderkey") == 0


def test_read_with_deletes_index_without_predicate(spark, table):
    """index_path alone must read the manifest's file list (the
    maintenance-safe scan), not silently fall back to a directory
    listing."""
    data, index, dv, src = table
    delete_where(spark, data, dv, "o_orderkey % 3 = 0")
    got = read_with_deletes(spark, data, dv, index_path=index)
    expect = src.filter(F.col("o_orderkey") % 3 != 0)
    assert _rows(got) == _rows(expect)
    # a stranded (unindexed) file is invisible through the index path
    import shutil

    stray_dir = data + "_straysrc"
    src.limit(20).coalesce(1).write.parquet(stray_dir)
    stray = list_parquet_files(stray_dir)[0]
    shutil.copy(stray, data + "/stray-not-indexed.parquet")
    got2 = read_with_deletes(spark, data, dv, index_path=index)
    assert _rows(got2) == _rows(expect)


def test_compact_deletes_hive_partitioned_stays_in_partition(spark, tmp_path):
    """The streaming sink's batch_id=N layout: the fold rewrites WITHIN
    each partition dir, never into the root — root-level leaf files
    mixed with key=value dirs break plain directory reads."""
    import os

    data = str(tmp_path / "d")
    index = str(tmp_path / "i")
    dv = str(tmp_path / "v")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(600)],
        "a long, batch_id long, x double",
    )
    df.repartition(2).write.partitionBy("batch_id").parquet(data)
    build_stats_index(spark, data, index)
    delete_where(spark, data, dv, "a % 5 = 0")

    out = compact_deletes(spark, data, dv, index)
    assert out["folded_files"] > 0 and out["tombstones_cleared"] > 0
    from columnar_analytics_engine_spark.layout import vacuum_unindexed

    vacuum_unindexed(spark, data, index)

    # no rewrite files escaped into the dataset root
    root_files = [
        f for f in os.listdir(data)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    assert root_files == []
    # plain directory read works and partition column survives
    got = sorted(
        (r["a"], r["batch_id"], r["x"])
        for r in spark.read.parquet(data).collect()
    )
    assert got == sorted((i, i % 3, float(i)) for i in range(600) if i % 5 != 0)
    # basePath leaf-list read (the read_skipping shape) also works
    from columnar_analytics_engine_spark.skipping import read_skipping

    pruned = read_skipping(spark, data, index, "batch_id eq 1")
    assert pruned.count() == sum(
        1 for i in range(600) if i % 3 == 1 and i % 5 != 0
    )
