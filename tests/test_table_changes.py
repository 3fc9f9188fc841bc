"""``table_changes`` streaming source (sources/table_changes.py —
VERDICT r13 item 5): the change feed as a readStream with
manifest-version offsets, EXACTLY ONCE across a checkpoint restart,
including versioned DV deletes at commit time; and the driver-side
pyarrow netting agrees with ``cdf.read_changes`` row-for-row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.deletes import delete_keys
from columnar_analytics_engine_spark.io import read_table, write_sorted
from columnar_analytics_engine_spark.layout import merge_upsert_files
from columnar_analytics_engine_spark.manifest import current_version
from columnar_analytics_engine_spark.skipping import build_stats_index
from columnar_analytics_engine_spark.sources.table_changes import (
    TableChangesDataSource,
    net_changes_py,
)


@pytest.fixture()
def table(spark, sf_small, tmp_path):
    data = str(tmp_path / "data")
    index = str(tmp_path / "idx")
    src = (
        read_table(spark, sf_small, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(F.col("o_orderkey") <= 2000)
    )
    write_sorted(src, data, ["o_orderkey"], n_files=4)
    build_stats_index(spark, data, index)
    return data, index, src


def test_net_changes_py_matches_read_changes(spark, table, tmp_path):
    """The pyarrow netting is the same algebra as cdf.read_changes —
    check multiset equality over a merge + versioned-DV interval."""
    from columnar_analytics_engine_spark.cdf import read_changes

    data, index, src = table
    dv = str(tmp_path / "dv")
    v1 = current_version(index)
    upd = src.filter("o_orderkey <= 100").withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(9.0)
    )
    merge_upsert_files(spark, data, index, upd, "o_orderkey")
    losers = src.filter("o_orderkey > 500 AND o_orderkey <= 520").select(
        "o_orderkey"
    )
    delete_keys(spark, data, dv, losers, "o_orderkey", index_path=index)
    v2 = current_version(index)
    want = sorted(
        (r["o_orderkey"], r["o_custkey"], r["o_totalprice"],
         r["_change_type"], r["_change_count"])
        for r in read_changes(spark, data, index, v1, v2).collect()
    )
    got = sorted(net_changes_py(index, v1, v2))
    assert got == want


def test_stream_exactly_once_across_restart(spark, table, tmp_path):
    data, index, src = table
    dv = str(tmp_path / "dv")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(TableChangesDataSource)

    def drain():
        q = (
            spark.readStream.format("table_changes")
            .option("index", index)
            .load(data)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # batch 1: bootstrap — the current snapshot as inserts
    drain()
    n_src = src.count()
    first = spark.read.parquet(out)
    assert first.count() == n_src
    assert first.where("_change_type <> 'insert'").count() == 0

    # table moves: an update slice and a versioned DV delete commit
    upd = src.filter("o_orderkey <= 50").withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    merge_upsert_files(spark, data, index, upd, "o_orderkey")
    losers = src.filter("o_orderkey > 500 AND o_orderkey <= 540").select(
        "o_orderkey"
    )
    delete_keys(spark, data, dv, losers, "o_orderkey", index_path=index)

    # batch 2 from the SAME checkpoint: only the new changes, once
    drain()
    rows = spark.read.parquet(out)
    n_upd = upd.count()
    n_del = losers.count()
    # bootstrap + (update: delete-old + insert-new) + DV deletes
    assert rows.count() == n_src + 2 * n_upd + n_del
    deletes = rows.where("_change_type = 'delete'")
    updated_keys = {r[0] for r in upd.select("o_orderkey").collect()}
    doomed_keys = {r[0] for r in losers.collect()}
    assert {
        r["o_orderkey"] for r in deletes.collect()
    } == updated_keys | doomed_keys
    # nothing from the bootstrap re-delivered: inserts = bootstrap +
    # the update postimages
    assert rows.where("_change_type = 'insert'").count() == n_src + n_upd

    # batch 3 with no table movement: delivers nothing
    drain()
    assert spark.read.parquet(out).count() == n_src + 2 * n_upd + n_del


def test_batch_read_is_snapshot_bootstrap(spark, table):
    data, index, src = table
    spark.dataSource.register(TableChangesDataSource)
    df = (
        spark.read.format("table_changes").option("index", index).load(data)
    )
    assert df.count() == src.count()
    assert df.where("_change_type <> 'insert'").count() == 0
    assert df.agg(F.sum("o_orderkey")).first()[0] == (
        src.agg(F.sum("o_orderkey")).first()[0]
    )
