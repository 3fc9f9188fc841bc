"""Zero-copy table branches (branch.py): clone cost is metadata-only,
branches diverge snapshot-isolated on shared storage, vacuum is
branch-aware, sidecars copy."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.branch import (
    clone_table,
    family_indexes,
)
from columnar_analytics_engine_spark.io import read_table, write_sorted
from columnar_analytics_engine_spark.layout import (
    merge_upsert_files,
    vacuum_unindexed,
)
from columnar_analytics_engine_spark.manifest import current_version
from columnar_analytics_engine_spark.skipping import (
    build_stats_index,
    list_parquet_files,
    read_indexed,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, sf_small, tmp_path):
    data = str(tmp_path / "data")
    index = str(tmp_path / "idx")
    src = read_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_sorted(src, data, ["o_orderkey"], n_files=6)
    build_stats_index(spark, data, index)
    return data, index, src


def test_clone_is_zero_copy_and_reads_identically(spark, table, tmp_path):
    data, index, src = table
    branch = str(tmp_path / "branch_idx")
    files_before = set(list_parquet_files(data))
    v = clone_table(spark, index, branch)
    assert v == 1 and current_version(branch) == 1
    assert set(list_parquet_files(data)) == files_before  # zero data I/O
    assert _rows(read_indexed(spark, data, branch)) == _rows(src)
    assert os.path.abspath(branch) in family_indexes(index)
    with pytest.raises(ValueError, match="must differ"):
        clone_table(spark, index, index)


def test_branches_diverge_snapshot_isolated(spark, table, tmp_path):
    data, index, src = table
    branch = str(tmp_path / "branch_idx")
    clone_table(spark, index, branch)
    upd_src = src.filter(F.col("o_orderkey") <= 100).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    merge_upsert_files(spark, data, index, upd_src, "o_orderkey")
    upd_br = src.filter(F.col("o_orderkey") > 800).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(500.0)
    )
    merge_upsert_files(spark, data, branch, upd_br, "o_orderkey")

    expect_src = _rows(
        src.join(upd_src.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(upd_src)
    )
    expect_br = _rows(
        src.join(upd_br.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(upd_br)
    )
    assert _rows(read_indexed(spark, data, index)) == expect_src
    assert _rows(read_indexed(spark, data, branch)) == expect_br


def test_branch_aware_vacuum_protects_both(spark, table, tmp_path):
    data, index, src = table
    branch = str(tmp_path / "branch_idx")
    clone_table(spark, index, branch)
    upd = src.filter(F.col("o_orderkey") <= 100).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    merge_upsert_files(spark, data, index, upd, "o_orderkey")
    expect_br = _rows(src)

    # a NAIVE source vacuum (dry run) would delete files the branch
    # still needs — the documented shallow-clone hazard
    naive = vacuum_unindexed(
        spark, data, index, keep_versions=1, dry_run=True
    )
    branch_files = {
        r["file"]
        for r in __import__(
            "columnar_analytics_engine_spark.manifest", fromlist=["read_manifest"]
        ).read_manifest(spark, branch).select("file").distinct().collect()
    }
    assert set(naive) & branch_files, "fixture should exercise the hazard"

    # the branch-aware vacuum spares them
    fam = tuple(family_indexes(index))
    safe = vacuum_unindexed(
        spark, data, index, keep_versions=1, dry_run=True, extra_indexes=fam
    )
    assert not set(safe) & branch_files
    removed = vacuum_unindexed(
        spark, data, index, keep_versions=1, extra_indexes=fam
    )
    assert sorted(removed) == sorted(safe)
    # both branches still read exactly
    assert _rows(read_indexed(spark, data, branch)) == expect_br
    assert (
        read_indexed(spark, data, index)
        .filter(F.col("o_orderkey") <= 100)
        .agg(F.min("o_totalprice"))
        .first()[0]
        > 1000.0
    )


def test_clone_copies_schema_sidecar_then_diverges(spark, table, tmp_path):
    from columnar_analytics_engine_spark.evolution import (
        add_column,
        read_evolved,
        read_schema_spec,
    )

    data, index, src = table
    add_column(spark, data, index, "flag", "int", default=7)
    branch = str(tmp_path / "branch_idx")
    clone_table(spark, index, branch)
    assert read_schema_spec(branch) == read_schema_spec(index)
    # branch evolves independently: a new column on the branch does not
    # appear on the source
    add_column(spark, data, branch, "extra", "double", default=1.5)
    assert "extra" in [c["name"] for c in read_schema_spec(branch)["columns"]]
    assert "extra" not in [c["name"] for c in read_schema_spec(index)["columns"]]
    got = read_evolved(spark, data, branch)
    assert got.filter(F.col("extra") == 1.5).count() == src.count()
    assert read_evolved(spark, data, index).columns == [
        "o_orderkey", "o_custkey", "o_totalprice", "flag"
    ]


def test_merge_back_applies_branch_changes(spark, table, tmp_path):
    """branch → experiment → merge back: the branch's change feed since
    the clone point (updates + inserts + folded deletes) lands on the
    source as one keyed MERGE + one keyed delete; the source then reads
    exactly as the branch."""
    from columnar_analytics_engine_spark.branch import merge_back
    from columnar_analytics_engine_spark.deletes import (
        compact_deletes,
        delete_keys,
    )

    data, index, src = table
    branch = str(tmp_path / "branch_idx")
    clone_table(spark, index, branch)
    # branch work: update a slice, insert new keys, delete a slice
    upd = src.filter(F.col("o_orderkey") <= 100).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(9.0)
    )
    ins = src.filter(F.col("o_orderkey") <= 5).select(
        (F.col("o_orderkey") + 70_000_000).alias("o_orderkey"),
        "o_custkey", "o_totalprice",
    )
    merge_upsert_files(spark, data, branch, upd.unionByName(ins), "o_orderkey")
    dv = str(tmp_path / "branch_dv")
    doomed = src.filter(
        (F.col("o_orderkey") > 200) & (F.col("o_orderkey") <= 300)
    ).select("o_orderkey")
    delete_keys(spark, data, dv, doomed, "o_orderkey", index_path=branch)
    compact_deletes(spark, data, dv, branch)
    expect = _rows(read_indexed(spark, data, branch))

    out = merge_back(spark, data, index, branch, "o_orderkey")
    assert out["upserted"] > 0 and out["deleted"] > 0
    assert _rows(read_indexed(spark, data, index)) == expect


def test_merge_back_fast_forward_check(spark, table, tmp_path):
    """A source that advanced since the clone refuses a blind merge
    back (rebase or force); force=True applies branch-wins."""
    from columnar_analytics_engine_spark.branch import merge_back
    from columnar_analytics_engine_spark.manifest import ConcurrentWriteError

    data, index, src = table
    branch = str(tmp_path / "branch_idx")
    clone_table(spark, index, branch)
    # both sides move
    upd_src = src.filter(F.col("o_orderkey") <= 50).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    merge_upsert_files(spark, data, index, upd_src, "o_orderkey")
    upd_br = src.filter(F.col("o_orderkey") <= 80).withColumn(
        "o_totalprice", F.lit(2.0)
    )
    merge_upsert_files(spark, data, branch, upd_br, "o_orderkey")

    with pytest.raises(ConcurrentWriteError, match="advanced"):
        merge_back(spark, data, index, branch, "o_orderkey")
    out = merge_back(spark, data, index, branch, "o_orderkey", force=True)
    assert out["upserted"] == upd_br.count()
    # branch wins on the overlapping keys
    got = read_indexed(spark, data, index)
    assert got.filter(
        (F.col("o_orderkey") <= 80) & (F.col("o_totalprice") != 2.0)
    ).count() == 0
    # not-a-branch and wrong-source guards
    from columnar_analytics_engine_spark.branch import clone_origin

    assert clone_origin(index) is None
    with pytest.raises(ValueError, match="not a branch"):
        merge_back(spark, data, branch, index, "o_orderkey")


def test_merge_back_three_way_disjoint_succeeds(spark, table, tmp_path):
    """Round 14: when the source advanced but both sides changed
    DISJOINT key sets, merge_back proceeds WITHOUT force and the
    merged source carries both sides' changes."""
    from columnar_analytics_engine_spark.branch import merge_back

    data, index, src = table
    branch = str(tmp_path / "branch_idx")
    clone_table(spark, index, branch)
    upd_src = src.filter(F.col("o_orderkey") <= 50).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    merge_upsert_files(spark, data, index, upd_src, "o_orderkey")
    upd_br = src.filter(
        (F.col("o_orderkey") > 1000) & (F.col("o_orderkey") <= 1200)
    ).withColumn("o_totalprice", F.lit(2.0))
    merge_upsert_files(spark, data, branch, upd_br, "o_orderkey")
    out = merge_back(spark, data, index, branch, "o_orderkey")  # no force
    assert out["upserted"] == upd_br.count()
    got = read_indexed(spark, data, index)
    # both sides' changes present — nothing lost
    assert got.filter(
        (F.col("o_orderkey") <= 50) & (F.col("o_totalprice") != 1.0)
    ).count() == 0
    assert got.filter(
        (F.col("o_orderkey") > 1000) & (F.col("o_orderkey") <= 1200)
        & (F.col("o_totalprice") != 2.0)
    ).count() == 0
    assert got.count() == src.count()


def test_merge_back_conflict_refusal_names_keys(spark, table, tmp_path):
    from columnar_analytics_engine_spark.branch import merge_back
    from columnar_analytics_engine_spark.manifest import ConcurrentWriteError

    data, index, src = table
    branch = str(tmp_path / "branch_idx")
    clone_table(spark, index, branch)
    upd_src = src.filter(F.col("o_orderkey") <= 10).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    merge_upsert_files(spark, data, index, upd_src, "o_orderkey")
    upd_br = src.filter(F.col("o_orderkey") <= 10).withColumn(
        "o_totalprice", F.lit(2.0)
    )
    merge_upsert_files(spark, data, branch, upd_br, "o_orderkey")
    conflict_keys = sorted(
        r[0] for r in upd_src.select("o_orderkey").collect()
    )
    with pytest.raises(ConcurrentWriteError) as ei:
        merge_back(spark, data, index, branch, "o_orderkey")
    msg = str(ei.value)
    assert "overlapping keys" in msg
    for k in conflict_keys[:3]:
        assert str(k) in msg  # the refusal NAMES the conflicting keys


def test_family_health_reports_divergence_and_conflicts(spark, table, tmp_path):
    from columnar_analytics_engine_spark.branch import family_health
    from columnar_analytics_engine_spark.deletes import delete_keys

    data, index, src = table
    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    dv = str(tmp_path / "dv")
    clone_table(spark, index, b1)
    clone_table(spark, index, b2)
    upd_src = src.filter(F.col("o_orderkey") <= 100).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    merge_upsert_files(spark, data, index, upd_src, "o_orderkey")
    # b1: disjoint updates + an OVERLAPPING versioned DV delete
    upd_b1 = src.filter(
        (F.col("o_orderkey") > 1000) & (F.col("o_orderkey") <= 1100)
    ).withColumn("o_totalprice", F.lit(2.0))
    merge_upsert_files(spark, data, b1, upd_b1, "o_orderkey")
    losers = src.filter(
        (F.col("o_orderkey") > 50) & (F.col("o_orderkey") <= 60)
    ).select("o_orderkey")
    delete_keys(spark, data, dv, losers, "o_orderkey", index_path=b1)
    # b2: untouched since clone
    health = family_health(spark, data, index, "o_orderkey")
    by_branch = {r["branch_index"]: r for r in health}
    r1 = by_branch[os.path.abspath(b1)]
    assert r1["updates"] == upd_b1.count()
    assert r1["deletes"] == losers.count()
    assert r1["src_changed_keys"] == upd_src.count()
    assert r1["conflict_keys"] == losers.count()  # the delete overlap
    r2 = by_branch[os.path.abspath(b2)]
    assert (r2["inserts"], r2["updates"], r2["deletes"]) == (0, 0, 0)
    assert r2["src_changed_keys"] == upd_src.count()
    assert r2["conflict_keys"] == 0


def test_merge_back_carries_unfolded_versioned_deletes(spark, table, tmp_path):
    """Round 14: a VERSIONED DV delete on the branch is in the feed at
    commit time, so merge_back applies it WITHOUT a prior fold."""
    from columnar_analytics_engine_spark.branch import merge_back
    from columnar_analytics_engine_spark.deletes import delete_keys

    data, index, src = table
    branch = str(tmp_path / "branch_idx")
    dv = str(tmp_path / "dv")
    clone_table(spark, index, branch)
    losers = src.filter(
        (F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 140)
    ).select("o_orderkey")
    n_doomed = losers.count()
    delete_keys(spark, data, dv, losers, "o_orderkey", index_path=branch)
    # NO compact_deletes — the tombstones are unfolded
    out = merge_back(spark, data, index, branch, "o_orderkey")
    assert out["deleted"] == n_doomed
    got = read_indexed(spark, data, index)
    assert got.count() == src.count() - n_doomed
    assert got.filter(
        (F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 140)
    ).count() == 0
