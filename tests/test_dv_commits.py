"""Versioned deletion-vector COMMITS (round 14, VERDICT r13 item 2):

* a ``delete_where``/``delete_keys`` with ``index_path`` publishes a
  manifest version whose ``_DV_COMMITS`` sidecar names the commit —
  the change feed shows the deletes IMMEDIATELY (not at fold time),
  and the later physical fold is feed-silent;
* ``as_of`` reads apply exactly the tombstones committed as of each
  version (time travel now composes with both the delete and the
  fold);
* tombstones whose commit id no sidecar names (a crashed/conflicted
  commit) are INERT;
* the lock-steal and generation-monotonic repairs from ADVICE r13.

Reference anchor: the snapshot-consistency bar of the reference's
tests/test_corruption.cpp, extended to deltas — table state and feed
state must agree at every version.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.cdf import read_changes
from columnar_analytics_engine_spark.deletes import (
    compact_deletes,
    delete_keys,
    delete_where,
    read_with_deletes,
)
from columnar_analytics_engine_spark.io import read_table, write_sorted
from columnar_analytics_engine_spark.manifest import (
    current_version,
    dv_commits,
    mkdir_lock,
    publish_log,
    version_at,
)
from columnar_analytics_engine_spark.skipping import build_stats_index


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


def test_delete_commit_publishes_version_and_feed_shows_it(spark, table, tmp_path):
    """The VERDICT item-2 'done' shape: write v1, delete WITHOUT
    folding → feed v1→v2 shows exactly the deleted rows; fold → feed
    v2→v3 is EMPTY."""
    data, index, src = table
    dv = str(tmp_path / "dv")
    v1 = current_version(index)
    doomed = src.filter("o_orderkey % 7 = 0")
    n_doomed = doomed.count()
    n = delete_keys(
        spark, data, dv, doomed.select("o_orderkey"), "o_orderkey",
        index_path=index,
    )
    assert n == n_doomed
    v2 = current_version(index)
    assert v2 == v1 + 1  # the delete IS a version
    side = dv_commits(index, v2)
    assert side is not None and len(side["commits"]) == 1
    assert side["dv_path"] == os.path.abspath(dv)
    # feed v1→v2: the deletes, at COMMIT time, before any fold
    ch = read_changes(spark, data, index, v1, v2)
    assert ch.where("_change_type <> 'delete'").count() == 0
    got = sorted(r[0] for r in ch.select("o_orderkey").collect())
    want = sorted(r[0] for r in doomed.select("o_orderkey").collect())
    assert got == want
    # table state agrees with the feed at v2
    assert (
        read_with_deletes(spark, data, dv, index_path=index).count()
        == src.count() - n_doomed
    )
    # fold → feed v2→v3 EMPTY (the rewrite nets out)
    out = compact_deletes(spark, data, dv, index)
    assert out["folded_files"] > 0
    v3 = current_version(index)
    assert read_changes(spark, data, index, v2, v3).count() == 0
    # and the whole interval v1→v3 still shows exactly the deletes
    whole = read_changes(spark, data, index, v1, v3)
    assert sorted(r[0] for r in whole.select("o_orderkey").collect()) == want


def test_as_of_composes_with_delete_and_fold(spark, table, tmp_path):
    """Time travel applies exactly the tombstones committed as of each
    version — including AFTER the fold cleared nothing (versioned
    tables retain folded tombstones until retention expires their
    files)."""
    data, index, src = table
    dv = str(tmp_path / "dv")
    total = src.count()
    v1 = current_version(index)
    delete_where(spark, data, dv, "o_orderkey % 5 = 0", index_path=index)
    v2 = current_version(index)
    n_del = src.filter("o_orderkey % 5 = 0").count()
    compact_deletes(spark, data, dv, index)
    v3 = current_version(index)
    # pre-delete snapshot: full table
    assert (
        read_with_deletes(spark, data, dv, index_path=index, as_of=v1).count()
        == total
    )
    # post-delete, pre-fold snapshot: survivors (needs the retained
    # folded tombstones — the r13 'versioning caveat' now closed)
    assert (
        read_with_deletes(spark, data, dv, index_path=index, as_of=v2).count()
        == total - n_del
    )
    # post-fold: same survivors, physically
    assert (
        read_with_deletes(spark, data, dv, index_path=index, as_of=v3).count()
        == total - n_del
    )


def test_as_of_ts_resolves_via_journal(spark, table, tmp_path):
    data, index, src = table
    dv = str(tmp_path / "dv")
    total = src.count()
    t_before = time.time()
    time.sleep(0.05)
    delete_where(spark, data, dv, "o_orderkey % 5 = 0", index_path=index)
    time.sleep(0.05)
    t_after = time.time()
    n_del = src.filter("o_orderkey % 5 = 0").count()
    assert (
        read_with_deletes(
            spark, data, dv, index_path=index, as_of_ts=t_before
        ).count()
        == total
    )
    assert (
        read_with_deletes(
            spark, data, dv, index_path=index, as_of_ts=t_after
        ).count()
        == total - n_del
    )
    with pytest.raises(ValueError):
        read_with_deletes(
            spark, data, dv, index_path=index, as_of=1, as_of_ts=t_after
        )


def test_uncommitted_tombstones_are_inert(spark, table, tmp_path):
    """Tombstones tagged with a commit id no sidecar names — the
    residue of a crashed or OCC-conflicted delete — must not apply to
    any read, and a live re-delete of the same rows must still
    commit."""
    data, index, src = table
    dv = str(tmp_path / "dv")
    total = src.count()
    # one real versioned commit so the table has a sidecar
    delete_where(spark, data, dv, "o_orderkey = -1", index_path=index)  # no-op
    n = delete_where(spark, data, dv, "o_custkey = 1", index_path=index)
    assert n > 0
    # forge a crashed commit: tombstone every remaining row under an id
    # no sidecar will ever name
    forged = (
        spark.read.parquet(data)
        .select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:(//)?", ""
            ).alias("file"),
            F.col("_metadata.row_index").alias("row_index"),
            F.lit("deadbeef-crashed").alias("_commit_id"),
        )
    )
    existing = spark.read.parquet(dv)
    merged = existing.unionByName(forged).distinct()
    staging = str(tmp_path / "dv_stage")
    merged.coalesce(1).write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).coalesce(1).write.mode("overwrite").parquet(dv)
    # the forged tombstones are inert
    assert (
        read_with_deletes(spark, data, dv, index_path=index).count()
        == total - n
    )
    # a live re-delete of rows covered only by the forged commit still
    # takes effect (idempotency judged against APPLYING tombstones)
    n2 = delete_where(spark, data, dv, "o_custkey = 2", index_path=index)
    assert n2 == src.filter("o_custkey = 2").count()
    assert (
        read_with_deletes(spark, data, dv, index_path=index).count()
        == total - n - n2
    )


def test_redelete_is_idempotent_and_publishes_nothing(spark, table, tmp_path):
    data, index, src = table
    dv = str(tmp_path / "dv")
    delete_where(spark, data, dv, "o_custkey = 3", index_path=index)
    v = current_version(index)
    assert delete_where(spark, data, dv, "o_custkey = 3", index_path=index) == 0
    assert current_version(index) == v  # no empty version published


def test_journal_backfill_repairs_missing_publish_line(spark, table):
    """A crash between pointer flip and journal append (simulated by
    stripping the line) heals on the next publish, so version_at can
    resolve to the repaired version afterwards."""
    data, index, src = table
    from columnar_analytics_engine_spark.manifest import (
        read_manifest,
        write_manifest,
    )

    v2 = write_manifest(spark, index, read_manifest(spark, index))
    hist = os.path.join(index, "_HISTORY")
    with open(hist) as fh:
        lines = [ln for ln in fh if not ln.startswith(f"{v2} ")]
    with open(hist, "w") as fh:
        fh.writelines(lines)
    assert all(v != v2 for v, _ in publish_log(index))
    v3 = write_manifest(spark, index, read_manifest(spark, index))
    logged = [v for v, _ in publish_log(index)]
    assert v2 in logged and v3 in logged
    assert version_at(index, time.time()) == v3


def test_mkdir_lock_steal_is_single_winner_and_release_is_owner_only(tmp_path):
    lock = str(tmp_path / "lk")
    # stale lock (old mtime) gets stolen by exactly one acquirer
    os.mkdir(lock)
    old = time.time() - 3600
    os.utime(lock, (old, old))
    with mkdir_lock(lock, stale_sec=1.0, timeout_sec=5.0):
        assert os.path.isdir(lock)
        # simulate the FIRST holder having stalled: a breaker steals
        # this lock and a new holder acquires
        os.utime(lock, (old, old))
        import contextlib

        stack = contextlib.ExitStack()
        stack.enter_context(mkdir_lock(lock, stale_sec=1.0, timeout_sec=5.0))
        # new holder owns the dir now
        assert os.path.isdir(lock)
        stack.close()  # new holder releases cleanly
        assert not os.path.isdir(lock)
    # the stalled first holder's release must NOT have removed anything
    # extra — and a fresh acquire works
    with mkdir_lock(lock, stale_sec=1.0, timeout_sec=5.0):
        assert os.path.isdir(lock)
    assert not os.path.isdir(lock)


def test_stolen_holder_does_not_release_new_holders_lock(tmp_path):
    lock = str(tmp_path / "lk")
    import contextlib

    first = contextlib.ExitStack()
    first.enter_context(mkdir_lock(lock, stale_sec=1.0, timeout_sec=5.0))
    old = time.time() - 3600
    os.utime(lock, (old, old))
    second = contextlib.ExitStack()
    second.enter_context(mkdir_lock(lock, stale_sec=1.0, timeout_sec=5.0))
    # first (stolen) holder exits: the new holder's lock must survive
    first.close()
    assert os.path.isdir(lock)
    second.close()
    assert not os.path.isdir(lock)


def test_publish_generation_is_monotonic(tmp_path):
    """A slower build that claims an EARLIER generation number than one
    already published must not move the pointer backwards (ADVICE r13
    #3): the newer compaction wins, the older build lands unpublished
    below the pointer."""
    from columnar_analytics_engine_spark.artifacts import (
        current_generation,
        publish_generation,
    )

    p = str(tmp_path / "art")
    os.makedirs(p)

    def build_inner(d):
        with open(os.path.join(d, "x.parquet"), "w") as fh:
            fh.write("inner")

    def build_outer(d):
        # while the outer build (gen 1) is still running, a concurrent
        # compactor claims gen 2 and publishes it first
        publish_generation(p, build_inner)
        with open(os.path.join(d, "x.parquet"), "w") as fh:
            fh.write("outer")

    g = publish_generation(p, build_outer)
    assert g == 1
    assert current_generation(p) == 2  # pointer stayed on the newer gen


def test_concurrent_delete_commit_hammer_no_lost_tombstones(spark, table, tmp_path):
    """Four threads race versioned deletes of DISJOINT key slices with
    OCC retry loops: every slice's tombstones must end up committed
    (named by the final sidecar) and applied — no delete lost to the
    DV read-merge-rewrite race or to a conflicted publish.  (The DV
    lock serializes the rewrite; the publish OCC serializes the
    sidecar; a conflicted commit's tombstones are inert and get
    re-added by the retry.)"""
    import threading

    from columnar_analytics_engine_spark.manifest import ConcurrentWriteError

    data, index, src = table
    dv = str(tmp_path / "dv")
    total = src.count()
    slices = {i: f"o_orderkey % 4 = {i} AND o_custkey <= 40" for i in range(4)}
    expected_deleted = sum(
        src.filter(pred).count() for pred in slices.values()
    )
    errs: list[str] = []

    def deleter(i: int) -> None:
        try:
            for _ in range(25):
                try:
                    delete_where(
                        spark, data, dv, slices[i], index_path=index
                    )
                    return
                except ConcurrentWriteError:
                    continue
            errs.append(f"deleter {i} starved")
        except Exception as e:  # pragma: no cover
            errs.append(repr(e))

    threads = [threading.Thread(target=deleter, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = read_with_deletes(spark, data, dv, index_path=index)
    assert got.count() == total - expected_deleted
    for pred in slices.values():
        assert got.filter(pred).count() == 0
