"""Generation-versioned artifact publish (artifacts.py): atomic
pointer, immutable generations, reader survival, grace-window vacuum.

The artifact tier is the index-artifact twin of manifest.py's table
tier (VERDICT r12 item 1): compactions must never swap a directory in
place under a reader.
"""

from __future__ import annotations

import os

from columnar_analytics_engine_spark.artifacts import (
    current_generation,
    list_generations,
    publish_generation,
    resolve_artifact,
    vacuum_generations,
)


def _write_flat(spark, path, rows):
    spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(path)


def _rows(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_flat_artifact_resolves_to_itself(spark, tmp_path):
    p = str(tmp_path / "art.parquet")
    _write_flat(spark, p, [(1, "a")])
    assert current_generation(p) == 0
    assert resolve_artifact(p) == p
    assert list_generations(p) == [0]
    assert vacuum_generations(p) == []  # nothing published: no-op


def test_publish_generation_flips_pointer_keeps_originals(spark, tmp_path):
    p = str(tmp_path / "art.parquet")
    _write_flat(spark, p, [(1, "a"), (2, "b")])
    before = _rows(spark, resolve_artifact(p))

    def build(gen_dir):
        spark.read.parquet(p).coalesce(1).write.mode("append").parquet(gen_dir)

    g = publish_generation(p, build)
    assert g == 1 and current_generation(p) == 1
    assert resolve_artifact(p).endswith("gen-00000001")
    # originals intact; both generations read identically
    assert _rows(spark, p) == before
    assert _rows(spark, resolve_artifact(p)) == before
    assert list_generations(p) == [0, 1]


def test_old_plan_survives_publish_then_vacuum_reclaims(spark, tmp_path):
    p = str(tmp_path / "art.parquet")
    _write_flat(spark, p, [(i, f"v{i}") for i in range(10)])
    # plan against generation 0 (file list resolved now)
    old_plan = spark.read.parquet(resolve_artifact(p))
    expect = sorted(tuple(r) for r in old_plan.collect())

    def build(gen_dir):
        spark.read.parquet(resolve_artifact(p)).coalesce(1).write.mode(
            "append"
        ).parquet(gen_dir)

    publish_generation(p, build)
    publish_generation(p, build)  # generation 2
    assert current_generation(p) == 2
    # the old plan still executes (gen-0 files untouched)
    assert sorted(tuple(r) for r in old_plan.collect()) == expect

    # vacuum keep_last=1: gen-0 emptied (dir survives), gen-1 removed
    reclaimed = vacuum_generations(p, keep_last=1)
    assert reclaimed
    assert os.path.isdir(p)
    assert not any(
        f.endswith(".parquet")
        for _r, _d, files in os.walk(p)
        for f in files
    )
    assert list_generations(p) == [0, 2]
    assert sorted(
        tuple(r) for r in spark.read.parquet(resolve_artifact(p)).collect()
    ) == expect


def test_vacuum_spares_fresh_unpublished_generation(spark, tmp_path):
    """An above-pointer generation younger than the grace window is a
    presumed in-flight build — vacuum must not reclaim it (the same
    contract as manifest.expire_versions' orphan grace)."""
    p = str(tmp_path / "art.parquet")
    _write_flat(spark, p, [(1, "a")])

    def build(gen_dir):
        spark.read.parquet(p).coalesce(1).write.mode("append").parquet(gen_dir)

    publish_generation(p, build)  # gen 1 published
    # stage gen 2 WITHOUT publishing (simulated in-flight build)
    os.mkdir(f"{p}.gen-00000002")
    reclaimed = vacuum_generations(p, keep_last=1)
    # gen 0's superseded flat files may reclaim; the FRESH staged gen
    # must be spared (presumed in-flight)
    assert all("gen-00000002" not in r for r in reclaimed)
    assert os.path.isdir(f"{p}.gen-00000002")
    # past the grace window it is crashed-build garbage
    reclaimed = vacuum_generations(p, keep_last=1, orphan_grace_sec=0.0)
    assert f"{p}.gen-00000002" in reclaimed
    assert not os.path.isdir(f"{p}.gen-00000002")


def test_generation_allocation_is_collision_safe(spark, tmp_path):
    """Two racing publishers claim distinct generation dirs (atomic
    mkdir): neither interleaves files into the other's."""
    p = str(tmp_path / "art.parquet")
    _write_flat(spark, p, [(1, "a")])
    claimed = []

    def build_slow(gen_dir):
        # while this build is "in flight", a second publisher runs
        claimed.append(gen_dir)
        if len(claimed) == 1:
            g2 = publish_generation(p, build_slow)
            assert g2 != 1
        spark.read.parquet(p).coalesce(1).write.mode("append").parquet(gen_dir)

    g1 = publish_generation(p, build_slow)
    assert len(set(claimed)) == 2  # distinct dirs claimed
    assert sorted([g1, 2 if g1 == 3 else 3 if g1 == 2 else -1])  # both exist
    assert current_generation(p) in (g1, 2, 3)
