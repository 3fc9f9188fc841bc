#!/usr/bin/env python
"""Scale probe for the change-data-feed (round 13).

The CDF's 100 TB claim is that its cost is bounded by the CHANGE, not
the table: files present in both manifest versions are never read, so
for a FIXED change set the feed's wall time should be flat as the
table grows.  Two experiments (recorded in BASELINE.md "Round-13 CDF
probe"):

1. fixed change, growing table: the same ~N-row merge applied to a
   1x / 4x / 16x table (key-clustered so the merge touches a bounded
   file set); read_changes wall + the changed-file counts per size.
2. growing change, fixed table: 1x / 4x / 16x merge slices on one
   table — the feed's wall should scale with the slice, proving the
   cost tracker is the change itself.

Usage: python scripts/probe_cdf_scale.py [sf_dir]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from columnar_analytics_engine_spark.session import get_spark  # noqa: E402


def _mk_table(spark, tmp, name, n_rows, n_files):
    from columnar_analytics_engine_spark.io import write_sorted
    from columnar_analytics_engine_spark.skipping import build_stats_index

    data, index = f"{tmp}/{name}_data", f"{tmp}/{name}_idx"
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )
    write_sorted(df, data, ["k"], n_files=n_files)
    build_stats_index(spark, data, index)
    return data, index


def _merge_slice(spark, data, index, lo, hi):
    from columnar_analytics_engine_spark.layout import merge_upsert_files

    upd = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).alias("grp"),
        (F.col("id") * 2.5).alias("val"),
    )
    merge_upsert_files(spark, data, index, upd, "k")


def _feed_wall(spark, data, index, v_from, v_to):
    from columnar_analytics_engine_spark.cdf import changed_files, read_changes

    t0 = time.perf_counter()
    n = read_changes(spark, data, index, v_from, v_to).count()
    wall = time.perf_counter() - t0
    diff = changed_files(spark, index, v_from, v_to)
    return wall, n, len(diff["added"]), len(diff["removed"])


def probe_fixed_change_growing_table(spark, tmp) -> dict:
    """Same 20k-row merge on 1M / 4M / 16M-row tables (file count
    scales with rows so per-file size is constant, the realistic
    shape): feed wall should be ~flat."""
    from columnar_analytics_engine_spark.manifest import current_version

    out = {"probe": "cdf_fixed_change_growing_table", "sizes": {}}
    for mult, n_files in ((1, 16), (4, 64), (16, 256)):
        rows = 1_000_000 * mult
        data, index = _mk_table(spark, tmp, f"g{mult}", rows, n_files)
        v1 = current_version(index)
        _merge_slice(spark, data, index, 0, 20_000)
        wall, n, fa, fr = _feed_wall(
            spark, data, index, v1, current_version(index)
        )
        out["sizes"][f"{mult}x"] = {
            "table_rows": rows,
            "feed_wall_s": round(wall, 3),
            "feed_rows": n,
            "files_added": fa,
            "files_removed": fr,
        }
    w1 = out["sizes"]["1x"]["feed_wall_s"]
    w16 = out["sizes"]["16x"]["feed_wall_s"]
    out["wall_ratio_16x_vs_1x"] = round(w16 / max(w1, 1e-9), 2)
    return out


def probe_growing_change_fixed_table(spark, tmp) -> dict:
    """20k / 80k / 320k-row merges on one 4M-row table: the feed's
    cost tracker is the change size."""
    from columnar_analytics_engine_spark.manifest import current_version

    out = {"probe": "cdf_growing_change_fixed_table", "slices": {}}
    data, index = _mk_table(spark, tmp, "fix", 4_000_000, 64)
    lo = 0
    for mult in (1, 4, 16):
        size = 20_000 * mult
        v_from = current_version(index)
        _merge_slice(spark, data, index, lo, lo + size)
        lo += size
        wall, n, fa, fr = _feed_wall(
            spark, data, index, v_from, current_version(index)
        )
        out["slices"][f"{mult}x"] = {
            "merge_rows": size,
            "feed_wall_s": round(wall, 3),
            "feed_rows": n,
            "files_added": fa,
            "files_removed": fr,
        }
    return out


def probe_dv_commit_feed(spark, tmp) -> dict:
    """Round 14: a FIXED versioned DV delete (20k keys) on 1M / 4M /
    16M-row tables — the commit publishes a same-file-set version, so
    the feed's DV-delta term reads only the files the tombstones touch
    (key-clustered → a bounded file set) and wall should stay ~flat as
    the table grows; the commit itself (tombstone scan + sidecar
    publish) is also timed."""
    from columnar_analytics_engine_spark.deletes import delete_keys
    from columnar_analytics_engine_spark.manifest import current_version

    out = {"probe": "cdf_dv_commit_feed_growing_table", "sizes": {}}
    for mult, n_files in ((1, 16), (4, 64), (16, 256)):
        rows = 1_000_000 * mult
        data, index = _mk_table(spark, tmp, f"dv{mult}", rows, n_files)
        dv = f"{tmp}/dv{mult}_dv"
        v1 = current_version(index)
        doomed = spark.range(0, 20_000).select(F.col("id").alias("k"))
        t0 = time.perf_counter()
        n_t = delete_keys(spark, data, dv, doomed, "k", index_path=index)
        commit_wall = time.perf_counter() - t0
        wall, n, fa, fr = _feed_wall(
            spark, data, index, v1, current_version(index)
        )
        out["sizes"][f"{mult}x"] = {
            "table_rows": rows,
            "tombstones": n_t,
            "commit_wall_s": round(commit_wall, 3),
            "feed_wall_s": round(wall, 3),
            "feed_rows": n,
            "files_added": fa,
            "files_removed": fr,
        }
    w1 = out["sizes"]["1x"]["feed_wall_s"]
    w16 = out["sizes"]["16x"]["feed_wall_s"]
    out["wall_ratio_16x_vs_1x"] = round(w16 / max(w1, 1e-9), 2)
    return out


def main() -> None:
    spark = get_spark(app_name="cae-probe-cdf")
    with tempfile.TemporaryDirectory(prefix="cae_cdf_probe_") as tmp:
        print(json.dumps(probe_fixed_change_growing_table(spark, tmp)))
        print(json.dumps(probe_growing_change_fixed_table(spark, tmp)))
        print(json.dumps(probe_dv_commit_feed(spark, tmp)))


if __name__ == "__main__":
    main()
