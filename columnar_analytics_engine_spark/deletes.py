"""Row-level deletes on immutable Parquet: deletion vectors (merge-on-read).

The reference's files — like Parquet — are immutable; the only native
way to delete a row is to rewrite its file.  At 100 TB a GDPR-style
"delete these 10k rows scattered across the corpus" cannot rewrite
terabytes, so every lakehouse format grew MERGE-ON-READ deletes (Delta
deletion vectors, Iceberg position deletes, Hive ACID delete deltas):
record (file, row position) tombstones out-of-line, have readers
subtract them, and fold them into a physical rewrite later.  This is
that layer on plain Parquet, built on Spark's ``_metadata.row_index``
(the stable position of a row within its immutable file):

* :func:`delete_where` — one scan of the matching files turns a SQL
  predicate into (file, row_index) tombstones appended to the DV
  table.  Write cost is proportional to the DELETED rows, not the
  table.
* :func:`read_with_deletes` — the merge-on-read path: scan minus a
  broadcast anti-join against the DV table.  Exact; costs one
  broadcast of the (delete-count-sized) DV.
* :func:`compact_deletes` — the fold: rewrite ONLY the files that
  carry tombstones (dropping those rows), publish the next stats-index
  manifest version, clear the folded tombstones — the same stage →
  rename-in → versioned-manifest-publish discipline as
  ``layout.cluster_compact``; originals persist for in-flight readers
  until ``layout.vacuum_unindexed`` reclaims them.

Versioning caveat: the DV table itself is NOT versioned — after a
fold, an ``as_of`` read of a pre-fold manifest version sees the
original files but the folded tombstones are gone, so time travel does
not compose with ``compact_deletes`` (it does with ``delete_where``
itself: tombstones only ever grow until a fold).

Maintenance ordering contract: ``layout.cluster_compact`` reads files
WITHOUT consulting DVs (it moves physical rows), so fold deletes
(``compact_deletes``) before re-clustering a table that has live
tombstones — the docstring of each function repeats this.

Determinism note for the oracle gate: deletes are defined by a
predicate, so the surviving ROWS are deterministic even though file
names and row positions are not; every registered query aggregates
over the survivors.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DV_SCHEMA = "file string, row_index long"


def _strip_scheme(c: Column) -> Column:
    """``_metadata.file_path`` is a URI (``file:/...``); the index and
    manifest layers use plain paths — normalize to match."""
    return F.regexp_replace(c, "^file:(//)?", "")


def _rewrite_small_table(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Staging rewrite for manifest-sized tables (same shape as
    ``skipping.update_stats_index``: never clobber the input of the
    plan being read)."""
    import shutil

    staging = path.rstrip("/") + "._staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).coalesce(1).write.mode("overwrite").parquet(path)
    shutil.rmtree(staging, ignore_errors=True)


def _dv(spark: SparkSession, dv_path: str) -> DataFrame:
    if os.path.exists(dv_path):
        return spark.read.parquet(dv_path)
    return spark.createDataFrame([], DV_SCHEMA)


def _raw_scan(spark: SparkSession, data_path: str, index_path: str | None):
    """Raw (un-projected, ``_metadata``-addressable) scan of the table:
    the manifest's file list when an index is given — a maintained
    table's directory may hold pre-vacuum originals that a plain
    listing would double-count (and tombstoning THOSE would bloat the
    DV with references to files vacuum later removes) — else the plain
    directory read.  Predicates evaluate against physical column names
    (on a schema-evolved table, delete by a column every cohort
    physically carries, e.g. the primary key)."""
    if index_path is None:
        return spark.read.parquet(data_path)
    from columnar_analytics_engine_spark.manifest import read_manifest

    files = sorted(
        r["file"]
        for r in read_manifest(spark, index_path).select("file").distinct().collect()
    )
    if not files:
        return spark.read.parquet(data_path).where(F.lit(False))
    reader = spark.read
    if os.path.isdir(data_path):
        reader = reader.option("basePath", data_path)
    return reader.parquet(*files)


def delete_where(
    spark: SparkSession,
    data_path: str,
    dv_path: str,
    predicate: str,
    index_path: str | None = None,
) -> int:
    """Tombstone every row of ``data_path`` matching the SQL
    ``predicate``: append (file, row_index) pairs to the DV table at
    ``dv_path`` (created on first use).  Returns the number of NEW
    tombstones.  Idempotent — re-deleting already-deleted rows adds
    nothing (the DV table is kept distinct), and the data files are
    untouched.  On a MAINTAINED table pass ``index_path`` so the scan
    plans from the manifest (see :func:`_raw_scan`)."""
    hits = (
        _raw_scan(spark, data_path, index_path)
        .select(
            _strip_scheme(F.col("_metadata.file_path")).alias("file"),
            F.col("_metadata.row_index").alias("row_index"),
        )
        # predicate columns resolve through the projection (Spark's
        # missing-reference resolution), same as the pre-r12 shape
        .where(F.expr(predicate))
    )
    existing = _dv(spark, dv_path)
    merged = existing.unionByName(hits).distinct()
    n_before = existing.count()
    _rewrite_small_table(spark, merged, dv_path)
    return spark.read.parquet(dv_path).count() - n_before


def delete_keys(
    spark: SparkSession,
    data_path: str,
    dv_path: str,
    keys: DataFrame,
    key_col: str,
    index_path: str | None = None,
) -> int:
    """Tombstone every row whose ``key_col`` appears in ``keys`` (a
    one-column DataFrame) — the key-set twin of :func:`delete_where`,
    for deletes computed by another operator (a dedup loser list, a
    GDPR id batch) rather than expressible as a predicate.  One
    broadcast semi-join scan of the matching files; idempotent like
    ``delete_where``; ``index_path`` plans the scan from the manifest
    on maintained tables."""
    k = keys.toDF("__k").where(F.col("__k").isNotNull()).distinct()
    hits = (
        _raw_scan(spark, data_path, index_path)
        .join(F.broadcast(k), F.col(key_col) == F.col("__k"), "left_semi")
        .select(
            _strip_scheme(F.col("_metadata.file_path")).alias("file"),
            F.col("_metadata.row_index").alias("row_index"),
        )
    )
    existing = _dv(spark, dv_path)
    merged = existing.unionByName(hits).distinct()
    n_before = existing.count()
    _rewrite_small_table(spark, merged, dv_path)
    return spark.read.parquet(dv_path).count() - n_before


def read_with_deletes(
    spark: SparkSession,
    data_path: str,
    dv_path: str,
    index_path: str | None = None,
    predicate: str | None = None,
    bloom_path: str | None = None,
) -> DataFrame:
    """Merge-on-read scan: the dataset minus its tombstones (broadcast
    anti-join on (file, row_index) — DV tables are delete-count-sized).
    With ``index_path`` (+ optional ``predicate``/``bloom_path``) the
    scan first prunes files through the stats index
    (``skipping.read_skipping``), and tombstone subtraction applies on
    the pruned scan — the two layers compose because both are pure
    row-set restrictions.  ``index_path`` without a predicate reads the
    manifest's full file list (``skipping.read_indexed``) — the
    maintenance-safe scan, not a silent fall-through to a directory
    listing.  Schema-EVOLVED tables compose too: tombstones subtract
    inside each cohort scan (``evolution.read_evolved(dv_path=...)``)
    and the predicate re-applies on logical columns."""
    if index_path is not None:
        from columnar_analytics_engine_spark.evolution import (
            read_evolved,
            read_schema_spec,
        )

        if read_schema_spec(index_path) is not None:
            from columnar_analytics_engine_spark.skipping import (
                _clause_column,
                plan_skipping,
            )

            files = None
            cond = None
            if predicate is not None:
                plan = plan_skipping(
                    spark, index_path, predicate, bloom_path=bloom_path
                )
                files = plan["files"]
                for col, op, val in plan["clauses"]:
                    c = _clause_column(col, op, val)
                    cond = c if cond is None else (cond & c)
            df = read_evolved(
                spark, data_path, index_path, files=files, dv_path=dv_path
            )
            return df.where(cond) if cond is not None else df
    if index_path is not None and predicate is not None:
        from columnar_analytics_engine_spark.skipping import read_skipping

        base = read_skipping(
            spark, data_path, index_path, predicate, bloom_path=bloom_path
        )
    elif index_path is not None:
        from columnar_analytics_engine_spark.skipping import read_indexed

        base = read_indexed(spark, data_path, index_path)
    else:
        base = spark.read.parquet(data_path)
    dv = _dv(spark, dv_path)
    cols = base.columns
    tagged = base.select(
        "*",
        _strip_scheme(F.col("_metadata.file_path")).alias("__dv_file"),
        F.col("_metadata.row_index").alias("__dv_ri"),
    )
    kept = tagged.join(
        F.broadcast(dv),
        (tagged["__dv_file"] == dv["file"])
        & (tagged["__dv_ri"] == dv["row_index"]),
        "left_anti",
    )
    return kept.select(*cols)


def compact_deletes(
    spark: SparkSession,
    data_path: str,
    dv_path: str,
    index_path: str,
    max_files: int = 64,
) -> dict:
    """Fold tombstones into the data: rewrite up to ``max_files`` of
    the tombstone-carrying files WITHOUT their deleted rows, publish
    via the manifest discipline (stage sibling → rename into the
    partition (or root) dir → versioned stats-index publish → clear
    folded tombstones; originals persist until
    ``layout.vacuum_unindexed``), and return counts.  Each run's I/O is bounded by the
    affected files, so a 10k-row delete on a 100 TB table folds by
    rewriting only the files those rows live in.  Files whose EVERY
    row is deleted are dropped without a rewrite.  Run this before
    ``layout.cluster_compact`` when tombstones exist — the re-cluster
    path moves physical rows and does not consult DVs.

    Hive-partitioned layouts (e.g. the streaming sink's ``batch_id=N``
    dirs) are handled by grouping the tombstoned files per partition
    directory and rewriting each group IN PLACE (leaf reads without
    basePath, so partition values stay path-encoded and out of the
    rewritten files) — a root-level rewrite would mix leaf files with
    ``key=value`` dirs and corrupt both plain directory reads and
    basePath leaf-list reads."""
    from columnar_analytics_engine_spark.layout import (
        group_by_partition_dir,
        publish_rewrite,
        split_groups_by_cohort,
    )

    from columnar_analytics_engine_spark.manifest import current_version

    from columnar_analytics_engine_spark.manifest import read_manifest

    expected = current_version(index_path)
    dv = _dv(spark, dv_path)
    manifest_files = {
        r["file"]
        for r in read_manifest(spark, index_path).select("file").distinct().collect()
    }
    dv_files = sorted(r["file"] for r in dv.select("file").distinct().collect())
    # tombstones on files the CURRENT manifest no longer lists are dead
    # weight (those rows are invisible to every read path; the files may
    # already be vacuumed) — cleared below without any rewrite
    dead = [f for f in dv_files if f not in manifest_files]
    affected = [f for f in dv_files if f in manifest_files][:max_files]
    if not affected and not dead:
        return {"folded_files": 0, "new_files": 0, "tombstones_cleared": 0}
    if not affected:
        remaining = dv.join(
            F.broadcast(
                spark.createDataFrame([(f,) for f in dead], "file string")
            ),
            "file", "left_anti",
        )
        cleared = dv.count() - remaining.count()
        _rewrite_small_table(spark, remaining, dv_path)
        return {"folded_files": 0, "new_files": 0, "tombstones_cleared": cleared}
    groups = group_by_partition_dir(affected, data_path)
    # evolved tables: schema-homogeneous rewrite groups only (mixing
    # cohorts in one read would drop the wider cohort's bytes)
    groups = split_groups_by_cohort(spark, index_path, groups)
    new_files: list[str] = []
    for dest, files in sorted(groups.items()):
        dest = dest.split("\x00", 1)[0]  # strip cohort tag
        tagged = spark.read.parquet(*files).select(
            "*",
            _strip_scheme(F.col("_metadata.file_path")).alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_ri"),
        )
        survivors = tagged.join(
            F.broadcast(dv),
            (tagged["__dv_file"] == dv["file"])
            & (tagged["__dv_ri"] == dv["row_index"]),
            "left_anti",
        ).drop("__dv_file", "__dv_ri")
        group_files, expected = publish_rewrite(
            spark, data_path, index_path, files,
            survivors.coalesce(max(1, len(files) // 4)),
            dest_dir=dest if dest != data_path else None,
            expected_current=expected,
        )
        new_files.extend(group_files)
    affected_df = spark.createDataFrame(
        [(f,) for f in affected + dead], "file string"
    )
    remaining = dv.join(F.broadcast(affected_df), "file", "left_anti")
    cleared = dv.count() - remaining.count()
    _rewrite_small_table(spark, remaining, dv_path)
    return {
        "folded_files": len(affected),
        "new_files": len(new_files),
        "tombstones_cleared": cleared,
    }
