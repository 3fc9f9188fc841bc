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

Versioned delete commits (round 14): on a MAINTAINED table (pass
``index_path``), every :func:`delete_where` / :func:`delete_keys` is a
COMMIT — tombstones are tagged with a fresh ``_commit_id``, a new
manifest version is staged whose ``_DV_COMMITS`` sidecar
(``manifest.dv_commits``) adds that id, and the version publishes
under the usual optimistic-concurrency check.  Consequences:

* The change feed (``cdf.read_changes``) emits DV deletes AT COMMIT
  TIME: the table state and its feed agree at every version, the
  Delta-CDF contract (the r13 gap where deletes surfaced only at fold
  time is closed).
* ``as_of`` reads apply EXACTLY the tombstones committed as of that
  version (``read_with_deletes(as_of=...)``), so time travel now
  composes with both ``delete_where`` and ``compact_deletes``.
* Crash safety: tombstones are appended BEFORE the version publishes;
  a crash in between leaves commit-tagged tombstones no sidecar ever
  names — invisible to every sidecar-filtered read, vacuum-able dead
  rows.  (On a table that has never done a versioned delete there is
  no sidecar and ALL tombstones apply — the legacy contract, kept for
  plain ``dv_path``-only tables and pre-upgrade DV files, whose rows
  read as commit id ``__legacy__``.)
* Folding keeps commit-tagged tombstones in the DV table until their
  files are referenced by NO retained manifest version (a pre-fold
  ``as_of`` read or feed interval still needs them); legacy-tagged
  tombstones clear at fold exactly as before.

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

DV_SCHEMA = "file string, row_index long, _commit_id string"
# commit id for tombstones written outside the versioned-commit
# protocol (no index_path, or a pre-r14 DV file): ALWAYS applied
LEGACY_COMMIT = "__legacy__"


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
    """The DV table, normalized to the 3-column schema: pre-r14 DV
    files lack ``_commit_id`` and read as :data:`LEGACY_COMMIT`
    (always applied)."""
    if os.path.exists(dv_path):
        df = spark.read.parquet(dv_path)
        if "_commit_id" not in df.columns:
            df = df.withColumn("_commit_id", F.lit(LEGACY_COMMIT))
        return df
    return spark.createDataFrame([], DV_SCHEMA)


def applied_commit_ids(
    index_path: str | None, as_of: int | None = None
) -> list[str] | None:
    """The DV commit ids that APPLY at a version (legacy rows always
    apply and are implied), or ``None`` when ALL tombstones apply — a
    plain table, or one that never did a versioned delete (no
    ``_DV_COMMITS`` sidecar anywhere: the legacy contract)."""
    if index_path is None:
        return None
    from columnar_analytics_engine_spark.manifest import dv_commits

    side = dv_commits(index_path, as_of)
    if side is None:
        # distinguish "this version predates the first versioned
        # delete" (an as_of older than the first sidecar: zero commits
        # applied then) from "this table never versioned a delete"
        # (no sidecar anywhere: the legacy all-apply contract)
        if as_of is None or dv_commits(index_path) is None:
            return None
        side = {"commits": []}
    return list(side.get("commits", []))


def filter_dv_commits(dv: DataFrame, commit_ids: list[str] | None) -> DataFrame:
    """Restrict a (normalized) DV frame to legacy rows plus the given
    commits; ``None`` keeps everything (all-apply)."""
    if commit_ids is None:
        return dv
    return dv.where(F.col("_commit_id").isin([LEGACY_COMMIT] + commit_ids))


def committed_dv(
    spark: SparkSession,
    dv_path: str,
    index_path: str | None,
    as_of: int | None = None,
) -> DataFrame:
    """The tombstones that APPLY at a version: legacy rows always,
    commit-tagged rows only when the resolved version's ``_DV_COMMITS``
    sidecar names their commit.  A table with no sidecar (never did a
    versioned delete) applies everything — the legacy contract."""
    return filter_dv_commits(
        _dv(spark, dv_path), applied_commit_ids(index_path, as_of)
    )


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


def _commit_tombstones(
    spark: SparkSession,
    dv_path: str,
    hits: DataFrame,
    index_path: str | None,
) -> int:
    """Shared commit step for :func:`delete_where` / :func:`delete_keys`:
    append the new (file, row_index) tombstones and — on a VERSIONED
    table — publish the delete as a manifest version whose
    ``_DV_COMMITS`` sidecar names the fresh commit id (see the module
    docstring's crash-safety / feed contract).  Idempotent: pairs
    already tombstoned are not re-added, and a no-op delete publishes
    no version.  Returns the number of NEW tombstones."""
    import uuid

    from columnar_analytics_engine_spark.manifest import (
        current_version,
        dv_commits,
        publish_version,
        read_manifest,
        write_dv_commits,
        write_manifest,
    )

    from columnar_analytics_engine_spark.manifest import mkdir_lock

    expected = current_version(index_path) if index_path is not None else None
    commit_id = uuid.uuid4().hex if expected is not None else LEGACY_COMMIT
    # the DV read-merge-rewrite is a lost-update window under
    # concurrent deleters — serialize it with a sibling lock (long
    # stale window: the section runs Spark jobs, not microseconds).
    # This is a SEPARATE lock from the manifest publish lock (taken
    # inside publish_version below), so there is no re-entrancy.
    with mkdir_lock(
        f"{dv_path.rstrip('/')}.lock", stale_sec=600.0, timeout_sec=600.0
    ):
        existing = _dv(spark, dv_path)
        # idempotency is judged against the APPLYING tombstones only:
        # a pair left by a crashed/conflicted commit (id in no sidecar)
        # is inert and must not suppress a live re-delete of the same
        # row — it is re-added under the new commit id (duplicate
        # pairs across commit ids are harmless to every anti-join)
        applied = committed_dv(spark, dv_path, index_path)
        fresh = (
            hits.select("file", "row_index")
            .distinct()
            .join(
                applied.select("file", "row_index"),
                ["file", "row_index"],
                "left_anti",
            )
            .withColumn("_commit_id", F.lit(commit_id))
        )
        merged = existing.unionByName(fresh).distinct()
        n_before = existing.count()
        _rewrite_small_table(spark, merged, dv_path)
        n_new = spark.read.parquet(dv_path).count() - n_before
    if expected is not None and n_new > 0:
        # stage a same-file-set manifest version, add the commit to its
        # sidecar, publish under the OCC check — tombstones are durable
        # BEFORE the flip, so a reader resolving the new version always
        # sees its deletes (a crash in between leaves the commit id
        # unreferenced and the tombstones inert)
        snapshot = read_manifest(spark, index_path)
        version = write_manifest(spark, index_path, snapshot, publish=False)
        prior = dv_commits(index_path, expected) or {"commits": []}
        write_dv_commits(
            index_path, version,
            list(prior.get("commits", [])) + [commit_id], dv_path,
        )
        publish_version(index_path, version, expected_current=expected)
    return n_new


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
    plans from the manifest (see :func:`_raw_scan`) AND the delete
    publishes as a versioned COMMIT (module docstring): the change
    feed shows it immediately and ``as_of`` reads apply exactly the
    tombstones committed as of each version."""
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
    return _commit_tombstones(spark, dv_path, hits, index_path)


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
    on maintained tables and publishes the delete as a versioned
    COMMIT (module docstring)."""
    k = keys.toDF("__k").where(F.col("__k").isNotNull()).distinct()
    hits = (
        _raw_scan(spark, data_path, index_path)
        .join(F.broadcast(k), F.col(key_col) == F.col("__k"), "left_semi")
        .select(
            _strip_scheme(F.col("_metadata.file_path")).alias("file"),
            F.col("_metadata.row_index").alias("row_index"),
        )
    )
    return _commit_tombstones(spark, dv_path, hits, index_path)


def read_with_deletes(
    spark: SparkSession,
    data_path: str,
    dv_path: str,
    index_path: str | None = None,
    predicate: str | None = None,
    bloom_path: str | None = None,
    as_of: int | None = None,
    as_of_ts: float | None = None,
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
    and the predicate re-applies on logical columns.

    Time travel: ``as_of=N`` (a retained manifest version) or
    ``as_of_ts=<epoch seconds>`` (resolved through the publish journal,
    ``manifest.version_at``) reads the table exactly as published
    then, INCLUDING its deletes — only tombstones whose commit is in
    that version's ``_DV_COMMITS`` sidecar apply (versioned deletes
    compose with time travel; see the module docstring)."""
    if as_of_ts is not None:
        if index_path is None:
            raise ValueError("as_of_ts requires index_path")
        if as_of is not None:
            raise ValueError("pass as_of or as_of_ts, not both")
        from columnar_analytics_engine_spark.manifest import version_at

        as_of = version_at(index_path, as_of_ts)
    dv_ids = applied_commit_ids(index_path, as_of)
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
                    spark, index_path, predicate, bloom_path=bloom_path,
                    as_of=as_of,
                )
                files = plan["files"]
                for col, op, val in plan["clauses"]:
                    c = _clause_column(col, op, val)
                    cond = c if cond is None else (cond & c)
            df = read_evolved(
                spark, data_path, index_path, as_of=as_of, files=files,
                dv_path=dv_path, dv_commit_ids=dv_ids,
            )
            return df.where(cond) if cond is not None else df
    if index_path is not None and predicate is not None:
        from columnar_analytics_engine_spark.skipping import read_skipping

        base = read_skipping(
            spark, data_path, index_path, predicate, bloom_path=bloom_path,
            as_of=as_of,
        )
    elif index_path is not None:
        from columnar_analytics_engine_spark.skipping import read_indexed

        base = read_indexed(spark, data_path, index_path, as_of=as_of)
    else:
        base = spark.read.parquet(data_path)
    dv = filter_dv_commits(_dv(spark, dv_path), dv_ids)
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

    from columnar_analytics_engine_spark.manifest import (
        current_version,
        dv_commits,
        read_manifest,
        referenced_files,
    )

    expected = current_version(index_path)
    dv_all = _dv(spark, dv_path)
    # versioned-delete tables fold only COMMITTED tombstones (an
    # in-flight or crashed commit's rows must not fold) and clear a
    # tombstone only once NO retained version references its file —
    # pre-fold as_of reads and feed intervals still need it; legacy
    # tables keep the original fold-and-clear contract
    versioned = dv_commits(index_path) is not None
    dv = committed_dv(spark, dv_path, index_path) if versioned else dv_all
    manifest_files = {
        r["file"]
        for r in read_manifest(spark, index_path).select("file").distinct().collect()
    }
    dv_files = sorted(r["file"] for r in dv.select("file").distinct().collect())
    if versioned:
        retained_refs = referenced_files(spark, index_path)
        clearable = sorted(
            {
                r["file"]
                for r in dv_all.select("file").distinct().collect()
            }
            - retained_refs
        )
    else:
        # tombstones on files the CURRENT manifest no longer lists are
        # dead weight (those rows are invisible to every read path; the
        # files may already be vacuumed) — cleared without any rewrite
        clearable = [f for f in dv_files if f not in manifest_files]
    affected = [f for f in dv_files if f in manifest_files][:max_files]
    if not affected and not clearable:
        return {"folded_files": 0, "new_files": 0, "tombstones_cleared": 0}
    if not affected:
        remaining = dv_all.join(
            F.broadcast(
                spark.createDataFrame([(f,) for f in clearable], "file string")
            ),
            "file", "left_anti",
        )
        cleared = dv_all.count() - remaining.count()
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
    # versioned tables clear only retention-expired tombstones (the
    # folded ones stay until their files leave every retained version);
    # legacy tables clear folded + dead as before
    drop = clearable if versioned else affected + clearable
    if drop:
        drop_df = spark.createDataFrame([(f,) for f in drop], "file string")
        remaining = dv_all.join(F.broadcast(drop_df), "file", "left_anti")
        cleared = dv_all.count() - remaining.count()
        _rewrite_small_table(spark, remaining, dv_path)
    else:
        cleared = 0
    return {
        "folded_files": len(affected),
        "new_files": len(new_files),
        "tombstones_cleared": cleared,
    }
