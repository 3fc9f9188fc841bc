"""Maintenance for foreachBatch parquet state tables (the dedup
fingerprint index, the MinHash signature index, the SCD2 regime log).

Those tables append one ``batch_id=<n>`` partition per micro-batch for
retry idempotency — correct, but after 100k micro-batches the state
directory holds 100k partition directories of small files, and every
probe join pays the file-listing cost.  ``compact_batch_partitions``
rewrites the table into a single partition (tagged with the highest
batch id seen, so the partitioning scheme — and any retry-exclusion
logic keyed on batch_id — keeps working) with size-targeted files.

Run it OFFLINE, between streaming runs: Spark only ever retries the
in-flight micro-batch recorded in the checkpoint, so once the stream
has stopped cleanly there are no pending retries against the old
per-batch partitions; the next run starts at a strictly higher batch
id.  The rewrite publishes as the next artifact GENERATION behind an
atomic pointer (``artifacts.py``): concurrent readers that resolved
the prior generation keep scanning intact files, a crash strands only
an unpublished generation dir, and bytes are reclaimed by
``artifacts.vacuum_generations`` after the retention window — the
same discipline ``manifest.py`` gives data tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TARGET_ROWS_PER_FILE = 4_000_000  # ~128 MB of 32-byte-key index rows


def compact_batch_partitions(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = _TARGET_ROWS_PER_FILE,
    vacuum_keep: int | None = None,
) -> dict:
    """Rewrite a batch_id-partitioned state table into one partition,
    published as the next artifact GENERATION behind an atomic pointer
    (``artifacts.publish_generation`` — VERDICT r12 item 1): a probe
    that resolved the state table before the compaction keeps scanning
    its intact generation; prior generations persist until
    ``artifacts.vacuum_generations`` (run here when ``vacuum_keep`` is
    given).  No in-place directory swap, no no-directory window, no
    rmtree under a concurrent reader.

    Returns a summary dict (rows, files before/after, new batch_id,
    generation).
    """
    from columnar_analytics_engine_spark.artifacts import (
        publish_generation,
        resolve_artifact,
        vacuum_generations,
    )

    live = resolve_artifact(path)
    df = spark.read.parquet(live)
    max_bid = df.agg(F.max("batch_id")).first()[0]
    n_rows = df.count()
    n_files_before = sum(
        1
        for root, _d, files in os.walk(live)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(1, -(-n_rows // target_rows_per_file))  # ceil division

    def _build(gen_dir: str) -> None:
        # append into the freshly CLAIMED (empty) generation dir —
        # overwrite would delete-and-recreate it, reopening the
        # allocation race
        (
            df.withColumn("batch_id", F.lit(max_bid))
            .repartition(n_out)
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(gen_dir)
        )

    gen = publish_generation(path, _build)
    if vacuum_keep is not None:
        vacuum_generations(path, keep_last=vacuum_keep)
    live = resolve_artifact(path)
    n_files_after = sum(
        1
        for root, _d, files in os.walk(live)
        for f in files
        if f.endswith(".parquet")
    )
    return {
        "rows": n_rows,
        "files_before": n_files_before,
        "files_after": n_files_after,
        "batch_id": max_bid,
        "generation": gen,
    }


def stats_indexed_sink(
    spark: SparkSession,
    data_path: str,
    index_path: str,
    cluster_cols: list[str] | None = None,
    cluster_files: int = 4,
    cluster_bits: int = 8,
    bloom_path: str | None = None,
    bloom_cols: list[str] | None = None,
    manifest_keep_versions: int = 8,
    compact_small_every: int | None = None,
    compact_target_bytes: int = 128 * 1024 * 1024,
):
    """``foreachBatch`` processor: append micro-batches to a Parquet
    dataset and keep its file-level stats-skipping index
    (``skipping.py``) current after every commit.

    Exactly-once by the repo's standard construction: each batch lands
    in its own ``batch_id=<n>`` partition via dynamic partition
    OVERWRITE, so a foreachBatch retry replaces its own partition
    instead of duplicating it.  The index update then RECONCILES the
    manifest against the index (``update_stats_index``): files replaced
    by a retry drop out, new files come in — the update is idempotent
    under any replay.

    Consistency model (Delta-log style): ``read_skipping`` plans from
    the INDEX's file list and never lists the data directory, so
    readers see the dataset as of the last completed index update — a
    consistent snapshot; a batch becomes visible atomically when its
    update lands.  At 100 TB this also removes the per-query object-
    store listing, which is usually the dominant planning cost.

    With ``cluster_cols`` each batch is additionally arranged in
    Z-order over those columns before landing (``layout.zorder_frame``,
    ``cluster_files`` files per batch) — clustered INGEST: every
    landed file covers a narrow hyper-rectangle of the batch's key
    space, so the stats index prunes inside batches too, not just
    across the batch_id partitioning.  The cost is one batch-local
    range shuffle per micro-batch; nothing about retry idempotency or
    index reconciliation changes (the arrangement is deterministic for
    a given batch, and a retry overwrites its whole partition anyway).

    With ``bloom_path`` + ``bloom_cols`` the Bloom file index is
    maintained per batch too (``update_bloom_index`` — change-bounded:
    only the batch's new files are scanned).  Bloom staleness is safe
    in both directions (skipping.py), so a crash between the data
    commit and the bloom update costs pruning, never correctness.

    The stats index is a VERSIONED manifest (manifest.py): each
    micro-batch's update publishes a new version atomically.  After
    each update the sink runs ``layout.vacuum_expired_references(
    keep_versions=manifest_keep_versions)`` — expiring manifest
    versions beyond the window AND deleting the data files ONLY those
    just-expired versions referenced (compaction-dropped originals),
    as one coupled step.  Expiring without reclaiming would leave
    those originals on disk unreferenced, and the next index update's
    new-file detection would re-adopt them — duplicate rows on every
    read.  The window still covers readers that planned several
    batches ago.  The reclaim is deliberately NARROWER than
    ``vacuum_unindexed``'s disk-minus-referenced sweep: a file another
    writer appends to the data directory between index updates (a
    backfill, a second pipeline) is never referenced by any version,
    so the full sweep would destroy it before ``update_stats_index``
    could adopt it — the narrow form preserves the adoption path; run
    the full sweep on an operator's schedule when strays accumulate.

    ``compact_small_every=N`` folds small-file maintenance INTO the
    sink: every N-th batch, ``layout.compact_small_files`` bin-packs
    accumulated tiny batch files into ``compact_target_bytes`` outputs
    (per partition dir, manifest-published, originals persist until
    vacuum) — the sink's own antidote to the small-file problem it
    creates.  Index-planned readers see each compaction atomically; a
    retried batch re-runs its compaction idempotently (size-selection
    simply finds less to do).
    """
    from columnar_analytics_engine_spark.skipping import (
        build_bloom_index,
        build_stats_index,
        update_bloom_index,
        update_stats_index,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if cluster_cols:
            from columnar_analytics_engine_spark.layout import zorder_frame

            out = zorder_frame(
                out, cluster_cols, cluster_files, bits=cluster_bits
            )
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(data_path)
        )
        if os.path.exists(index_path):
            update_stats_index(spark, data_path, index_path)
        else:
            build_stats_index(spark, data_path, index_path)
        if (
            compact_small_every
            and batch_id >= 0
            and (batch_id + 1) % compact_small_every == 0
        ):
            from columnar_analytics_engine_spark.layout import (
                compact_small_files,
            )

            compact_small_files(
                spark, data_path, index_path,
                target_file_bytes=compact_target_bytes,
            )
        # retention: expire old manifest versions AND reclaim the data
        # files only they referenced, as one coupled step.  A bare
        # expire_versions here would strand compaction-dropped originals
        # on disk unreferenced — once the last retained version naming
        # them expired, update_stats_index's new-file detection
        # (disk - indexed - referenced) would RE-ADOPT them and every
        # read would return their rows twice.  The NARROW reclaim
        # (just-expired references only) deletes them at exactly the
        # moment they leave the retention window while leaving
        # never-indexed external appends alone for adoption.
        from columnar_analytics_engine_spark.layout import (
            vacuum_expired_references,
        )

        vacuum_expired_references(
            spark, index_path, keep_versions=manifest_keep_versions,
        )
        if bloom_path is not None and bloom_cols:
            if os.path.exists(bloom_path):
                update_bloom_index(spark, data_path, bloom_path)
            else:
                build_bloom_index(spark, data_path, bloom_path, bloom_cols)

    return process
