"""Streaming snapshot sink on the versioned-table layer: every
micro-batch publishes one immutable table version.

``foreachBatch`` + ``versioned.write_version(version=batch_id)`` gives
exactly-once snapshot publication for free: Spark replays a failed
micro-batch with the SAME batch_id, the version directory is immutable
(write_version raises on an already-committed version), and a version
is only visible once its ``_SUCCESS`` marker lands — so a crash between
write and commit leaves an invisible partial directory that the retry
simply overwrites.  Downstream consumers read `read_version(latest)` or
diff consecutive versions (`diff_versions`) for incremental rebuilds —
the streaming producer side of the snapshot/diff pipeline.

At scale each snapshot is a full partitioned dataset; for hourly/daily
cadence that is the standard "publish immutable partitions" pattern,
with `vacuum(keep_last=k)` bounding storage.

Exactly-once REQUIRES a replayable source (file/record-archive/Kafka):
the idempotent skip of an already-committed batch_id assumes the replay
carries the same rows as the original attempt.  A non-replayable source
(socket, rate with wall-clock payloads) can re-deliver batch N with
different data, which the skip silently discards — at-most-once for
that batch.  Also inherits the versioned layer's driver-visible-POSIX
``table_path`` constraint (see ``versioned`` module docstring).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame

from columnar_analytics_engine_spark import versioned as V


def publish_batch(table_path: str):
    """The foreachBatch function: commit the micro-batch as table
    version ``batch_id``, idempotently (exposed for direct replay
    testing)."""

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if bid in V.list_versions(table_path):
            return  # replayed batch: version already committed — skip
        # a crashed earlier attempt may have left an uncommitted (no
        # _SUCCESS) directory; clear it so the retry's write can land
        d = V._version_dir(table_path, bid)
        shutil.rmtree(d, ignore_errors=True)
        V.write_version(batch_df, table_path, version=bid)

    return publish


def snapshot_sink(stream: DataFrame, table_path: str, checkpoint: str):
    """Attach a snapshot-per-batch sink to a streaming DataFrame;
    returns the (not yet started) ``DataStreamWriter``."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(publish_batch(table_path))
    )
