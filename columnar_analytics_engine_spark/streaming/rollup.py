"""Streaming incremental materialized aggregate: a ``foreachBatch``
sink that maintains the (day, event_type) rollup — count + exact value
sum — as an always-queryable parquet table while event micro-batches
arrive.  The streaming twin of the batch calendar rollup
(queries/events.events_rate_per_type_day): the merged view must equal
re-aggregating all data from scratch, batch-for-batch.

Storage model (same mergeability contract as streaming/sketch.py): each
micro-batch writes only its OWN partial aggregate rows — (day,
event_type, n_events, sum_cents) — partitioned by ``batch_id``; the
materialized view is the groupBy-sum of all partitions on read.
COUNT and an integer-cents SUM are both mergeable by addition, so no
read-modify-write of the view ever happens, the per-batch write is
bounded by the batch's distinct (day, type) keys, and a foreachBatch
retry dynamic-overwrites its own partition (exact under retries).
Integer cents keep the merged sum order-independent (`_util` exact-sum
strategy).  Periodic compaction (streaming/maintenance.py) folds old
batch partitions into one without changing the view.

At 100 TB this is the standard incremental-MV recipe: the expensive
raw-event scan happens once per batch, map-side combines shrink the
shuffle to the key count, and readers pay a key-count-sized merge
instead of a history rescan.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from columnar_analytics_engine_spark.artifacts import resolve_artifact

_SCALE = 100  # cents grid, matching queries/_util.exact_sum


def partial_rollup(batch: DataFrame) -> DataFrame:
    """One micro-batch's partial aggregate: (day, event_type, n_events,
    sum_cents)."""
    return (
        batch.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.round(F.col("value") * F.lit(float(_SCALE))).cast("long")
            ).alias("sum_cents"),
        )
    )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The materialized view (merged over all batch partitions) in the
    batch query's output shape: (day, event_type, n_events, sum_value).
    Empty frame when nothing has committed; real read errors propagate."""
    try:
        parts = spark.read.parquet(resolve_artifact(rollup_path))
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return spark.createDataFrame(
                [], "day string, event_type string, n_events long, sum_value double"
            )
        raise
    return (
        parts.groupBy("day", "event_type")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_cents").alias("_sc"))
        .select(
            "day",
            "event_type",
            "n_events",
            (F.col("_sc").cast("double") / F.lit(float(_SCALE))).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


def rollup_maintenance_query(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
):
    """Build the streaming query: fold each micro-batch's partial
    rollup into its own ``batch_id`` partition under
    ``{state_dir}/rollup``.  Returns the not-yet-started writer."""
    rollup_path = f"{state_dir}/rollup"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            partial_rollup(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(resolve_artifact(rollup_path))
        )

    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
    )
