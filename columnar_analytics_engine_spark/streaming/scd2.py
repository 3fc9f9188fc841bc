"""Streaming SCD type-2 dimension maintenance: a ``foreachBatch`` sink
that keeps a persistent regime-change history for every user as event
micro-batches arrive — the streaming twin of the batch history builder
(queries/events.events_scd2_history).

Storage model: the history table is append-only REGIME STARTS
``(user_id, event_type, valid_from_us, event_id, batch_id)`` — exactly
the batch query's ``starts`` set, maintained incrementally.  A batch
contributes its internal regime changes, minus the batch's first regime
per user when it merely continues the user's current (latest) type.
``valid_to_us`` / ``is_current`` are derived on read with one lead
window (:func:`history_view`), so the maintained state never needs
updates-in-place — an append-only parquet log is enough, no
transactional table format required.

Scale shape: per batch, one user_id-partitioned window over the BATCH
(not history) plus one join against the per-user current row — the
history is never rescanned beyond its latest row per key (and that
probe can read a bucketed-by-user_id history shuffle-free).

Exactly-once: appends are partitioned by ``batch_id`` with dynamic
partition overwrite, so a foreachBatch retry replaces its own partition
instead of duplicating regimes (same contract as
streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from columnar_analytics_engine_spark.artifacts import resolve_artifact

_HIST_SCHEMA = (
    "user_id long, event_type string, valid_from_us long, event_id long,"
    " batch_id long"
)


def read_history(spark: SparkSession, hist_path: str) -> DataFrame:
    """The raw regime-start log, or an empty frame if none exists yet.
    Only path-not-found is treated as "no history"; real read failures
    propagate (swallowing them would fork every user's history)."""
    try:
        return spark.read.parquet(resolve_artifact(hist_path)).select(
            "user_id", "event_type", "valid_from_us", "event_id",
            F.col("batch_id").cast("long").alias("batch_id"),
        )
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return spark.createDataFrame([], _HIST_SCHEMA)
        raise


def current_rows(history: DataFrame) -> DataFrame:
    """Latest regime per user: (user_id, cur_type)."""
    w = W.partitionBy("user_id").orderBy(
        F.desc("valid_from_us"), F.desc("event_id")
    )
    return (
        history.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("event_type").alias("cur_type"))
    )


def batch_regime_starts(batch: DataFrame) -> DataFrame:
    """Regime starts WITHIN one micro-batch of events (same lag-window
    change detection as the batch query)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.lag("event_type").over(w).isNull() | (
        F.lag("event_type").over(w) != F.col("event_type")
    )
    return (
        batch.withColumn("_chg", changed)
        .filter(F.col("_chg"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("valid_from_us"),
            "event_id",
        )
    )


def apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    hist_path: str,
    batch_id: int | None = None,
) -> DataFrame:
    """New history rows this batch contributes: its internal regime
    starts, minus each user's first start when it equals the user's
    current type (a continuing regime is not a change).

    ``batch_id`` is the id about to be (re-)written: its own partition
    is EXCLUDED from the current-row probe, so a foreachBatch retry
    compares against the pre-batch state instead of the batch's own
    committed rows — without this, a retried batch whose first regime
    type equals its last would drop that first regime and the dynamic
    partition overwrite would make the loss permanent."""
    starts = batch_regime_starts(batch)
    hist = read_history(spark, hist_path)
    if batch_id is not None:
        hist = hist.filter(F.col("batch_id") != F.lit(batch_id))
    cur = current_rows(hist)
    w = W.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    ranked = starts.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.join(cur, "user_id", "left")
        .filter(
            (F.col("_rn") > 1)
            | F.col("cur_type").isNull()
            | (F.col("cur_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "valid_from_us", "event_id")
    )


def history_view(spark: SparkSession, hist_path: str) -> DataFrame:
    """The maintained log rendered in the batch query's output shape:
    (user_id, event_type, valid_from_us, valid_to_us, is_current)."""
    hist = read_history(spark, hist_path)
    w = W.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    valid_to = F.lead("valid_from_us").over(w)
    return hist.select(
        "user_id",
        "event_type",
        "valid_from_us",
        valid_to.alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us")


def scd2_maintenance_query(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
):
    """Build the streaming query maintaining ``{state_dir}/history``.
    Returns the (not-yet-started) ``DataStreamWriter``; callers pick
    the trigger (tests use ``availableNow``)."""
    hist_path = f"{state_dir}/history"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        delta = apply_batch(spark, batch_df, hist_path, batch_id).withColumn(
            "batch_id", F.lit(batch_id)
        )
        # materialize before writing: the delta reads the history that
        # this write is about to extend (count() forces it through the
        # cache so the write never lists its own output)
        delta.persist()
        delta.count()
        try:
            (
                delta.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(resolve_artifact(hist_path))
            )
        finally:
            delta.unpersist()

    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
    )
