"""Time-series / event-stream queries (batch-deterministic forms).

Every operator here has two lives: the batch form below (oracle-checked
against DuckDB) and a Structured Streaming form in ``streaming/`` (same
logic over ``readStream`` with watermarks, verified in pytest with an
``availableNow`` trigger against these batch results).  Batch ``F.window``
/ ``session_window`` are the exact aggregation semantics streaming uses,
so checking the batch plan checks the streaming math.

Timestamps: parquet stores ns; both Spark and DuckDB truncate to µs.
Outputs expose epoch micros (``unix_micros`` ↔ ``epoch_us``) or
hour-aligned strings, never raw timestamps, so hashes can't diverge on
formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.functions.caching import persist_once
from columnar_analytics_engine_spark.operators.asof import asof_join
from columnar_analytics_engine_spark.queries._util import (
    QuerySpec,
    exact_sum,
    sql_exact_sum,
    t,
)


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregate (streaming twin:
    streaming/windows.py::tumbling_counts with a watermark)."""
    df = t(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window every 30 minutes — each event lands in two
    windows."""
    df = t(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
        .orderBy("window_start")
    )


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): per-user session
    boundaries via lag + cumulative flag — the batch equivalent of
    ``session_window``/``applyInPandasWithState``."""
    df = t(spark, sf_dir, "events")
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_order)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    new_session = F.when(prev_ts.isNull() | (gap_s > 1800), 1).otherwise(0)
    w_cum = w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
    with_sid = df.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(w_cum)
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
    )


def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the earliest event per (user, type) — batch form of
    streaming ``dropDuplicatesWithinWatermark``."""
    df = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
    )


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the same user's most
    recent purchase at or before it (operators/asof.py; DuckDB oracle
    uses its native ASOF JOIN)."""
    events = t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(errors, purchases, on="user_id", tie_col="event_id")
    return joined.select(
        "event_id",
        "user_id",
        F.col("r_event_id").alias("purchase_event_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("r_ts")).alias("secs_after_purchase"),
    )


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks from the same user within the 5 minutes before
    each error.  Scale form: bucketize the time axis (300 s) and
    equi-join on (user, bucket)∪(user, bucket−1) before the residual
    range filter — turns an unbounded range join into a bounded hash
    join."""
    events = t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
    )
    e_b = errors.withColumn("_bucket", F.floor(F.unix_timestamp("e_ts") / 300))
    c_b = clicks.withColumn("_cbucket", F.floor(F.unix_timestamp("c_ts") / 300))
    probe = e_b.select(
        "event_id", "user_id", "e_ts", F.explode(F.array("_bucket", F.col("_bucket") - 1)).alias("_jb")
    )
    matched = (
        probe.join(
            c_b,
            (F.col("user_id") == F.col("c_user")) & (F.col("_jb") == F.col("_cbucket")),
        )
        .filter(
            (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("c_ts") < F.col("e_ts"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    return (
        errors.select("event_id", "user_id")
        .join(matched, "event_id", "left")
        .select("event_id", "user_id", F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"))
    )


def events_rate_per_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts + exact value sums per type (calendar rollup)."""
    df = t(spark, sf_dir, "events")
    return (
        df.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .orderBy("day", "event_type")
    )


QUERIES: dict[str, QuerySpec] = {
    "events_tumbling_window": QuerySpec(
        events_tumbling_window,
        f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {sql_exact_sum('value', 'sum_value')}
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
        """,
        "tumbling 1-hour windowed aggregation",
        ("streaming", "window"),
    ),
    "events_sliding_window": QuerySpec(
        events_sliding_window,
        """
        WITH x AS (
          SELECT ts, (CAST(floor(epoch(ts) / 1800) AS BIGINT)) AS halfhr FROM events
        ),
        w AS (
          SELECT make_timestamp(halfhr * 1800 * 1000000) AS w_start FROM x
          UNION ALL
          SELECT make_timestamp((halfhr - 1) * 1800 * 1000000) AS w_start FROM x
        )
        SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events
        FROM w GROUP BY 1 ORDER BY window_start
        """,
        "sliding 1h/30m windowed aggregation",
        ("streaming", "window"),
    ),
    "events_sessionization": QuerySpec(
        events_sessionization,
        """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sid AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               epoch_us(MIN(ts)) AS session_start_us,
               epoch_us(MAX(ts)) AS session_end_us,
               COUNT(*) AS n_events
        FROM sid GROUP BY user_id, session_id
        """,
        "gap-based sessionization (30-min inactivity)",
        ("streaming", "window"),
    ),
    "events_dedup_first": QuerySpec(
        events_dedup_first,
        """
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) = 1
        """,
        "earliest-event dedup per (user, type)",
        ("streaming", "dedup"),
    ),
    "events_asof_join": QuerySpec(
        events_asof_join,
        """
        WITH err AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
        ),
        pur AS (
          SELECT user_id, ts, MAX(event_id) AS event_id
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        )
        SELECT e.event_id, e.user_id,
               p.event_id AS purchase_event_id,
               date_diff('second', p.ts, e.ts) AS secs_after_purchase
        FROM err e ASOF LEFT JOIN pur p
          ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        "as-of join errors→latest prior purchase",
        ("join", "streaming"),
    ),
    "events_range_join": QuerySpec(
        events_range_join,
        """
        WITH err AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
        ),
        clk AS (
          SELECT user_id, ts FROM events WHERE event_type = 'click'
        )
        SELECT e.event_id, e.user_id, COUNT(c.user_id) AS n_clicks
        FROM err e LEFT JOIN clk c
          ON c.user_id = e.user_id
         AND c.ts >= e.ts - INTERVAL 5 MINUTE AND c.ts < e.ts
        GROUP BY e.event_id, e.user_id
        """,
        "bucketized time-range join (clicks before errors)",
        ("join", "streaming"),
    ),
    "events_rate_per_type_day": QuerySpec(
        events_rate_per_type_day,
        f"""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type,
               COUNT(*) AS n_events,
               {sql_exact_sum('value', 'sum_value')}
        FROM events GROUP BY 1, 2 ORDER BY day, event_type
        """,
        "daily per-type rollup",
        ("streaming", "agg"),
    ),
}


def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events to a dense 1-hour grid per type, zero-filling
    empty buckets — the gap-fill step every downstream time-series
    model needs.  The grid is generated distributively (sequence over
    the observed bound row cross-joined with the type dimension), so no
    driver-side materialization."""
    df = t(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    counts = (
        df.groupBy(hour.alias("h"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    bounds = df.agg(
        F.min(hour).alias("hmin"), F.max(hour).alias("hmax")
    )
    types = df.select("event_type").distinct()
    grid = (
        bounds.select(F.explode(F.sequence(F.col("hmin"), F.col("hmax"))).alias("h"))
        .crossJoin(types)
    )
    return (
        grid.join(counts, ["h", "event_type"], "left")
        .select(
            F.date_format(F.timestamp_seconds(F.col("h") * 3600), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("hour", "event_type")
    )


QUERIES["events_resample_gapfill"] = QuerySpec(
    events_resample_gapfill,
    """
    WITH h AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, event_type FROM events
    ),
    counts AS (SELECT h, event_type, COUNT(*) AS n_events FROM h GROUP BY 1, 2),
    bounds AS (SELECT MIN(h) AS hmin, MAX(h) AS hmax FROM h),
    grid AS (
      SELECT unnest(range(hmin, hmax + 1)) AS h FROM bounds
    ),
    dense AS (
      SELECT g.h, ty.event_type FROM grid g
      CROSS JOIN (SELECT DISTINCT event_type FROM events) ty
    )
    SELECT strftime(make_timestamp(d.h * 3600 * 1000000), '%Y-%m-%d %H:%M:%S') AS hour,
           d.event_type,
           COALESCE(c.n_events, 0) AS n_events
    FROM dense d LEFT JOIN counts c ON c.h = d.h AND c.event_type = d.event_type
    ORDER BY hour, d.event_type
    """,
    "1-hour resampling with zero gap-fill per event type",
    ("streaming", "window"),
)


def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build from a change
    log: collapse each user's event stream into contiguous
    ``event_type`` regimes with [valid_from, valid_to) microsecond
    bounds and an ``is_current`` flag — the standard CDC-compaction step
    that turns an append-only log into a queryable dimension table.

    Shape: one shuffle on ``user_id``; the change-detection lag window
    and the valid_to lead window share the same partitioning, so
    Catalyst plans a single Exchange for both.  At 100 TB this is the
    same per-key-bounded window as sessionization — no global sort, no
    driver state, and the output is strictly smaller than the input
    (one row per regime change).
    """
    df = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.lag("event_type").over(w).isNull() | (
        F.lag("event_type").over(w) != F.col("event_type")
    )
    starts = df.withColumn("_chg", changed).filter(F.col("_chg"))
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead(F.unix_micros("ts")).over(w2)
    return starts.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us")


QUERIES["events_scd2_history"] = QuerySpec(
    events_scd2_history,
    """
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    starts AS (
      SELECT user_id, event_type, ts, event_id FROM changes
      WHERE prev_type IS NULL OR prev_type != event_type
    )
    SELECT user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           lead(CAST(epoch_us(ts) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM starts
    ORDER BY user_id, valid_from_us
    """,
    "SCD type-2 dimension history compacted from the event change log",
    ("events", "window", "cdc"),
)


def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user over the irregular
    event stream: each reading is weighted by how long it was current
    (seconds until the user's next event); the final reading carries no
    interval and drops out.  The standard aggregate for sensor/metric
    streams where plain AVG over-weights bursts.

    Exactness: cents = round(value*100) as int64, weight = integer
    seconds, so the weighted sum is an exact associative integer sum in
    any partition order; the closing division is one IEEE op both
    engines evaluate identically.  Shape: one user_id shuffle (the lead
    window and the groupBy share it).
    """
    df = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    secs = (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts"))
    cents = F.round(F.col("value") * 100).cast("long")
    weighted = df.select(
        "user_id", secs.alias("w_secs"), (cents * secs).alias("w_cents")
    ).filter(F.col("w_secs").isNotNull())
    return (
        weighted.groupBy("user_id")
        .agg(
            (
                F.sum("w_cents").cast("double")
                / (F.lit(100.0) * F.sum("w_secs").cast("double"))
            ).alias("twap_value"),
            F.sum("w_secs").alias("total_secs"),
            F.count("*").alias("n_intervals"),
        )
        .orderBy("user_id")
    )


QUERIES["events_time_weighted_avg"] = QuerySpec(
    events_time_weighted_avg,
    """
    WITH iv AS (
      -- floor-to-second via integer µs division: matches Spark's
      -- unix_timestamp truncation (CAST(epoch(..)) would ROUND)
      SELECT user_id,
             (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000)
               - (epoch_us(ts) // 1000000) AS w_secs,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT user_id,
           CAST(SUM(cents * w_secs) AS DOUBLE)
             / (100.0 * CAST(SUM(w_secs) AS DOUBLE)) AS twap_value,
           CAST(SUM(w_secs) AS BIGINT) AS total_secs,
           COUNT(*) AS n_intervals
    FROM iv WHERE w_secs IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    "per-user time-weighted average value over irregular intervals (cents-exact)",
    ("events", "timeseries", "window"),
)


_LAG_N = 8


def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-feature row for downstream models: at each user's
    latest event, the previous ``_LAG_N`` values as fixed columns
    f0 (most recent) .. f7, plus the sequence length — the standard
    feature-matrix extraction step between an event log and a trainer.
    Users shorter than the window get NULL-padded tails (models impute),
    reported via ``n_events``.

    Shape: one user_id shuffle; the lag window and the latest-row
    filter share the partitioning.  Values pass through untouched (no
    re-aggregation), so cross-engine equality is exact by construction.
    """
    df = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wd = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    lagged = df.select(
        "user_id",
        F.row_number().over(wd).alias("_rn"),
        *[F.lag("value", j).over(w).alias(f"f{j}") for j in range(_LAG_N)],
        F.count("*").over(
            W.partitionBy("user_id").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n_events"),
    )
    return (
        lagged.filter(F.col("_rn") == 1)
        .select("user_id", *[f"f{j}" for j in range(_LAG_N)], "n_events")
        .orderBy("user_id")
    )


QUERIES["events_lag_features"] = QuerySpec(
    events_lag_features,
    f"""
    WITH lagged AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
               AS _rn,
             {", ".join(f"lag(value, {j}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f{j}" for j in range(_LAG_N))},
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
    )
    SELECT user_id, {", ".join(f"f{j}" for j in range(_LAG_N))},
           CAST(n_events AS BIGINT) AS n_events
    FROM lagged WHERE _rn = 1 ORDER BY user_id
    """,
    "per-user last-8-value lag feature row (feature-matrix extraction)",
    ("events", "window", "training"),
)


def events_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-growth curve: per day, how many users appeared for the
    first time and the cumulative user count — the first chart on any
    product dashboard.  Distinct-over-time without a quadratic
    re-count: each user contributes exactly their first-seen day (one
    user_id reduce), so cumulative distinct is a running sum over the
    tiny day table, not COUNT(DISTINCT) per day over history.

    The running-sum window is over the ~30-row day table — bounded by
    the calendar, not the data."""
    df = t(spark, sf_dir, "events")
    firsts = df.groupBy("user_id").agg(
        F.min(F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")).alias("day")
    )
    daily = firsts.groupBy("day").agg(F.count("*").alias("new_users"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    ).orderBy("day")


QUERIES["events_user_growth"] = QuerySpec(
    events_user_growth,
    """
    WITH firsts AS (
      SELECT user_id, MIN(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS day
      FROM events GROUP BY 1
    ),
    daily AS (SELECT day, COUNT(*) AS new_users FROM firsts GROUP BY 1)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumulative_users
    FROM daily ORDER BY day
    """,
    "daily new + cumulative distinct users (first-seen-day reduction)",
    ("events", "analytics", "window"),
)


def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness (DAU/WAU) per day: daily actives over distinct users
    active in the trailing 7 days.  The windowed distinct is computed
    scale-safely: the (day, user) activity table — already one
    per-day dedup — is expanded to the ≤7 future days each activity
    row covers (a bounded 7× explode, NOT a per-day history rescan),
    then reduced by (day, user) distinct + count.  Both reduces are
    map-combinable key shuffles; nothing is proportional to history
    length per day.
    """
    df = t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    day_user = df.select(day.alias("day"), "user_id").distinct()
    dau = day_user.groupBy("day").agg(F.count("*").alias("dau"))
    covers = day_user.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "user_id"
    ).select(F.date_add("day", F.col("off")).alias("day"), "user_id")
    wau = (
        covers.distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


QUERIES["events_dau_wau_stickiness"] = QuerySpec(
    events_dau_wau_stickiness,
    """
    WITH day_user AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM day_user GROUP BY 1),
    covers AS (
      SELECT DISTINCT day + CAST(off || ' days' AS INTERVAL) AS day, user_id
      FROM day_user CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
    ),
    wau AS (SELECT day, COUNT(*) AS wau FROM covers GROUP BY 1)
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
           ROUND(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6) AS stickiness
    FROM dau d JOIN wau w USING (day)
    ORDER BY day
    """,
    "DAU/WAU stickiness via bounded 7-day coverage expansion (no history rescan)",
    ("events", "analytics"),
)


def events_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of event types, the
    exact distinct-user overlap and its Jaccard — "how much does the
    error-seeing audience overlap the purchasing audience".  The
    (type, user) dedup is one reduce; the pair join is bounded by
    |types|² pairs of audience SETS, joined on user_id (never a user ×
    user product).  At billions of users per segment the same query
    drops in mergeable HLL sketches (see sketch_distinct_users) for
    the counts; this exact form is the ground truth it is checked
    against.
    """
    df = t(spark, sf_dir, "events")
    # (type, user) dedup is data-sized and feeds three consumers (sizes
    # + both sides of the pair self-join): persist so the events scan +
    # distinct shuffle run once, not three times
    tu = persist_once(df.select("event_type", "user_id").distinct())
    # sizes (|types| rows) joins in twice (sa/sb): persist so the
    # second consumer doesn't re-aggregate the full cached tu
    sizes = persist_once(
        tu.groupBy("event_type").agg(F.count("*").alias("n_users"))
    )
    a, b = tu.alias("a"), tu.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_users") + F.col("sb.n_users") - F.col("n_common")
    ).cast("double")
    return (
        common.join(sizes.alias("sa"), F.col("type_a") == F.col("sa.event_type"))
        .join(sizes.alias("sb"), F.col("type_b") == F.col("sb.event_type"))
        .select(
            "type_a", "type_b", "n_common", F.round(jac, 6).alias("jaccard")
        )
        .orderBy("type_a", "type_b")
    )


QUERIES["events_segment_overlap"] = QuerySpec(
    events_segment_overlap,
    """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, COUNT(*) AS n_users FROM tu GROUP BY 1),
    common AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_common
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_common,
           ROUND(CAST(n_common AS DOUBLE)
                 / CAST(sa.n_users + sb.n_users - n_common AS DOUBLE), 6) AS jaccard
    FROM common
    JOIN sizes sa ON type_a = sa.event_type
    JOIN sizes sb ON type_b = sb.event_type
    ORDER BY type_a, type_b
    """,
    "distinct-user audience overlap (exact Jaccard) between event-type pairs",
    ("events", "analytics", "join"),
)


# ---------------------------------------------------------------------------
# seasonal-naive forecast evaluation
# ---------------------------------------------------------------------------

def events_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict each day's
    event count with the same weekday's count one week earlier) per
    event type — the capacity-planning baseline every fancier model must
    beat, and the cheapest possible drift alarm when its error jumps.

    Calendar-correct: the prediction joins on (type, day − 7 days), not
    a row lag, so missing days never misalign the season.  One daily
    rollup + one self-join keyed on (type, day); MAE is an exact integer
    mean, MAPE micro-quantizes each |a−p|/a term before the exact
    integer mean (same cross-engine discipline as the KL/LM scores).
    """
    ev = t(spark, sf_dir, "events")
    # the daily rollup feeds both sides of the t-7d self-join: persist
    # so the full events scan happens once (the rollup itself is only
    # |types|x|days| rows)
    daily = persist_once(
        ev.groupBy(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        ).agg(F.count("*").alias("n"))
    )
    pred = daily.select(
        "event_type",
        F.date_add(F.col("day"), 7).alias("day"),
        F.col("n").alias("pred"),
    )
    j = daily.join(pred, ["event_type", "day"])
    err = F.abs(F.col("n") - F.col("pred"))
    ape_micro = F.round(
        err.cast("double") / F.col("n").cast("double") * F.lit(1e6)
    ).cast("long")
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days_scored"),
            (F.sum(err).cast("double") / F.count("*").cast("double")).alias("mae"),
            (
                (F.sum(ape_micro).cast("double") / F.count("*").cast("double"))
                / F.lit(1e6)
            ).alias("mape"),
        )
        .orderBy("event_type")
    )


QUERIES["events_seasonal_naive_eval"] = QuerySpec(
    events_seasonal_naive_eval,
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.n, p.n AS pred
      FROM daily a
      JOIN daily p ON p.event_type = a.event_type
                  AND p.day = a.day - INTERVAL 7 DAY
    )
    SELECT event_type,
           COUNT(*) AS n_days_scored,
           CAST(SUM(ABS(n - pred)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae,
           (CAST(SUM(CAST(ROUND(CAST(ABS(n - pred) AS DOUBLE)
                                / CAST(n AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) / 1e6 AS mape
    FROM j GROUP BY event_type ORDER BY event_type
    """,
    "seasonal-naive (t-7d) forecast backtest per type: MAE + micro-exact MAPE",
    ("timeseries", "analytics"),
)


def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars of event value per type —
    the time-series downsampling shape every monitoring/market pipeline
    emits.  Open/close are deterministic: first/last by (ts, event_id),
    computed with min/max over a (ts, event_id, value) struct — a pure
    aggregation (map-side combinable), NOT a sort or window, so one
    shuffle on (day, type) produces the bars at any scale.  High/low/
    volume ride the same aggregate."""
    ev = t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day"),
            "event_type",
        )
        .agg(
            F.min(key).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key).getField("value").alias("close"),
            F.count("*").alias("volume"),
        )
        .orderBy("day", "event_type")
    )


QUERIES["events_ohlc_daily"] = QuerySpec(
    events_ohlc_daily,
    """
    WITH r AS (
      SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
             event_type, value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts), event_type
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT day, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS volume
    FROM r GROUP BY day, event_type ORDER BY day, event_type
    """,
    "daily OHLC bars per type (deterministic open/close via struct min/max)",
    ("timeseries", "agg"),
)


def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-burst days per event type: days whose event COUNT exceeds
    the type's mean by 2σ (population) — the paging alarm for traffic
    spikes/incidents, complementing events_anomaly_zscore (which scores
    VALUES, not volumes).

    The 2σ gate is INTEGER-EXACT, no floats in the decision: with d
    days, per-day count n, Σn and Σn², the condition
    n > mean + 2σ  ⇔  x > 0 ∧ x² > 4·(d·Σn² − (Σn)²)  where
    x = n·d − Σn — all int64 (safe past 10⁹ events/day·10³ days).  The
    reported z-score is micro-rounded for display only.  Two keyed
    aggregations + one broadcast-able per-type join; no windows.
    """
    ev = t(spark, sf_dir, "events")
    # daily rollup feeds the per-type stats AND the burst join: persist
    # so the events scan runs once
    daily = persist_once(
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day"),
        ).agg(F.count("*").alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("d"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    x = F.col("n") * F.col("d") - F.col("s")
    var_term = F.col("d") * F.col("q") - F.col("s") * F.col("s")  # d²·σ²
    is_burst = (x > 0) & (x * x > 4 * var_term)
    z = F.when(
        var_term > 0,
        F.round(
            x.cast("double") / F.sqrt(var_term.cast("double")) * F.lit(1e6)
        ).cast("long").cast("double")
        / F.lit(1e6),
    )
    return (
        j.select("event_type", "day", "n", is_burst.alias("is_burst"), z.alias("z_score"))
        .filter(F.col("is_burst"))
        .orderBy("event_type", "day")
    )


QUERIES["events_burst_detection"] = QuerySpec(
    events_burst_detection,
    """
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, COUNT(*) AS d,
             CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(n * n) AS BIGINT) AS q
      FROM daily GROUP BY 1
    )
    SELECT d1.event_type, d1.day, d1.n,
           TRUE AS is_burst,
           CASE WHEN st.d * st.q - st.s * st.s > 0 THEN
             CAST(CAST(ROUND(CAST(d1.n * st.d - st.s AS DOUBLE)
                  / SQRT(CAST(st.d * st.q - st.s * st.s AS DOUBLE)) * 1e6)
                  AS BIGINT) AS DOUBLE) / 1e6
           END AS z_score
    FROM daily d1 JOIN st USING (event_type)
    WHERE d1.n * st.d - st.s > 0
      AND (d1.n * st.d - st.s) * (d1.n * st.d - st.s)
            > 4 * (st.d * st.q - st.s * st.s)
    ORDER BY d1.event_type, d1.day
    """,
    "2-sigma volume-burst days per type (integer-exact gate, no windows)",
    ("timeseries", "quality"),
)
