"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB does — the oracle uses it).  The
scalable composition here is the union-and-carry-forward trick:

  1. tag right rows 0 and left rows 1, union them on (key, ts, tag),
     each side carrying its payload struct;
  2. one window per key ordered by (ts, tag): ``last(right_payload,
     ignorenulls)`` over an unbounded-preceding frame carries the most
     recent right row forward to every following left row (right rows
     sort before left rows at equal ts, making the match inclusive);
  3. keep left rows and unpack both payloads.

Cost: ONE shuffle on the key + an in-partition sort — same as a regular
sort-merge join, no range explosion, no driver materialization; safe at
100 TB provided keys aren't pathologically hot (salt if they are).
Right rows are deduplicated to one per (key, ts) first so ties are
deterministic (max ``tie_col`` wins, matching the oracle's
aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tie_col: str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join (inclusive: right.ts <= left.ts).

    Returns every left column plus each right payload column prefixed
    with ``right_prefix`` (null when no right row precedes).
    """
    r_payload_cols = [c for c in right.columns if c != on]
    l_payload_cols = list(left.columns)
    if tie_col is not None:
        w_dedup = W.partitionBy(on, right_ts).orderBy(F.col(tie_col).desc())
        right = (
            right.withColumn("_dd", F.row_number().over(w_dedup))
            .filter(F.col("_dd") == 1)
            .drop("_dd")
        )
    r = right.select(
        F.col(on).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*r_payload_cols).alias("_rpayload"),
    )
    l = left.select(
        F.col(on).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpayload"].dataType).alias("_rpayload"),
        F.struct(*l_payload_cols).alias("_lpayload"),
    )
    merged = r.withColumn("_lpayload", F.lit(None).cast(l.schema["_lpayload"].dataType)).unionByName(l)
    w = (
        W.partitionBy("_key")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "_matched", F.last("_rpayload", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    out_cols = [F.col(f"_lpayload.{c}").alias(c) for c in l_payload_cols] + [
        F.col(f"_matched.{c}").alias(f"{right_prefix}{c}") for c in r_payload_cols
    ]
    return carried.select(*out_cols)
