"""MERGE / upsert emulation (no Delta/Iceberg jars in this image).

MERGE INTO needs a transactional table format; on plain parquet the
equivalent batch operation is: updated = source ⟕ target (new + changed
rows win), untouched = target ⟍ source, result = union.  One shuffle on
the merge key for each side; output is written back partition-parallel.
SCD2 (history-keeping) variant stacks a window to close out superseded
rows instead of dropping them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    validate_unique: bool = False,
) -> DataFrame:
    """Upsert ``source`` rows into ``target`` by ``key`` (source wins on
    conflict).  Schemas must match.

    CONTRACT: each side is key-unique — exactly one surviving row per
    key is kept.  A side with duplicate keys loses rows; pass
    ``validate_unique=True`` to fail fast instead (two count jobs, use
    in tests/backfills, skip in hot paths).  Even without validation
    the winner among intra-side duplicates is DETERMINISTIC: ties on
    the source-priority tag break on a full-row hash, so repeated runs
    keep the same row (plain ``orderBy(_src_pri)`` would keep whichever
    row the shuffle happened to order first).

    Single pass over each input: union with a source-priority tag, one
    key-partitioned window keeps the winning row.  The anti-join
    formulation (``target ⟍ source.select(key)`` ∪ ``source``) consumes
    ``source`` twice, re-executing its whole derivation per branch
    (duplicate_join_subtrees class); the window costs the same one
    key shuffle and reads both sides once.
    """
    if validate_unique:
        for side_name, side in (("target", target), ("source", source)):
            if side.groupBy(key).count().filter("count > 1").limit(1).count():
                raise ValueError(
                    f"merge_upsert: {side_name} has duplicate '{key}' values; "
                    "the contract requires key-unique sides"
                )
    tagged = target.withColumn("_src_pri", F.lit(0)).unionByName(
        source.withColumn("_src_pri", F.lit(1))
    )
    row_tie = F.xxhash64(*[F.col(c) for c in target.columns])
    w = W.partitionBy(key).orderBy(F.col("_src_pri").desc(), row_tie.asc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src_pri")
    )


def scd2_apply(
    target_hist: DataFrame,
    source: DataFrame,
    key: str,
    ts_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: append source rows as current
    versions, close out superseded ones.

    ``target_hist`` carries (…, ``ts_col``, is_current); the output has
    exactly one is_current row per key (the latest by ``ts_col``),
    earlier versions retained with is_current = false.
    """
    incoming = source.withColumn("is_current", F.lit(True))
    combined = target_hist.unionByName(incoming)
    w = W.partitionBy(key).orderBy(F.col(ts_col).desc())
    return (
        combined.withColumn("_rn", F.row_number().over(w))
        .withColumn("is_current", F.col("_rn") == 1)
        .drop("_rn")
    )
