"""Plan-keyed persist memoization shared across operators.

Spark's cache manager keys entries by logical plan, so ``persist()`` on
the same plan twice only re-registers it (with an "already cached"
warning) and repeated operator invocations would pile up registrations.
``persist_once`` checks the resolved storage level first, making
memoization idempotent: one cache entry per distinct input plan, reused
by every operator that rebuilds the same plan (MinHash signatures, TF
tables, dup-graph edges, ...).  The cache is bounded by distinct
INPUTS, not call count; drop an entry with ``.unpersist()`` on the
returned DataFrame or ``spark.catalog.clearCache()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def persist_once(df: DataFrame) -> DataFrame:
    """``df.persist()`` unless an equivalent plan is already cached."""
    from pyspark import StorageLevel

    if df.storageLevel == StorageLevel.NONE:
        return df.persist()
    return df
