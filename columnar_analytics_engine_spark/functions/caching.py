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

from contextlib import contextmanager

from pyspark.sql import DataFrame

# Frames actually persisted by persist_once, in order.  cache_scope
# snapshots this to unpersist exactly the entries a block created:
# without scoping, a long-lived session (bench loop, full test session,
# reused engine process) accumulates one MEMORY_AND_DISK entry per
# distinct input plan forever and degrades via LRU eviction/disk spill.
_persisted: list[DataFrame] = []


def persist_once(df: DataFrame) -> DataFrame:
    """``df.persist()`` unless an equivalent plan is already cached."""
    from pyspark import StorageLevel

    if df.storageLevel == StorageLevel.NONE:
        _persisted.append(df)
        return df.persist()
    return df


@contextmanager
def cache_scope():
    """Unpersist every frame ``persist_once`` cached inside the block.

    Use around one query / one pipeline run in a long-lived process so
    cached intermediates don't outlive the query that built them;
    deliberately narrower than ``spark.catalog.clearCache()``, which
    would also drop caches created outside the block (e.g. a shared
    train-once index)."""
    mark = len(_persisted)
    try:
        yield
    finally:
        while len(_persisted) > mark:
            frame = _persisted.pop()
            try:
                frame.unpersist()
            except Exception:
                pass  # session already stopped: nothing to release
