"""Cross-engine deterministic hashing.

MinHash/SimHash need a keyed hash that is (a) deterministic, (b) cheap,
and (c) reproducible in the DuckDB oracle.  Spark's native ``xxhash64``
has no DuckDB twin, so we derive a 60-bit integer from md5 — md5 is
identical everywhere, and 15 hex chars (60 bits) fit a signed int64.

    Spark :  conv(substr(md5(concat(prefix, x)), 1, 15), 16, 10) :: long
    DuckDB:  CAST('0x' || substr(md5(prefix || x), 1, 15) AS BIGINT)

Both produce the same non-negative int64 for the same input (verified
bit-for-bit).  The ``prefix`` acts as the hash-family seed (one prefix
per MinHash permutation).  For throughput-critical paths that don't
need oracle parity, swap in ``F.xxhash64`` — same API shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(prefix: str, col: Column) -> Column:
    """60-bit keyed hash of a string column (seeded by ``prefix``)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 15), 16, 10
    ).cast("long")


def sql_h60(prefix: str, expr: str) -> str:
    """DuckDB fragment matching :func:`h60` bit-for-bit."""
    return f"CAST(CONCAT('0x', SUBSTR(md5(CONCAT('{prefix}', {expr})), 1, 15)) AS BIGINT)"
