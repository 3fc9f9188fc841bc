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


# -- affine k-family: k hashes from ONE md5 -----------------------------------
#
# MinHash needs k ≈ 32 independent hashes per term.  k separate md5 calls
# cost k digests per *vocabulary term* — harmless on a toy vocab, real
# money when the vocabulary is billions of shingles.  Instead: one md5,
# split into two independent 60-bit halves x1/x2, then k affine maps
#
#     h_i = ((a_i·x1) mod p + (b_i·x2) mod p + i) mod p,   p = 2^31 − 1
#
# (a two-point universal family).  All intermediates stay < 2^62, so the
# arithmetic is exact int64 on both engines and the DuckDB oracle
# reproduces it bit-for-bit.  The a/b constants are fixed pseudorandom
# ints — part of the operator definition, identical in the SQL twin.

P31 = 2_147_483_647  # 2^31 − 1 (Mersenne prime)

import random as _random

_rng = _random.Random(0xC0FFEE)
MINHASH_A = [_rng.randrange(1, P31) for _ in range(64)]
MINHASH_B = [_rng.randrange(1, P31) for _ in range(64)]
del _rng


def affine_hash_cols(col: Column, k: int) -> list[Column]:
    """k int32-range hash Columns of a string column from one md5."""
    d = F.md5(col)
    x1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("long") % F.lit(P31)
    x2 = F.conv(F.substring(d, 16, 15), 16, 10).cast("long") % F.lit(P31)
    return [
        (
            ((F.lit(MINHASH_A[i]) * x1) % F.lit(P31))
            + ((F.lit(MINHASH_B[i]) * x2) % F.lit(P31))
            + F.lit(i)
        )
        % F.lit(P31)
        for i in range(k)
    ]


def sql_affine_hash(expr: str, k: int) -> list[str]:
    """DuckDB fragments matching :func:`affine_hash_cols` bit-for-bit."""
    x1 = f"(CAST(CONCAT('0x', SUBSTR(md5({expr}), 1, 15)) AS BIGINT) % {P31})"
    x2 = f"(CAST(CONCAT('0x', SUBSTR(md5({expr}), 16, 15)) AS BIGINT) % {P31})"
    return [
        f"((({MINHASH_A[i]} * {x1}) % {P31}) + (({MINHASH_B[i]} * {x2}) % {P31}) + {i}) % {P31}"
        for i in range(k)
    ]
