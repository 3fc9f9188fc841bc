"""Skew mitigation: salted joins for pathologically hot keys.

AQE's skew-join splitting (on by default in session.py) handles most
skew; salting is the explicit fallback for the worst case — a single
join key holding a double-digit percentage of all rows, where even a
split partition overwhelms one executor's shuffle fetch.

Mechanics: replicate the small side ``salt_factor`` times (one copy per
salt value), scatter the big side uniformly across salts, join on
(key, salt).  The hot key's rows now land on ``salt_factor`` reducers
instead of one.  Cost: small side grows ×salt_factor — keep the factor
modest (8–32) and the small side genuinely smaller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_factor: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted.

    Produces exactly the same rows as ``big.join(small, on, how)``; only
    the shuffle distribution changes.  Supported ``how``: inner/left.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    # deterministic scatter: hash the full row identity, not rand() —
    # keeps the operator reproducible (and testable) run to run
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor))
    big_salted = big.withColumn("_salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias("_salt")
    small_replicated = small.select("*", salts)
    joined = big_salted.join(
        small_replicated,
        [big_salted[on] == small_replicated[on], big_salted["_salt"] == small_replicated["_salt"]],
        how,
    )
    drop_cols = [small_replicated[on], big_salted["_salt"], small_replicated["_salt"]]
    for c in drop_cols:
        joined = joined.drop(c)
    return joined
