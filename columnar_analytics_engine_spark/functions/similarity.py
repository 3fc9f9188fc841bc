"""Vector similarity primitives over ``array<float>`` embedding columns.

Pure built-in array expressions (``zip_with`` + ``aggregate``) — the dot
product runs inside whole-stage codegen, no Python involved.  Elements
are cast to double before multiplication so the arithmetic matches the
DuckDB oracle; cosine values are rounded to 4 decimals to absorb the
(≤1e-14) summation-order difference between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def squared_norm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column, sq_norm_a: Column, sq_norm_b: Column, decimals: int = 4) -> Column:
    """Rounded cosine similarity given precomputed squared norms."""
    return F.round(dot(a, b) / (F.sqrt(sq_norm_a) * F.sqrt(sq_norm_b)), decimals)


def with_norms(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Project to (… , v: array<double>, sq_norm) — the normalized scan
    every similarity operator starts from.  Computing norms once at scan
    time halves the per-pair work downstream."""
    v = as_double_array(F.col(vec_col))
    return embeddings.withColumn("v", v).withColumn("sq_norm", squared_norm(F.col("v")))
