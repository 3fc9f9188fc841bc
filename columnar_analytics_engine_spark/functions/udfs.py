"""User-defined function surface: pandas UDFs, grouped maps, UDTFs.

The reference has no user-extensible functions (SURVEY §2.10 — the
closed AggFunc/CompareOp enums are its whole registry).  Spark's UDF
tiers, demonstrated here with real operators:

  * ``zscore`` — scalar pandas UDF (Arrow-vectorized, ~10-100× faster
    than row-at-a-time Python; still slower than built-ins, so the
    built-in twin is what queries use — the UDF exists to cover the
    extension surface and as the template for logic SQL can't express).
  * ``normalize_group`` — applyInPandas grouped map (per-group pandas
    frame in/out).
  * ``ChunkText`` — Python UDTF (table function: one row in, N rows
    out) for overlapping text chunking; the built-in twin
    (sequence+explode+substring) is what the oracle-checked query uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_zscore():
    """Factory for the batch-local z-score pandas UDF (built lazily:
    UDF registration parses DDL and needs an active SparkSession, so no
    module-level UDF objects).  For a global z-score use the built-in
    (x - avg) / stddev over a window; this demonstrates the vectorized
    scalar-UDF shape."""

    @F.pandas_udf("double")
    def zscore(v: pd.Series) -> pd.Series:
        std = v.std(ddof=0)
        if std == 0 or pd.isna(std):
            return pd.Series([0.0] * len(v))
        return (v - v.mean()) / std

    return zscore


def normalize_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Grouped-map UDF: min-max normalize ``value`` within each key
    group (applyInPandas; one shuffle on the key)."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[value].min(), pdf[value].max()
        rng = (hi - lo) or 1.0
        return pdf.assign(normalized=(pdf[value] - lo) / rng)

    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, normalized double"
    return df.groupBy(key).applyInPandas(norm, schema=schema)


def chunk_text_builtin(df: DataFrame, text_col: str = "text", chunk_chars: int = 200, overlap: int = 50) -> DataFrame:
    """Overlapping text chunking with pure built-ins — the scalable
    form (sequence + explode + substring, all codegen).  Chunks start
    every (chunk_chars - overlap) characters."""
    step = chunk_chars - overlap
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(step)).cast("int")
    )
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    return df.select("doc_id", F.col(text_col), idx).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.substring(F.col(text_col), F.col("chunk_id") * step + 1, chunk_chars).alias("chunk"),
    )


def make_chunk_udtf(chunk_chars: int = 200, overlap: int = 50):
    """Python UDTF twin of :func:`chunk_text_builtin` (SURVEY §2.10
    UDTF surface).  Registered per-session:

        spark.udtf.register("chunk_text", make_chunk_udtf())
        spark.sql("SELECT c.* FROM documents, LATERAL chunk_text(doc_id, text) c")
    """
    from pyspark.sql.functions import udtf

    step = chunk_chars - overlap

    @udtf(returnType="doc_id: bigint, chunk_id: bigint, chunk: string")
    class ChunkText:
        def eval(self, doc_id: int, text: str):  # noqa: D102
            if text is None:
                return
            n = max(1, -(-(len(text) - overlap) // step))
            for i in range(n):
                yield doc_id, i, text[i * step : i * step + chunk_chars]

    return ChunkText
