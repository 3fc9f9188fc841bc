"""DuckDB-oracle comparison harness (mirrors the driver's t2 gate).

Runs a Spark DataFrame and its oracle SQL over the same parquet tables,
then compares row count, column names, and values (order-insensitive,
exact — including float bit-equality, which the exact-arithmetic query
style guarantees).  Used by tests/test_oracle.py before the driver ever
sees the queries.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

from columnar_analytics_engine_spark.io import TABLE_NAMES, table_path


def oracle_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for issue in self.issues:
            msg += f"\n    - {issue}"
        return msg


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def _dtype_mismatch(s: pd.Series, o: pd.Series) -> str | None:
    """Driver-parity numeric type strictness.

    The driver's value hash is type-strict: a Spark int64 column hashed
    against a DuckDB HUGEINT rendered as float64 mismatches even when
    every value is numerically equal (the round-6 failure class).  The
    in-repo gate therefore fails whenever one side is integral and the
    other floating, independent of the values.  Kinds outside the
    numeric family keep the lenient per-value comparison (pandas
    renders dates/strings through ``object`` inconsistently across
    versions, and the driver normalizes those).
    """
    ks, ko = s.dtype.kind, o.dtype.kind
    ks = "i" if ks == "u" else ks
    ko = "i" if ko == "u" else ko
    if {ks, ko} == {"i", "f"}:
        return (
            f"numeric dtype mismatch: spark={s.dtype} oracle={o.dtype} "
            "(driver hash is type-strict; CAST the oracle column, e.g. "
            "HUGEINT window-sums need CAST(... AS BIGINT))"
        )
    if {ks, ko} == {"i", "b"} or {ks, ko} == {"f", "b"}:
        return f"numeric/bool dtype mismatch: spark={s.dtype} oracle={o.dtype}"
    return None


def _values_equal(a: object, b: object) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: DataFrame, sql: str, con) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = con.execute(sql).fetchdf()
    res = CompareResult(name, True, len(spark_pdf), len(oracle_pdf))

    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        res.ok = False
        res.issues.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.issues.append("row count mismatch")
        return res

    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for col in s.columns:
        issue = _dtype_mismatch(s[col], o[col])
        if issue:
            res.ok = False
            res.issues.append(f"col={col}: {issue}")
    if not res.ok:
        return res
    n_bad = 0
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b):
                n_bad += 1
                if n_bad <= 3:
                    res.issues.append(f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}")
    if n_bad:
        res.ok = False
        res.issues.append(f"total mismatched cells: {n_bad}")
    return res
