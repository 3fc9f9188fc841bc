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
