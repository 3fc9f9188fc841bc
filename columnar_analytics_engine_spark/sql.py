"""SQL API route: the same capabilities via ``spark.sql`` over temp views.

The blueprint (SURVEY §7.1) calls for both a DataFrame query-builder
(ops.py) and a SQL route — Catalyst compiles both to identical plans;
this module is the catalog plumbing that makes the SQL route one call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from columnar_analytics_engine_spark.io import TABLE_NAMES, load_tables


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register every fixture table in ``sf_dir`` as a temp view and run
    ``query`` against them — mirrors the DuckDB oracle's view setup, so
    any oracle SQL in ``queries/`` (modulo engine dialect) also runs
    here."""
    load_tables(spark, sf_dir, TABLE_NAMES)
    return spark.sql(query)
