"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-
runnable ANSI-SQL equivalent for each (omitted only for operators whose
output depends on engine-internal structure, e.g. approximate ANN —
those get a rows-only check and are recall-tested in pytest instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from columnar_analytics_engine_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from columnar_analytics_engine_spark.queries.relational import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in all_queries().items() if spec.sql is not None
    }
