"""Every oracle-checked query must match DuckDB exactly at sf0.001.

This mirrors the driver's t2 correctness gate (which runs at sf0.01);
keeping it in-repo means a regression is caught at commit time.
"""

from __future__ import annotations

import pytest

from columnar_analytics_engine_spark.compare import compare, oracle_connection
from columnar_analytics_engine_spark.queries import all_queries

QUERIES = all_queries()
ORACLE_NAMES = [n for n, s in QUERIES.items() if s.sql is not None]


@pytest.fixture(scope="module")
def con(sf_small):
    c = oracle_connection(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_small, con, name):
    spec = QUERIES[name]
    result = compare(name, spec.fn(spark, sf_small), spec.sql, con)
    assert result.ok, str(result)


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if s.sql is None])
def test_rows_only_queries_run(spark, sf_small, name):
    df = QUERIES[name].fn(spark, sf_small)
    assert df.count() >= 0
