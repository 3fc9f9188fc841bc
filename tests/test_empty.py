"""Every query must run (not crash) on EMPTY input tables.

At 100 TB, empty inputs are routine — a fresh stream, an empty shard, a
filter that matched nothing upstream — and an operator that throws on
zero rows takes the whole pipeline down.  This sweep runs the entire
registry against empty (schema-preserving) copies of every table.
"""

from __future__ import annotations

import pytest

from columnar_analytics_engine_spark.io import TABLE_NAMES, read_table
from columnar_analytics_engine_spark.queries import all_queries

QUERIES = all_queries()


@pytest.fixture(scope="module")
def empty_sf(spark, sf_small, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLE_NAMES:
        read_table(spark, sf_small, t).limit(0).write.parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf, name):
    assert QUERIES[name].fn(spark, empty_sf).count() >= 0
