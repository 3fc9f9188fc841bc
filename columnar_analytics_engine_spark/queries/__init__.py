"""Query registry: every implemented operator as a named (Spark, oracle-SQL) pair.

Each entry maps a query name to a ``QuerySpec`` whose ``fn(spark, sf_dir)``
returns a DataFrame and whose ``sql`` (when set) is the ANSI-SQL equivalent a
DuckDB oracle runs on the same parquet tables.  Column names and value
determinism are contract: both sides alias every computed column identically,
and float aggregates use exact integer-scaled arithmetic (see
``queries._util``) so results hash-match bit-for-bit.
"""

from __future__ import annotations

from columnar_analytics_engine_spark.queries._util import QuerySpec
from columnar_analytics_engine_spark.queries import (
    advanced,
    core,
    events,
    llm,
    relational,
    tpch_more,
)


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for mod in (core, relational, advanced, tpch_more, llm, events):
        for name, spec in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = spec
    return out
