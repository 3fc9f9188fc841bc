"""Dtype contract between every oracle SQL string and its Spark query.

The driver's value hash is type-strict, so a DuckDB column that comes
back HUGEINT (rendered float64 by ``fetchdf``) against a Spark BIGINT
hash-mismatches even when all values are equal — the round-6 failure
class.  This test catches that at authoring time, cheaply:

* DuckDB side: ``DESCRIBE (<sql>)`` gives the result column types
  without executing the query body over data.
* Spark side: ``spec.fn(spark, sf).schema`` is lazy — no job runs.

Only the numeric family is enforced (int vs float vs bool); temporal
and string/object kinds are compared value-wise by the oracle sweep
(pandas renders them through ``object`` inconsistently across
versions).  ``test_strict_compare_repro`` pins the comparator itself:
an int64-vs-float64 column of equal values MUST fail ``compare``.
"""

from __future__ import annotations

import pytest

from columnar_analytics_engine_spark.compare import (
    _dtype_mismatch,
    oracle_connection,
)
from columnar_analytics_engine_spark.queries import all_queries

QUERIES = all_queries()
ORACLE_NAMES = [n for n, s in QUERIES.items() if s.sql is not None]

# DuckDB type name -> kind group.  HUGEINT deliberately maps to
# "float": fetchdf renders it float64, which is what the driver hashes.
_DUCK_GROUPS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "float", "UHUGEINT": "float",
    "FLOAT": "float", "DOUBLE": "float",
    "BOOLEAN": "bool",
}

_SPARK_GROUPS = {
    "byte": "int", "short": "int", "int": "int", "integer": "int",
    "long": "int", "bigint": "int",
    "float": "float", "double": "float",
    "boolean": "bool",
}


def _duck_group(type_name: str) -> str | None:
    base = type_name.split("(")[0].strip().upper()
    if base.startswith("DECIMAL"):
        return "float"
    return _DUCK_GROUPS.get(base)


def _spark_group(type_name: str) -> str | None:
    base = type_name.split("(")[0].strip().lower()
    if base.startswith("decimal"):
        return "float"
    return _SPARK_GROUPS.get(base)


@pytest.fixture(scope="module")
def con(sf_small):
    c = oracle_connection(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_dtype_contract(spark, sf_small, con, name):
    spec = QUERIES[name]
    duck = con.execute(f"DESCRIBE ({spec.sql})").fetchall()
    duck_types = {row[0]: row[1] for row in duck}
    spark_types = {
        f.name: f.dataType.simpleString() for f in spec.fn(spark, sf_small).schema
    }
    assert sorted(duck_types) == sorted(spark_types), (
        f"column names differ: duck={sorted(duck_types)} spark={sorted(spark_types)}"
    )
    bad = []
    for col, dt in duck_types.items():
        dg, sg = _duck_group(dt), _spark_group(spark_types[col])
        if dg is not None and sg is not None and dg != sg:
            bad.append(f"{col}: duck {dt} ({dg}) vs spark {spark_types[col]} ({sg})")
    assert not bad, (
        "oracle/Spark numeric dtype drift (driver hash is type-strict; "
        "CAST the oracle column): " + "; ".join(bad)
    )


def test_strict_compare_repro():
    """int64 vs float64 of equal values MUST be flagged (round-6 class)."""
    import pandas as pd

    issue = _dtype_mismatch(
        pd.Series([1, 2, 3], dtype="int64"), pd.Series([1.0, 2.0, 3.0])
    )
    assert issue is not None and "type-strict" in issue
    assert _dtype_mismatch(
        pd.Series([1, 2], dtype="int64"), pd.Series([1, 2], dtype="int64")
    ) is None
    assert _dtype_mismatch(
        pd.Series([1, 2], dtype="int32"), pd.Series([1, 2], dtype="int64")
    ) is None
