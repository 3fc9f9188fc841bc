"""Reference-parity query builder: scan / project / filter / agg / group-by.

Mirrors the reference's ``QueryExecutor`` config-then-execute API
(columnar-analytics-engine/include/execution.h:99-120) on top of the
DataFrame API, preserving the reference's semantics gotchas
(SURVEY.md §2.12):

  1. group-by output sorted ascending by key (src/execution.cpp:396-398)
  2. AggResult always carries count+sum+min+max (src/execution.cpp:296-334)
  3. COUNT counts surviving rows, never reads the agg column
     (src/execution.cpp:283-289)
  4. empty projection = all columns (src/execution.cpp:252-259)
  5. six comparison ops EQ NE LT LE GT GE (include/execution.h:39-46)
  6. conjunctive (AND) filter composition (src/execution.cpp:163-188)

Everything executes declaratively: Catalyst performs column pruning and
predicate pushdown (the reference's hand-coded Scanner skip loop,
src/execution.cpp:102-129, is parquet row-group pruning here), and hash
aggregation runs partial→shuffle→final instead of the reference's
single-thread single-pass loop — the same answers, but scale-out.

Deliberate supersets of the reference (documented, not bugs):
  - filters work on STRING and other non-int columns (the reference
    silently ignores string filters, src/execution.cpp:170-182);
  - NULL values follow Spark SQL semantics (the reference is null-free);
  - group-by supports multiple keys and multiple aggregate columns.
"""

from __future__ import annotations

import operator
from enum import Enum
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class CompareOp(Enum):
    """The reference's closed comparison enum (include/execution.h:39-46)."""

    EQ = "="
    NE = "!="
    LT = "<"
    LE = "<="
    GT = ">"
    GE = ">="


_OP_FUNCS = {
    CompareOp.EQ: operator.eq,
    CompareOp.NE: operator.ne,
    CompareOp.LT: operator.lt,
    CompareOp.LE: operator.le,
    CompareOp.GT: operator.gt,
    CompareOp.GE: operator.ge,
}


class AggFunc(Enum):
    """The reference's closed aggregate enum (include/execution.h:62-67)."""

    COUNT = "count"
    SUM = "sum"
    MIN = "min"
    MAX = "max"


class Query:
    """Config-then-execute query over one DataFrame.

    Shape mirrors QueryExecutor (include/execution.h:99-120): set the
    projection / filters / aggregation / group-by, then ``execute()``.
    Returns a DataFrame so callers compose further with native Spark.

    >>> q = (Query(df).set_projection(["id", "value"])
    ...               .add_filter("value", CompareOp.GT, 150))
    >>> q.execute()          # scan path (executeQuery)
    >>> Query(df).set_aggregation(AggFunc.SUM, "value").execute()
    >>> Query(df).set_group_by("category").set_aggregation(
    ...     AggFunc.SUM, "value").execute()
    """

    def __init__(self, df: DataFrame):
        self._df = df
        self._projection: list[str] = []
        self._filters: list[Column] = []
        self._agg_func: AggFunc | None = None
        self._agg_column: str | None = None
        self._group_by: list[str] = []

    # -- configuration (mirrors setProjection/addFilter/setAggregation/setGroupBy)

    def set_projection(self, columns: list[str]) -> "Query":
        """Empty list ⇒ all columns (src/execution.cpp:252-259)."""
        self._projection = list(columns)
        return self

    def add_filter(self, column: str, op: CompareOp | str, value: Any) -> "Query":
        """Conjunctive predicate ``column <op> value``.

        The reference restricts values to int64 literals and int columns
        (src/execution.cpp:23-46); any Spark-comparable type works here.
        """
        if isinstance(op, str):
            op = CompareOp(op)
        self._filters.append(_OP_FUNCS[op](F.col(column), F.lit(value)))
        return self

    def where(self, condition: Column) -> "Query":
        """Escape hatch: arbitrary boolean Column, ANDed with other filters."""
        self._filters.append(condition)
        return self

    def set_aggregation(self, func: AggFunc, column: str) -> "Query":
        self._agg_func = func
        self._agg_column = column
        return self

    def set_group_by(self, *columns: str) -> "Query":
        """Reference supports exactly one STRING group key
        (src/execution.cpp:367); multiple keys are a superset."""
        self._group_by = list(columns)
        return self

    # -- execution

    def _filtered(self) -> DataFrame:
        df = self._df
        for cond in self._filters:
            df = df.filter(cond)
        return df

    def _agg_exprs(self) -> list[Column]:
        """count+sum+min+max together, always (src/execution.cpp:296-334).

        COUNT counts surviving rows without touching the agg column
        (src/execution.cpp:283-289) — ``F.count("*")``.
        """
        col = self._agg_column
        return [
            F.count("*").alias("count"),
            F.sum(col).alias("sum"),
            F.min(col).alias("min"),
            F.max(col).alias("max"),
        ]

    def execute(self) -> DataFrame:
        df = self._filtered()
        if self._group_by:
            if self._agg_column is None:
                # COUNT-only mode scans just the group column
                # (src/execution.cpp:351-354): count(*) after pruning.
                out = df.groupBy(*self._group_by).agg(F.count("*").alias("count"))
            else:
                out = df.groupBy(*self._group_by).agg(*self._agg_exprs())
            # Deterministic key-ascending output (src/execution.cpp:396-398).
            return out.orderBy(*self._group_by)
        if self._agg_func is not None:
            if self._agg_column is None:
                raise ValueError("set_aggregation requires a column")
            return df.agg(*self._agg_exprs())
        # plain scan path (executeQuery, src/execution.cpp:251-273)
        if self._projection:
            df = df.select(*self._projection)
        return df
