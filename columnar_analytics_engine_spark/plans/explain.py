"""Physical-plan assertions — the 100 TB design checks, made testable.

The reference hard-codes its optimizations into the scan loop (zone-map
skipping src/execution.cpp:102-129, column pruning :136-157).  Spark
provides them via Catalyst, but silently NOT getting them (a filter that
stops being pushable, a join that stops broadcasting) is a 100×
regression at scale — so the properties are asserted in tests rather
than trusted.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the formatted plan shows PushedFilters containing every
    fragment (e.g. 'GreaterThan(l_quantity' ) — the zone-map/row-group
    pruning contract."""
    plan = formatted_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = ",".join(m)
    return all(frag in pushed for frag in fragments)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read from parquet (one list per scan) — the
    column-pruning contract."""
    plan = formatted_plan(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.split(",") if c.strip()]
        out.append(cols)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    """Check the *executed* plan: with AQE the final plan (and its
    WholeStageCodegen spans) only exists after an action."""
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages render as "WholeStageCodegen (n)" in formatted mode
    # and as "*(n) Operator" markers in the tree string
    return "WholeStageCodegen" in executed or "*(" in executed
