"""Plan linting as a first-class API: flag the classic distributed
anti-patterns in a DataFrame's physical plan BEFORE running it.

The reference engine cannot mis-plan — its executor is a fixed scan loop
(src/execution.cpp).  On Spark the same query can silently compile to a
plan that is 100× worse at scale (a cartesian product from a missed join
condition, a row-at-a-time Python UDF from an implicit fallback, an
unbounded single-partition exchange from an unpartitioned window).
``lint_plan`` returns human-readable findings so pipelines can gate on
plan shape the way they gate on tests; tests/test_plan_lint.py sweeps it
over every registered query.

The checks are deliberately about SCALE CLASSES, not cost estimates:
each finding names something that changes complexity class at 100 TB,
never something a cluster can absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(
    df: DataFrame,
    max_single_partition: int = 1,
    forbid_python_udf: bool = True,
) -> list[str]:
    """Findings for scale anti-patterns in ``df``'s physical plan.

    Empty list = clean.  Checks:

    * ``CartesianProduct`` — O(n·m) pairwise blowup; at scale this is
      always a missing join key or a forgotten band/bucket key.
    * ``BatchEvalPython`` — row-at-a-time Python UDF: breaks whole-stage
      codegen and serializes per row (Arrow-batched ``ArrowEvalPython``
      / ``mapInPandas`` stages are fine and NOT flagged).
    * more than ``max_single_partition`` ``Exchange SinglePartition``
      stages — every such exchange funnels the stream through one task;
      one is normal (a 1-row global aggregate), repeats usually mean an
      unpartitioned window or sort over data-sized input.
    """
    plan = physical_plan(df)
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append(
            "CartesianProduct: pairwise join blowup — add a join/band key"
        )
    if forbid_python_udf and "BatchEvalPython" in plan:
        findings.append(
            "BatchEvalPython: row-at-a-time Python UDF — use built-ins or a pandas UDF"
        )
    n_single = plan.count("Exchange SinglePartition")
    if n_single > max_single_partition:
        findings.append(
            f"{n_single} single-partition exchanges (allow {max_single_partition}): "
            "unpartitioned window/sort funnels all data through one task"
        )
    return findings
