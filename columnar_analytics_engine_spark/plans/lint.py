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

import re
from collections import Counter

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_ID_RE = re.compile(r"#\d+L?|plan_id=\d+|\[id=#?\d+\]|exprId=\d+")


def _normalize_subtree(node) -> str:
    """Subtree string with expression/plan ids stripped, so two builds
    of the same logical subtree compare equal."""
    return _ID_RE.sub("#x", node.toString())


def duplicate_join_subtrees(df: DataFrame) -> list[str]:
    """Join subtrees that appear (normalized-)identically more than
    once in the plan — each duplicate EXECUTES separately.

    This is the union-of-filters recompute class: branching a DataFrame
    (``direction_a.union(direction_b)``) recomputes every unpersisted
    ancestor per branch, silently doubling the most expensive stage
    (the containment verify shipped 2× slower this way).

    Detection runs on ``withCachedData`` — the analyzed plan AFTER
    cache substitution but BEFORE the optimizer: cached shared subtrees
    already render as ``InMemoryRelation`` leaves (not flagged; the
    cache is the fix), while filter/column pushdown has not yet rewritten
    the branches into superficially-different physical subtrees (which
    hides exactly the duplicates this hunts — pushdown specializes each
    branch's copy without stopping the recompute).  Spark's own reuse
    machinery (``ReusedExchange``) only deduplicates shuffle/broadcast
    exchanges within one stage graph, not whole logical subtrees.
    Fix for a true positive: compute once and stack the branches with
    ``inline``/``explode``, or persist the shared frame.
    """
    root = df._jdf.queryExecution().withCachedData()
    counts: Counter[str] = Counter()
    names: dict[str, str] = {}
    stack = [root]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if "Join" in name:
            key = _normalize_subtree(node)
            counts[key] += 1
            names[key] = name
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        # InMemoryRelation is a leaf here: its cached physical plan
        # hangs off innerChildren, which we deliberately do not enter
    return [
        f"{names[k]} subtree executed {c}x"
        for k, c in counts.items()
        if c > 1
    ]


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
