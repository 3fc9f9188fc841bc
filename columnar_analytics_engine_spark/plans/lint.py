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


def _iter_physical_nodes(root):
    """Yield every node of a physical plan that would EXECUTE, exactly
    once, independent of cache materialization state.

    Three traversal rules make warm and cold plans walk identically:

    * ``AdaptiveSparkPlanExec`` is a leaf wrapper — descend into its
      current plan (``executedPlan``; equals the initial plan for a
      never-executed frame, which is the only state the lint sweep sees).
    * ``*QueryStageExec`` wrappers (present only after AQE has started
      executing) are unwrapped to the plan they run.
    * ``InMemoryTableScan`` is yielded but NOT entered: its stored build
      plan hangs off ``innerChildren``, which ``children()`` already
      excludes — the cache is read, not recomputed.  This is the bug the
      old string-based count had: ``toString`` renders innerChildren, so
      a materialized cache double-counted its build plan's exchanges.
    """
    stack = [root]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls.startswith("AdaptiveSparkPlan"):
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        yield node
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


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
    branch's copy without stopping the recompute).

    ADVISORY severity: Spark's ``ReuseExchange`` rule deduplicates
    identical shuffle/broadcast exchanges across the whole physical
    plan, so the shuffles BELOW a duplicated join are typically computed
    once and only the join operator (and any map-side work above the
    reused exchanges) re-runs.  A finding means "this plan re-executes
    join work it could share", not "total cost doubles" — still worth
    fixing (the containment verify's join re-run alone made it ~2×
    slower), but judge accordingly.  Fix for a true positive: compute
    once and stack the branches with ``inline``/``explode``, or persist
    the shared frame.

    Only MAXIMAL duplicated join subtrees are reported: a duplicated
    outer join necessarily duplicates every join nested inside it, and
    reporting those too would inflate one duplicate into N findings.
    """
    root = df._jdf.queryExecution().withCachedData()
    counts: Counter[str] = Counter()
    stack = [root]
    while stack:
        node = stack.pop()
        if "Join" in node.nodeName():
            counts[_normalize_subtree(node)] += 1
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        # InMemoryRelation is a leaf here: its cached physical plan
        # hangs off innerChildren, which we deliberately do not enter
    # second pass: report a duplicated join, then skip its descendants
    # so nested joins inside an already-reported duplicate stay silent
    findings: list[str] = []
    seen: set[str] = set()
    stack = [root]
    while stack:
        node = stack.pop()
        if "Join" in node.nodeName():
            key = _normalize_subtree(node)
            if counts[key] > 1:
                if key not in seen:
                    seen.add(key)
                    findings.append(
                        f"{node.nodeName()} subtree executed {counts[key]}x"
                    )
                continue  # maximal: don't descend into a duplicate
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return findings


_EXPENSIVE_NODES = ("Join", "Window", "Aggregate", "Sort")


def duplicate_expensive_subtrees(df: DataFrame) -> list[str]:
    """ADVISORY generalization of :func:`duplicate_join_subtrees` to
    every shuffle-bearing node class (Join, Window, Aggregate, Sort):
    maximal subtrees that appear normalized-identically more than once
    in the analyzed plan, each executing separately.

    This catches the class the join-only gate misses — e.g. an exact
    dedup window feeding both a signature build and an anti-join
    (pipeline_clean_corpus before round 8), or a (token, label) count
    table consumed by three model stages (the NB classifier).  It is
    NOT a test gate: duplicated 1-row aggregates over tiny inputs
    (lazy totals, per-class constants) are common and benign — a
    finding is worth acting on when the duplicated subtree scans
    data-sized input, which the caller must judge.  Fix for a true
    positive: ``persist_once`` the shared frame, or restructure so one
    pass feeds all consumers.
    """
    root = df._jdf.queryExecution().withCachedData()
    counts: Counter[str] = Counter()
    stack = [root]
    while stack:
        node = stack.pop()
        if any(k in node.nodeName() for k in _EXPENSIVE_NODES):
            counts[_normalize_subtree(node)] += 1
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    findings: list[str] = []
    seen: set[str] = set()
    stack = [root]
    while stack:
        node = stack.pop()
        if any(k in node.nodeName() for k in _EXPENSIVE_NODES):
            key = _normalize_subtree(node)
            if counts[key] > 1:
                if key not in seen:
                    seen.add(key)
                    findings.append(
                        f"{node.nodeName()} subtree executed {counts[key]}x"
                    )
                continue  # maximal: don't descend into a duplicate
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return findings


# Physical nodes through which a downstream limit does NOT bound the
# rows reaching an ancestor: joins can multiply (a LIMIT on one input
# says nothing about the output), Union adds the other branches,
# Generate (explode/posexplode/inline) fans each row out, Expand
# (grouping sets / count-distinct rewrites) replicates rows.
_ROW_MULTIPLIERS = ("Join", "CartesianProduct", "Union", "Generate", "Expand")

# Limit nodes that bound TOTAL row count: GlobalLimit / CollectLimit /
# TakeOrderedAndProject.  LocalLimit is per-PARTITION (k x #partitions
# rows) and WindowGroupLimit per-GROUP — neither proves a global
# window's single task sees <= k rows, so neither counts (ADVICE r10).
_GLOBAL_LIMIT_PREFIXES = ("GlobalLimit", "CollectLimit", "TakeOrdered")


def _min_direct_limit(root) -> int | None:
    """Smallest total-row-bounding limit on the DIRECT input path below
    ``root``: descent stops at any row-multiplying node, because a
    limit beyond a join/union/generate does not bound the rows flowing
    above it."""
    best = None
    stack = [root]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls.startswith("AdaptiveSparkPlan"):
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        nm = node.nodeName()
        if nm.startswith(_GLOBAL_LIMIT_PREFIXES):
            try:
                k = int(node.limit())
            except Exception:
                k = None
            if k is not None:
                best = k if best is None else min(best, k)
                continue  # everything below is already bounded by k
        if any(m in nm for m in _ROW_MULTIPLIERS):
            continue
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return best


def global_windows(df: DataFrame) -> list[dict]:
    """Every unpartitioned Window in the executed plan, with the
    machine-extracted evidence that it is bounded: the smallest
    total-row-bounding LIMIT (GlobalLimit / CollectLimit /
    TakeOrderedAndProject — never the per-partition LocalLimit or
    per-group WindowGroupLimit) on the window's DIRECT input path
    (descent stops at joins/unions/generates, which can re-multiply
    rows above a limit), or ``None`` when no limit bounds it.

    An unpartitioned window funnels its whole input through one task —
    fatal on data-sized input, harmless on a ≤k-row top-k frame.  The
    distinction is decidable from the plan: a ``.limit(k)`` ancestor
    compiles to a limit node BELOW the window, so ``bound=k`` proves
    the single task sees ≤k rows no matter the corpus size
    (finding type ``bounded-global-window``).  Windows bounded by
    cluster topology instead (#partitions-row offset tables in the
    distributed-rank/CDF queries) carry no plan-level limit and need a
    documented allowance (tests/test_plan_lint.py) — VERDICT r9 item 8.
    """
    out: list[dict] = []
    root = df._jdf.queryExecution().executedPlan()
    for node in _iter_physical_nodes(root):
        if node.nodeName() != "Window":
            continue
        try:
            if not node.partitionSpec().isEmpty():
                continue
        except Exception:
            continue  # non-WindowExec lookalike without partitionSpec
        bound = None
        ch = node.children()
        for i in range(ch.size()):
            b = _min_direct_limit(ch.apply(i))
            if b is not None:
                bound = b if bound is None else min(bound, b)
        out.append({
            "node": _ID_RE.sub("#x", node.simpleString(10)),
            "bound": bound,
        })
    return out


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

    Counting walks the physical-plan TREE (``_iter_physical_nodes``),
    never the string render: the render embeds cached
    ``InMemoryRelation`` build plans, so string counts depended on
    whether a ``persist_once`` frame had materialized yet.  Tree counts
    are identical cold and warm (tests/test_plan_lint.py regression).
    """
    root = df._jdf.queryExecution().executedPlan()
    findings: list[str] = []
    n_cartesian = n_python = n_single = 0
    for node in _iter_physical_nodes(root):
        name = node.nodeName()
        if "CartesianProduct" in name:
            n_cartesian += 1
        elif "BatchEvalPython" in name:
            n_python += 1
        elif name == "Exchange" and "SinglePartition" in node.simpleString(10):
            n_single += 1
    if n_cartesian:
        findings.append(
            "CartesianProduct: pairwise join blowup — add a join/band key"
        )
    if forbid_python_udf and n_python:
        findings.append(
            "BatchEvalPython: row-at-a-time Python UDF — use built-ins or a pandas UDF"
        )
    if n_single > max_single_partition:
        findings.append(
            f"{n_single} single-partition exchanges (allow {max_single_partition}): "
            "unpartitioned window/sort funnels all data through one task"
        )
    return findings
