"""Plan lint: every registered query's physical plan is swept for the
classic distributed anti-patterns.  This is the automated version of the
manual `.explain` audit — a new operator that sneaks in a cartesian
product, a row-at-a-time Python UDF, or an unbounded single-partition
stage fails here before it ships.

Allowlisted single-partition exchanges are the benign kind: 1-row final
aggregates and windows over #partitions-row tables (bounded by cluster
size, not data size — each is documented at its definition site).
"""

from __future__ import annotations

import pytest

from columnar_analytics_engine_spark.queries import all_queries

# name -> max tolerated "Exchange SinglePartition" occurrences, with the
# reason.  Everything else gets at most ONE (a global 1-row aggregate).
# Calibrated round 8 against the tree-walking lint (plans/lint.py
# _iter_physical_nodes), whose counts are cache-state-independent and
# exclude subquery renders — exact observed counts, no slack.
_SINGLE_PARTITION_ALLOW = {
    # distributed global rank: the only unpartitioned window runs over
    # the #partitions-row offsets table + the 1-row total
    "window_ntile_percent": 2,
    # time travel: a union of TWO 1-row snapshot aggregates (as-of and
    # current) + the 2-row final sort — every single-partition stage is
    # post-aggregate
    "layout_time_travel_scan": 3,
    # TIMESTAMP AS OF twin: same union-of-two-1-row-snapshots shape
    "layout_time_travel_ts": 3,
    # spec evolution: a union of TWO 1-row scan aggregates (full and
    # pruned) — same post-aggregate shape as time travel
    "layout_spec_evolution_scan": 2,
    # branching: a union of TWO 1-row branch aggregates (source and
    # branch) — same post-aggregate shape
    "layout_branch_divergence": 2,
    # ANALYZE-style profile: a union of per-column 1-row summaries
    "table_profile": 4,
    # per-stage funnel accounting: 1-row counts per pipeline stage
    "pipeline_attrition_report": 2,
    # precision/recall meta-report: 1-row pair counts joined
    "dedup_lsh_quality_report": 3,
    # drift report: token totals + final KL reduce — every
    # single-partition stage is a 1-row aggregate
    "corpus_drift_report": 2,
    # DQ report: one 1-row aggregate per validated table (orders,
    # lineitem), combined by broadcast join
    "dq_validation_report": 2,
    # chi-square: the 1-row totals broadcast + the final 1-row reduce —
    # both fed by the tiny contingency table (|langs|·|sources| rows)
    "stats_chi_square": 2,
    # KS test: the #partitions-row offsets cumsum + the 1-row totals
    # broadcast + the final 1-row max-reduce (distributed-CDF shape,
    # same class as window_ntile_percent)
    "stats_ks_test": 3,
    # triangle census: three 1-row reduces (triangles, edges,
    # nodes+wedges) combined by broadcast join
    "graph_triangle_count": 3,
    # PMI: two 1-row lazy totals (unigram + bigram) broadcast in-plan
    "text_collocations_pmi": 2,
    # Zipf fit: the #partitions-row offsets cumsum + the final 1-row
    # sufficient-stats reduce (distributed-rank shape)
    "text_zipf_fit": 2,
    # Mann-Whitney U: offsets cumsum + 1-row totals broadcast + final
    # 1-row rank-sum reduce (same distributed-CDF shape as stats_ks_test)
    "stats_mann_whitney_u": 3,
    # LSH tuning curve: one 1-row reduce per banding config (4), all
    # over the single persisted pair list
    "dedup_lsh_tuning_curve": 4,
    # Pareto/Gini: the gini 1-row reduce + the <=10-row decile cumsum
    # (rank assembly is behind an eager localCheckpoint)
    "customers_revenue_pareto": 2,
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_plan_antipatterns(spark, sf_small, name):
    from columnar_analytics_engine_spark.plans.lint import lint_plan

    spec = all_queries()[name]
    cap = _SINGLE_PARTITION_ALLOW.get(name, 1)
    findings = lint_plan(spec.fn(spark, sf_small), max_single_partition=cap)
    assert findings == [], f"{name}: {findings}"


# Queries whose plans contain an unpartitioned Window with NO plan-level
# limit bound — each bounded by cluster topology (a #partitions-row
# offsets table from a distributed-rank/CDF cumsum) or by a fixed tiny
# domain, never by corpus size.  name -> (max such windows, reason).
# Every OTHER global window in the registry must carry a plan-provable
# LIMIT bound ≤ _GLOBAL_WINDOW_K (lint.global_windows: finding type
# bounded-global-window) — so a WindowExec "No Partition Defined"
# warning in a bench tail is machine-justified, not reviewer judgment.
_GLOBAL_WINDOW_ALLOW = {
    # distributed global rank: cumsum over the #partitions-row offsets
    "window_ntile_percent": (1, "offsets table, #partitions rows"),
    "text_zipf_fit": (1, "offsets cumsum, #partitions rows"),
    "stats_ks_test": (1, "offsets cumsum, #partitions rows"),
    "stats_mann_whitney_u": (1, "offsets cumsum, #partitions rows"),
    # decile table cumsum: 10 rows by construction (ntile(10) distinct)
    "customers_revenue_pareto": (1, "decile table, <=10 rows"),
    # histogram cumsum + total: |bins| rows, bounded by the value
    # domain / bin width, never by corpus size
    "approx_quantile_histogram": (2, "fixed-width histogram bin table"),
    # running sums over the per-day table: bounded by the calendar
    "events_user_growth": (1, "day table, ~30 rows"),
    "orders_backlog_over_time": (1, "day table, calendar-bounded"),
}

_GLOBAL_WINDOW_K = 1000  # a plan-level limit at/below this proves the
                         # single window task sees a constant-size input


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_global_windows_bounded(spark, sf_small, name):
    """Every unpartitioned Window in every registered plan is either
    plan-provably limit-bounded (bounded-global-window: a LIMIT <= k in
    its child subtree) or allowlisted with a topology-bound reason.
    This is the machine justification for the WindowExec warnings in
    bench tails (VERDICT r9 item 8)."""
    from columnar_analytics_engine_spark.plans.lint import global_windows

    spec = all_queries()[name]
    wins = global_windows(spec.fn(spark, sf_small))
    unbounded = [w for w in wins if w["bound"] is None or w["bound"] > _GLOBAL_WINDOW_K]
    cap = _GLOBAL_WINDOW_ALLOW.get(name, (0, ""))[0]
    assert len(unbounded) <= cap, f"{name}: unexplained global windows {unbounded}"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_duplicate_join_subtrees(spark, sf_small, name):
    """No registered plan executes the same join subtree twice (the
    union-of-filters recompute class that made the containment verify
    2x slower — see plans/lint.duplicate_join_subtrees)."""
    from columnar_analytics_engine_spark.plans.lint import duplicate_join_subtrees

    spec = all_queries()[name]
    dups = duplicate_join_subtrees(spec.fn(spark, sf_small))
    assert dups == [], f"{name}: {dups}"


def test_duplicate_join_subtree_detection(spark):
    """The detector catches a branched unpersisted join and stays quiet
    on single-execution and cached plans."""
    from columnar_analytics_engine_spark.plans.lint import duplicate_join_subtrees
    from pyspark.sql import functions as F

    a = spark.range(100).withColumn("k", F.col("id") % 10)
    b = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    joined = a.join(b, "k")
    # two filters unioned over the same unpersisted join: executes twice
    branched = joined.filter("id % 2 = 0").union(joined.filter("id % 2 = 1"))
    assert duplicate_join_subtrees(branched), "branched join not flagged"
    # single execution: clean
    assert duplicate_join_subtrees(joined.filter("id % 2 = 0")) == []
    # persisted shared subtree: branches read the cache, clean
    cached = joined.persist()
    try:
        branched_cached = cached.filter("id % 2 = 0").union(
            cached.filter("id % 2 = 1")
        )
        assert duplicate_join_subtrees(branched_cached) == []
    finally:
        cached.unpersist()


def test_duplicate_expensive_subtree_detection(spark):
    """The advisory generalized detector flags a branched unpersisted
    window/aggregate and stays quiet once the shared frame is cached."""
    from columnar_analytics_engine_spark.plans.lint import (
        duplicate_expensive_subtrees,
    )
    from pyspark.sql import Window, functions as F

    base = spark.range(1000).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 10).orderBy("id"))
    )
    branched = base.filter("rn = 1").union(base.filter("rn = 2"))
    found = duplicate_expensive_subtrees(branched)
    assert any("Window" in f for f in found), found
    # single consumer: clean
    assert duplicate_expensive_subtrees(base.filter("rn = 1")) == []
    # persisted shared frame: branches read the cache, clean
    cached = base.persist()
    try:
        assert duplicate_expensive_subtrees(
            cached.filter("rn = 1").union(cached.filter("rn = 2"))
        ) == []
    finally:
        cached.unpersist()


def test_lint_counts_are_cache_state_independent(spark, sf_small):
    """Round-7 regression: the string-based single-partition count
    included the cached InMemoryRelation's stored build plan once a
    persist_once frame materialized, so the same query linted clean
    cold and dirty warm.  The tree-walking lint must return identical
    findings before and after cache materialization — checked on a
    synthetic persist_once plan and on the query that exposed the bug."""
    from columnar_analytics_engine_spark.functions.caching import persist_once
    from columnar_analytics_engine_spark.plans.lint import lint_plan
    from columnar_analytics_engine_spark.queries import all_queries
    from pyspark.sql import Window, functions as F

    # synthetic: a persisted frame whose BUILD plan contains a
    # single-partition window — must not be re-counted once cached
    base = spark.range(1000).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    cached = persist_once(base)
    try:
        q = cached.groupBy((F.col("rn") % 7).alias("k")).count()
        cold = lint_plan(q, max_single_partition=0)
        cached.count()  # materialize
        warm = lint_plan(
            cached.groupBy((F.col("rn") % 7).alias("k")).count(),
            max_single_partition=0,
        )
        assert cold == warm, f"cold={cold} warm={warm}"
    finally:
        cached.unpersist()

    # the real query that exposed the bug in round 7
    spec = all_queries()["customers_rfm_segments"]
    df = spec.fn(spark, sf_small)
    cold = lint_plan(df, max_single_partition=0)
    df.count()
    warm = lint_plan(spec.fn(spark, sf_small), max_single_partition=0)
    assert cold == warm, f"cold={cold} warm={warm}"


def test_lint_plan_flags_known_antipatterns(spark):
    """The lint API itself must catch each anti-pattern class."""
    from columnar_analytics_engine_spark.plans.lint import lint_plan
    from pyspark.sql import Window, functions as F

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    # a small side broadcasts into BroadcastNestedLoopJoin; disable it so
    # the non-equi join compiles to the CartesianProduct it is at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cartesian = a.join(b, F.col("id") < F.col("id2"))
        assert any("CartesianProduct" in f for f in lint_plan(cartesian))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    row_udf = a.withColumn("u", F.udf(lambda x: x + 1, "long")(F.col("id")))
    assert any("BatchEvalPython" in f for f in lint_plan(row_udf))

    global_window = a.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert any("single-partition" in f for f in lint_plan(global_window, max_single_partition=0))

    assert lint_plan(a.groupBy((F.col("id") % 2).alias("k")).count()) == []


def test_global_window_limit_proof_direct_path_only(spark):
    """The boundedness proof accepts a total-row limit directly below
    the window, and REJECTS a limit sitting under a row-multiplying
    join (k rows joined against m rows is k*m, not k) — ADVICE r10."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from columnar_analytics_engine_spark.plans.lint import global_windows

    w = W.orderBy("id")
    direct = spark.range(1000).limit(7).withColumn(
        "r", F.row_number().over(w)
    )
    wins = global_windows(direct)
    assert wins and wins[0]["bound"] == 7

    multiplied = (
        spark.range(1000)
        .limit(7)
        .join(spark.range(50).withColumnRenamed("id", "j"))
        .withColumn("r", F.row_number().over(w))
    )
    wins = global_windows(multiplied)
    assert wins and wins[0]["bound"] is None  # 7x50 rows, not 7
