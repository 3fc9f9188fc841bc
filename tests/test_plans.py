"""Physical-plan property tests — the scale contract.

Correct rows are necessary, not sufficient: at 100 TB the plan shape IS
the product.  These assert the properties the reference hard-coded
(pushdown, pruning) and the ones Spark adds (broadcast, codegen,
TakeOrderedAndProject) stay present.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.io import read_table
from columnar_analytics_engine_spark.plans.explain import (
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    uses_whole_stage_codegen,
)
from columnar_analytics_engine_spark.queries.relational import (
    join_broadcast_inner,
    sort_limit_topk,
    tpch_q1,
)
from columnar_analytics_engine_spark.queries.core import filter_count, scan_projection


def test_filter_pushed_to_parquet(spark, sf_small):
    df = filter_count(spark, sf_small)
    assert has_pushed_filters(df, "GreaterThan(l_quantity"), formatted_plan(df)


def test_projection_prunes_columns(spark, sf_small):
    df = scan_projection(spark, sf_small)
    scans = read_schema_columns(df)
    assert scans, "no parquet scan found"
    assert set(scans[0]) == {"l_orderkey", "l_linenumber", "l_quantity"}


def test_q1_reads_only_needed_columns(spark, sf_small):
    df = tpch_q1(spark, sf_small)
    scans = read_schema_columns(df)
    # 7 columns used by Q1, out of lineitem's 11
    assert set(scans[0]) == {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }


def test_dim_join_broadcasts(spark, sf_small):
    df = join_broadcast_inner(spark, sf_small)
    assert uses_broadcast_join(df), formatted_plan(df)


def test_topk_plans_take_ordered(spark, sf_small):
    df = sort_limit_topk(spark, sf_small)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_scan_agg_uses_codegen(spark, sf_small):
    df = read_table(spark, sf_small, "lineitem").groupBy("l_returnflag").agg(
        F.sum("l_quantity")
    )
    assert uses_whole_stage_codegen(df)


def test_q5_star_join_all_dims_broadcast(spark, sf_small):
    from columnar_analytics_engine_spark.queries.relational import join_star_tpch_q5

    plan = formatted_plan(join_star_tpch_q5(spark, sf_small))
    # every dimension side broadcasts; the fact table never sort-merge shuffles
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_hash_not_nested_loop(spark, sf_small):
    from columnar_analytics_engine_spark.queries.events import events_range_join

    plan = formatted_plan(events_range_join(spark, sf_small))
    # bucketization turns the time-range join into equi hash joins
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_window_based(spark, sf_small):
    from columnar_analytics_engine_spark.queries.events import events_asof_join

    plan = formatted_plan(events_asof_join(spark, sf_small))
    assert "Window" in plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_embedding_near_dup_is_distributed(spark, sf_small):
    # the all-pairs cosine kernel must run as a grouped block product on
    # executors — never a driver-side collect of the embedding table
    from columnar_analytics_engine_spark.queries.llm import dedup_embedding_cosine

    plan = formatted_plan(dedup_embedding_cosine(spark, sf_small))
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan


def test_ivf_seed_selection_is_take_ordered(spark, sf_small):
    # seed selection must plan as TakeOrderedAndProject (per-partition
    # top-n), not a global single-partition window over all candidates
    from columnar_analytics_engine_spark.queries.llm import similarity_ivf_topk

    plan = formatted_plan(similarity_ivf_topk(spark, sf_small))
    assert "TakeOrderedAndProject" in plan, plan
    # every Window node must be partitioned: its Arguments line is
    # "[exprs], [partition cols], [order cols]" — an empty partition
    # list ("], [], [") means a single-partition global window
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if line.strip().startswith("(") and line.strip().endswith(" Window"):
            args = next(
                l for l in lines[i:] if l.strip().startswith("Arguments")
            )
            assert "], [], [" not in args, f"unpartitioned window: {args}"


def test_no_query_plans_cartesian_or_global_window(spark, sf_small):
    """Whole-surface plan gate: no query may plan a CartesianProduct or
    an unpartitioned (single-partition) Window over its data.  The
    BroadcastNestedLoopJoins that remain are all 1-row/tiny-broadcast
    count joins or deliberately-broadcast brute-force baselines."""
    from columnar_analytics_engine_spark.queries import all_queries

    bad = []
    for name, spec in all_queries().items():
        plan = spec.fn(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            bad.append((name, "cartesian"))
        for line in plan.splitlines():
            if "windowspecdefinition" in line and "], [], [" in line:
                bad.append((name, "global-window"))
                break
    assert not bad, bad


def test_funnel_windowed_single_scan(spark, sf_small):
    """events_funnel_windowed must stay one-scan/one-window-shuffle:
    a regression to the chained-join form reads events once per stage."""
    from columnar_analytics_engine_spark.queries.advanced import (
        events_funnel_windowed,
    )

    plan = (
        events_funnel_windowed(spark, sf_small)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") <= 2


def test_join_strategy_hints_control_physical_plan(spark, sf_small):
    """Join-strategy hints give per-query physical control when the
    size-based default picks wrong (a skewed dim that must not
    broadcast, a pre-sorted pair that should merge): each hint compiles
    to its operator."""
    orders = read_table(spark, sf_small, "orders")
    customer = read_table(spark, sf_small, "customer")
    cond = orders["o_custkey"] == customer["c_custkey"]

    merged = orders.join(customer.hint("merge"), cond)
    assert "SortMergeJoin" in formatted_plan(merged)

    hashed = orders.join(customer.hint("shuffle_hash"), cond)
    p = formatted_plan(hashed)
    assert "ShuffledHashJoin" in p and "SortMergeJoin" not in p

    bcast = orders.join(customer.hint("broadcast"), cond)
    assert "BroadcastHashJoin" in formatted_plan(bcast)


def test_evolved_read_prunes_columns_per_cohort(spark, tmp_path):
    """Column pruning pushes through the evolved union: a cohort that
    physically LACKS the added column scans only the requested real
    columns (the default is a synthesized literal, zero I/O), while the
    cohort that carries it reads exactly (id, score)."""
    import re

    from columnar_analytics_engine_spark.evolution import (
        add_column,
        read_evolved,
    )
    from columnar_analytics_engine_spark.skipping import (
        build_stats_index,
        update_stats_index,
    )

    data = str(tmp_path / "d")
    index = str(tmp_path / "i")
    df = spark.createDataFrame(
        [(i, i * 10, f"u{i}") for i in range(1000)],
        "id bigint, amount int, name string",
    )
    df.coalesce(2).write.parquet(data)
    build_stats_index(spark, data, index)
    add_column(spark, data, index, "score", "double", default=1.0)
    df2 = spark.createDataFrame(
        [(i, i, "x", 2.0) for i in range(1000, 1500)],
        "id bigint, amount int, name string, score double",
    )
    df2.coalesce(1).write.mode("append").parquet(data)
    update_stats_index(spark, data, index)

    plan = (
        read_evolved(spark, data, index)
        .select("id", "score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    schemas = sorted(re.findall(r"ReadSchema: (\S+)", plan))
    assert schemas == [
        "struct<id:bigint,score:double>",
        "struct<id:bigint>",
    ], plan
