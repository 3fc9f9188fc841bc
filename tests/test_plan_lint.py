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
_SINGLE_PARTITION_ALLOW = {
    # distributed global rank: the only unpartitioned window runs over
    # the #partitions-row offsets table + the 1-row total
    "window_ntile_percent": 2,
    # ANALYZE-style profile: a union of per-column 1-row summaries
    "table_profile": 4,
    # per-stage funnel accounting: one 1-row count per pipeline stage
    "pipeline_attrition_report": 4,
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_plan_antipatterns(spark, sf_small, name):
    spec = all_queries()[name]
    plan = spec.fn(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    cap = _SINGLE_PARTITION_ALLOW.get(name, 1)
    n_single = plan.count("Exchange SinglePartition")
    assert n_single <= cap, (
        f"{name}: {n_single} single-partition exchanges (allow {cap})"
    )
