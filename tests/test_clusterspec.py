"""Cluster-spec evolution (clusterspec.py): spec history, per-cohort
file assignment, per-cohort depth, lazy convergence, skip-rate on the
new cohort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.clusterspec import (
    active_cluster_spec,
    cohort_cluster_report,
    file_cohorts,
    read_spec_history,
    set_cluster_spec,
)
from columnar_analytics_engine_spark.io import read_table, write_sorted
from columnar_analytics_engine_spark.layout import cluster_compact
from columnar_analytics_engine_spark.manifest import current_version
from columnar_analytics_engine_spark.skipping import (
    build_stats_index,
    plan_skipping,
    read_indexed,
)


@pytest.fixture()
def evolved(spark, sf_small, tmp_path):
    """orders clustered on o_custkey (spec 0), spec switched to
    o_orderkey, one bounded compaction under the new spec."""
    data = str(tmp_path / "data")
    index = str(tmp_path / "idx")
    src = read_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_sorted(src, data, ["o_custkey"], n_files=8)
    build_stats_index(spark, data, index)
    set_cluster_spec(index, ["o_custkey"], since_version=0)
    set_cluster_spec(index, ["o_orderkey"])
    # small target so the rewrite yields several orderkey-disjoint
    # files (the new cohort must be multi-file for the pruning test)
    out = cluster_compact(
        spark, data, index, max_files=4, target_file_bytes=2 * 1024
    )
    assert out["rewritten"] > 0 and out["new_files"] >= 2
    return data, index, src


def test_spec_history_and_active(spark, evolved):
    _data, index, _src = evolved
    hist = read_spec_history(index)
    assert [e["cols"] for e in hist] == [["o_custkey"], ["o_orderkey"]]
    assert hist[0]["since_version"] == 0
    assert active_cluster_spec(index)["cols"] == ["o_orderkey"]
    # history must stay ordered
    with pytest.raises(ValueError, match="ordered"):
        set_cluster_spec(index, ["o_totalprice"], since_version=0)


def test_cohort_assignment_tracks_first_appearance(spark, evolved):
    _data, index, _src = evolved
    rows = file_cohorts(spark, index).collect()
    by_spec: dict[int, int] = {}
    for r in rows:
        by_spec[r["spec_idx"]] = by_spec.get(r["spec_idx"], 0) + 1
    # both cohorts exist: un-rewritten v1 files under spec 0, the
    # compaction's new files under spec 1
    assert by_spec.get(0, 0) > 0 and by_spec.get(1, 0) > 0
    # rewritten files appeared at a version above the switch point
    switch = read_spec_history(index)[1]["since_version"]
    for r in rows:
        if r["spec_idx"] == 1:
            assert r["first_version"] > switch


def test_per_cohort_depth_scores_each_spec_on_its_columns(spark, evolved):
    _data, index, _src = evolved
    rep = {
        (r["spec_idx"], r["probe_col"]): r["avg_depth"]
        for r in cohort_cluster_report(spark, index).collect()
    }
    # each cohort is well-clustered on ITS OWN column (near-disjoint
    # ranges; sorted writes give depth close to 1)
    assert rep[(0, "o_custkey")] <= 2.0, rep
    assert rep[(1, "o_orderkey")] <= 2.0, rep


def test_new_cohort_prunes_on_new_spec_column(spark, evolved):
    """Skip-rate parity on the new cohort: a point-range query on the
    NEW spec's column must prune the new cohort's files (they cover
    narrow o_orderkey ranges)."""
    _data, index, src = evolved
    cohorts = {r["file"]: r["spec_idx"] for r in file_cohorts(spark, index).collect()}
    new_files = {f for f, s in cohorts.items() if s == 1}
    assert len(new_files) >= 2
    lo = src.agg(F.min("o_orderkey")).first()[0]
    plan = plan_skipping(spark, index, f"o_orderkey le {lo + 10}")
    kept_new = [f for f in plan["files"] if f in new_files]
    # at most one of the new cohort's (orderkey-disjoint) files holds
    # the bottom of the key range
    assert len(kept_new) <= 1
    assert plan["files_pruned"] > 0


def test_reads_exact_across_cohorts(spark, evolved):
    data, index, src = evolved
    got = read_indexed(spark, data, index).agg(
        F.count("*"), F.sum("o_orderkey"), F.sum("o_custkey")
    ).first()
    want = src.agg(
        F.count("*"), F.sum("o_orderkey"), F.sum("o_custkey")
    ).first()
    assert tuple(got) == tuple(want)
