#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Mirrors the reference's 4-query benchmark (benches/benchmark.cpp:97-207
— full scan, filtered scan, global SUM, group-by SUM) on the driver's
lineitem table, plus headline extension queries (join, window, TPC-H Q1,
dedup, similarity) so scale regressions in any operator family show up
per round.

Methodology (reference: wall-clock around open+execute,
benchmark.cpp:27-40): one untimed warm-up run of each query (JVM/plan
warm-up — BASELINE.md's within-2× gate is measured warm), then the
timed run; prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.queries import all_queries  # noqa: E402

# Reference parity quartet + extension headliners.
BENCH_QUERIES = [
    "scan_full_count",      # reference Q1: full scan
    "filter_count",         # reference Q2: filtered scan
    "agg_global",           # reference Q3: global aggregate
    "agg_group_by",         # reference Q4: group-by aggregate
    "tpch_q1",              # flagship: wide agg
    "join_star_tpch_q5",    # multi-join star
    "window_topk_per_group",  # window
    "sort_limit_topk",      # top-k
    "dedup_minhash_lsh",    # LLM pipeline: MinHash+LSH dedup
    "similarity_topk",      # LLM pipeline: brute-force ANN
    "events_sessionization",  # time-series window
]


def run_query(spec, spark, sf_dir: str) -> float:
    start = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    n = df.count()  # force full execution
    elapsed = time.perf_counter() - start
    assert n >= 0
    return elapsed


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="cae-bench")
    qs = all_queries()

    # warm-up: JVM, code cache, parquet footers (untimed)
    for name in BENCH_QUERIES:
        qs[name].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        timings[name] = round(run_query(qs[name], spark, sf_dir), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
