#!/usr/bin/env python
"""Round-14 optimization lab: isolated per-query timing + plan capture.

Usage:
  python scripts/perf_lab.py plans [query ...]   # capture explain("formatted")
  python scripts/perf_lab.py time  [query ...]   # bench-methodology isolated timing
  python scripts/perf_lab.py noop  [query ...]   # noop-sink timing (guide §1.4)

Timing mirrors bench.py exactly (same session factory, low_latency knob,
cache_scope isolation, untimed warm-up, best-of-3 count()) so numbers here
are comparable with BENCH artifacts; ``noop`` additionally times
``df.write.format("noop")`` which computes every column (no count pruning).
Plans go to plans/r14/<query>_<tag>.txt.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    BENCH_QUERIES,
    N_TIMED_RUNS,
    _cpu_probe_ms,
    _set_low_latency,
    _wait_until_quiet,
)
from columnar_analytics_engine_spark.functions.caching import cache_scope  # noqa: E402
from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.queries import all_queries  # noqa: E402


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    tag = os.environ.get("PERF_LAB_TAG", "before")
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if mode != "plans" and os.environ.get("PERF_LAB_QUIET", "1") == "1":
        la, ok = _wait_until_quiet(threshold=1.0, timeout_sec=900)
        print(f"quiet-gate: loadavg={la} reached={ok} probe={_cpu_probe_ms()}ms")
    spark = get_spark(app_name="cae-perf-lab")
    qs = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    results: dict[str, float] = {}
    for name in names:
        spec = qs[name]
        low_latency = BENCH_QUERIES.get(name, False)
        _set_low_latency(spark, low_latency)
        spark.sparkContext.setJobDescription(f"perf_lab:{name}")
        if mode == "plans":
            if spec.setup is not None:
                spec.setup(spark, sf_dir)
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
            print(f"{name}: plan -> plans/r14/{name}_{tag}.txt")
            continue
        with cache_scope():
            if spec.setup is not None:
                t0 = time.perf_counter()
                spec.setup(spark, sf_dir)
                print(f"{name}: setup {time.perf_counter() - t0:.3f}s")
            spec.fn(spark, sf_dir).count()  # warm-up, builds persist_once
            best = float("inf")
            for _ in range(N_TIMED_RUNS):
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                if mode == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    assert df.count() >= 0
                best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 4)
        print(f"{name}: {best:.4f}s  ({mode})")
    if results:
        import json

        print(
            json.dumps(
                {
                    "mode": mode,
                    "queries": results,
                    "sf_dir": sf_dir,
                    "probe_ms_end": _cpu_probe_ms(),
                }
            )
        )


if __name__ == "__main__":
    main()
