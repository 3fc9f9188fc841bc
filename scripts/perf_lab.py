#!/usr/bin/env python
"""Optimization lab: isolated per-query timing + plan capture.

Usage:
  python scripts/perf_lab.py plans [query ...]   # capture explain("formatted")
  python scripts/perf_lab.py time  [query ...]   # bench-methodology isolated timing
  python scripts/perf_lab.py noop  [query ...]   # noop-sink timing (guide §1.4)
  python scripts/perf_lab.py cold  [query ...]   # cache-cold single run + warm best-of-3

Timing mirrors bench.py exactly (same session factory, low_latency knob,
cache_scope isolation, untimed warm-up, best-of-3 count()) so numbers here
are comparable with BENCH artifacts; ``noop`` additionally times
``df.write.format("noop")`` which computes every column (no count pruning).

``cold`` (VERDICT r14 item 2) reports BOTH temperatures per query: the
first execution inside a fresh ``cache_scope`` (which PAYS for building
every ``persist_once`` entry — the cost bench.py's untimed warm-up
absorbs) and the warm best-of-3 that matches the bench methodology.
Future persist decisions must cite the cold number: a persist that only
moves real work into the warm-up is caching, not optimization.

Plans go to plans/r15/<query>_<tag>.txt (tag from $PERF_LAB_TAG, default
"before").
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

MODES = ("plans", "time", "noop", "cold")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode not in MODES:
        # an unrecognized first arg is almost certainly a query name —
        # refuse instead of silently reinterpreting it (ADVICE r14)
        raise SystemExit(f"unknown mode {mode!r}; expected one of {MODES}")
    tag = os.environ.get("PERF_LAB_TAG", "before")
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if mode != "plans" and os.environ.get("PERF_LAB_QUIET", "1") == "1":
        la, ok = _wait_until_quiet(threshold=1.0, timeout_sec=900)
        print(f"quiet-gate: loadavg={la} reached={ok} probe={_cpu_probe_ms()}ms")
    spark = get_spark(app_name="cae-perf-lab")
    qs = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    results: dict[str, float] = {}
    cold_results: dict[str, float] = {}
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
            print(f"{name}: plan -> plans/r15/{name}_{tag}.txt")
            continue
        with cache_scope():
            if spec.setup is not None:
                t0 = time.perf_counter()
                spec.setup(spark, sf_dir)
                print(f"{name}: setup {time.perf_counter() - t0:.3f}s")
            t0 = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()  # warm-up, builds persist_once
            cold = time.perf_counter() - t0
            if n < 0:
                raise AssertionError(f"{name}: negative count")
            best = float("inf")
            for _ in range(N_TIMED_RUNS):
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                if mode == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    n = df.count()
                    if n < 0:
                        raise AssertionError(f"{name}: negative count")
                best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 4)
        if mode == "cold":
            cold_results[name] = round(cold, 4)
            print(f"{name}: cold={cold:.4f}s warm_best3={best:.4f}s")
        else:
            print(f"{name}: {best:.4f}s  ({mode})")
    if results:
        import json

        out = {
            "mode": mode,
            "queries": results,
            "sf_dir": sf_dir,
            "probe_ms_end": _cpu_probe_ms(),
        }
        if cold_results:
            out["queries_cold"] = cold_results
        print(json.dumps(out))


if __name__ == "__main__":
    main()
