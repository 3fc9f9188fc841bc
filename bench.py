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

from columnar_analytics_engine_spark.functions.caching import cache_scope  # noqa: E402
from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.queries import all_queries  # noqa: E402

# Reference parity quartet + extension headliners.  low_latency queries
# produce tiny results from a single scan: AQE's runtime re-planning and
# multi-partition shuffles cost more than they save there, so they run
# with AQE off and one shuffle partition (the same per-workload knob a
# production deployment sets for interactive point queries; the heavy
# pipeline queries keep AQE for skew/coalesce handling).
BENCH_QUERIES: dict[str, bool] = {
    "scan_full_count": True,       # reference Q1: full scan
    "filter_count": True,          # reference Q2: filtered scan
    "agg_global": True,            # reference Q3: global aggregate
    "agg_group_by": True,          # reference Q4: group-by aggregate
    "tpch_q1": True,               # flagship: wide agg
    "join_star_tpch_q5": False,    # multi-join star
    "window_topk_per_group": False,  # window
    "sort_limit_topk": True,       # top-k
    "dedup_minhash_lsh": False,    # LLM pipeline: MinHash+LSH dedup
    "dedup_minhash_probe": False,  # batch vs persisted band index (warm-up builds it)
    "similarity_topk": False,      # LLM pipeline: brute-force ANN
    "events_sessionization": False,  # time-series window
    "pipeline_clean_corpus": False,  # composed end-to-end cleaning pass
    "contamination_ngram_overlap": False,  # broadcast-bench shingle screen
    "kmeans_embeddings": False,    # iterative distributed clustering
    "dedup_duplicate_passages": False,  # exact-substring inverted index
    "similarity_ivfpq_topk": False,  # IVF-PQ probe + ADC scan (replay path)
    "similarity_ivfpq_probe": False,  # IVF-PQ from the persisted index (warm-up builds it)
    "dedup_cdc_chunks": False,     # content-defined chunking dedup
    "quality_gopher_rules": False,  # scan-speed quality rules
    "events_funnel_windowed": False,  # single-shuffle windowed funnel
    "sketch_heavy_hitters": False,  # count-min sketch build + probe
    # round-6 additions (BASELINE.md "Round-6 headline measurements").
    "approx_quantile_by_group": False,  # mergeable grouped quantile sketch
    "retrieval_hybrid_rrf": False,  # BM25 + vector rank fusion
    # round-7: back in the headline after the single-pass verify
    # rewrite (12.7 s -> ~5 s; the sf0.1 corpus still yields 7.6M LSH
    # candidates to verify — details in BASELINE.md "Round-7")
    "dedup_containment_lsh": False,  # LSH-candidate containment verify
    # round-6 second-session additions (new cost classes; BASELINE.md)
    "classifier_nb_confusion": False,  # trained NB classifier: vocab join + argmax
    "dedup_passage_removal": False,  # keep-one-copy text rewrite
    # round-11 additions (layout/skipping tier; BASELINE.md "Layout ×
    # skip-rate probe") — both time the WHOLE operation including the
    # clustered write + index build, the honest cost of the layer
    "layout_clustering_depth": False,  # linear-vs-zorder depth metric
    "skipping_dynamic_join": False,  # clustered write + index + file-pruned join
}

N_TIMED_RUNS = 3  # warm steady-state: best of 3 (reference methodology
                  # times a warm single run; min-of-3 removes scheduler jitter)

# Healthy single-thread cpu_probe_ms on this host class (observed
# 120-160 ms idle across rounds; see BASELINE.md "Normalization").
# value_normalized = value * HEALTHY_PROBE_MS / cpu_probe_ms rescales a
# degraded-host artifact to healthy-host terms so a kernel-time-storm
# round is machine-readably discounted instead of reading as a 2x plan
# regression (VERDICT r9 item 2).
HEALTHY_PROBE_MS = 130.0

# Rescale ONLY on a degraded host (probe slower than this): r11 showed
# the ratio over-correcting on fast-probe windows (normalized total
# moved OPPOSITE to raw time).  On a healthy-or-fast box the raw number
# IS the comparable number; normalization exists to discount kernel-
# time storms, not to inflate quiet rounds (VERDICT r11 item 2).
PROBE_DEGRADED_MS = 160.0


def _norm_factor(probe_ms: float) -> float:
    return HEALTHY_PROBE_MS / probe_ms if probe_ms > PROBE_DEGRADED_MS else 1.0

# A query whose min sample differs >3x between the two interleaved
# suite passes was inside a host slowdown window for one whole pass;
# its min is still reported, but the name lands in storm_flags so a
# reader knows that single number was storm-adjacent.
STORM_RATIO = 3.0


def _loadavg() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def _wait_until_quiet(
    threshold: float = 1.0, timeout_sec: float = 600, poll_sec: float = 10
) -> tuple[float | None, bool]:
    """Block until the 1-min load average drops below ``threshold`` (an
    idle box — bench deltas of ±30% on sub-second queries are pure
    ambient load otherwise) or ``timeout_sec`` elapses.  Returns (final
    loadavg, reached_quiet) so the artifact records WHICH state the
    numbers were taken in instead of leaving it to forensics."""
    deadline = time.time() + timeout_sec
    la = _loadavg()
    while la is not None and la >= threshold and time.time() < deadline:
        time.sleep(poll_sec)
        la = _loadavg()
    return la, (la is not None and la < threshold)


def _cpu_probe_ms() -> float:
    """Single-thread CPU speed self-calibration: wall ms for a fixed
    2M-iteration Python arithmetic loop, best of 3.  The shared host's
    effective single-core speed swings 1.5-3x between rounds (steal /
    oversubscription), which dwarfs any real plan regression on
    sub-second queries — embedding the probe makes every bench artifact
    machine-normalizable (divide query timings by probe ratio) without
    access to the box."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i * i
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def _membw_probe_gbps() -> float:
    """Memory-BANDWIDTH self-calibration: GB/s for a 200 MB numpy copy
    (read + write), best of 3.  The r11→r12 'uniform ambient drift'
    episode showed the cpu probe's blind spot: a co-tenant saturating
    the memory bus slows every scan-shaped query 1.2-2.5x while the
    2M-iteration arithmetic loop (L1-resident) still reads 'healthy'.
    Recording bandwidth alongside cpu speed makes that state
    machine-distinguishable in the artifact: plan regression (probes
    healthy, one query moved) vs bus contention (membw low, everything
    moved together)."""
    import numpy as np

    a = np.ones(200_000_000 // 8, dtype=np.float64)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        b = a.copy()
        dt = time.perf_counter() - t0
        best = max(best, (a.nbytes * 2) / dt / 1e9)
        del b
    return round(best, 1)


def _bench_conditions(extra: dict | None = None) -> dict:
    """Measurement-condition block embedded in every bench JSON line:
    a regression must be distinguishable from a busy box without
    re-running (VERDICT r7 item 3)."""
    cond = {
        "loadavg_start": _loadavg(),
        "runs": N_TIMED_RUNS,
        "warmup": True,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "cpu_probe_ms": _cpu_probe_ms(),
        "membw_gbps": _membw_probe_gbps(),
    }
    if extra:
        cond.update(extra)
    return cond


def _set_low_latency(spark, on: bool) -> None:
    spark.conf.set("spark.sql.adaptive.enabled", "false" if on else "true")
    spark.conf.set("spark.sql.shuffle.partitions", "1" if on else "32")


def _bench_layout(df, num_rows: int):
    """Size-matched file layout for the synthetic parity table: ~250k
    rows (~1.5 MB) per file, capped at 32.  A 1M-row table split 32
    ways gives 32 sub-ms scan tasks whose scheduling overhead dominates
    the queries (measured: 32 files ≈ 1.5× the wall time of 4); ~250k
    rows/task keeps task runtime well above dispatch cost.  This is the
    local-scale expression of the same sizing rule the session applies
    at 100 TB via spark.sql.files.maxPartitionBytes (128 MB splits)."""
    return df.coalesce(max(1, min(32, num_rows // 250_000)))


def run_query(spec, spark, sf_dir: str) -> float:
    # one untimed warm-up: Janino codegen compile + C2 JIT of the wide
    # expressions (the rolling-hash queries pay ~5 s on first execution)
    # must not land in any timed sample — best-of-3 after a cold start
    # still records the cold number when the box adds its own noise
    assert spec.fn(spark, sf_dir).count() >= 0
    best = float("inf")
    for _ in range(N_TIMED_RUNS):
        start = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        n = df.count()  # force full execution
        best = min(best, time.perf_counter() - start)
        assert n >= 0
    return best


def reference_parity_bench(num_rows: int = 1_000_000, seed: int = 42) -> None:
    """The reference's own benchmark (benches/benchmark.cpp:97-207): a
    1M-row synthetic table (id, value 0..100000, score 1..10, region×8,
    seed 42) and its four queries, measured warm.  Prints one JSON line
    comparable with BASELINE.md's published single-thread numbers."""
    import tempfile

    from pyspark.sql import functions as F

    from columnar_analytics_engine_spark.sources.synthetic import bench_table
    from columnar_analytics_engine_spark.io import write_table

    quiet: tuple[float | None, bool] | None = None
    if "--until-quiet" in sys.argv:
        quiet = _wait_until_quiet()
    spark = get_spark(app_name="cae-bench-ref")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/bench.parquet"
        write_table(_bench_layout(bench_table(spark, num_rows, seed=seed), num_rows), path)
        df = spark.read.parquet(path)

        bench_queries = {
            # Q1 full scan (runFullScan, benchmark.cpp:97-124)
            "full_scan": lambda: df.count(),
            # Q2 filtered scan value > 50000 (runFilteredScan, :126-153)
            "filtered_scan": lambda: df.filter(F.col("value") > 50_000).count(),
            # Q3 SUM(value) (runAggregation, :155-177)
            "aggregation": lambda: df.agg(
                F.sum("value").alias("s"), F.count("*").alias("n")
            ).collect(),
            # Q4 GROUP BY region SUM(value) (runGroupBy, :179-207)
            "group_by": lambda: df.groupBy("region")
            .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
            .orderBy("region")
            .collect(),
        }
        _set_low_latency(spark, True)
        # 8 warm-up rounds: C2 keeps re-tiering these sub-100ms plans
        # well past the 3rd execution (measured round 8: 3 warm-ups
        # floor at ~0.40 s total, 8 warm-ups at ~0.31 s on identical
        # code — the delta is JIT state, not query cost)
        for _ in range(8):
            for fn in bench_queries.values():
                fn()
        # sub-second queries under a noisy box need many samples for a
        # stable minimum; they're cheap, so take best-of-10 — in TWO
        # interleaved passes: the host's multi-minute slowdown windows
        # (see BASELINE.md round-9 record) cover 10 consecutive samples
        # of one query, but rarely the same query in both passes
        timings: dict[str, float] = {}
        pass_best: list[dict[str, float]] = [{}, {}]
        for _pass in range(2):
            for name, fn in bench_queries.items():
                best = float("inf")
                for _ in range(5):
                    start = time.perf_counter()
                    fn()
                    best = min(best, time.perf_counter() - start)
                pass_best[_pass][name] = round(best, 4)
                timings[name] = round(min(timings.get(name, best), best), 4)
        _set_low_latency(spark, False)
        cond = _bench_conditions(
            {"runs": 10, "warmup_rounds": 8, "passes": 2, "loadavg_end": _loadavg()}
        )
        cond["cpu_probe_ms_end"] = _cpu_probe_ms()
        cond["membw_gbps_end"] = _membw_probe_gbps()
        if quiet is not None:
            cond["until_quiet"] = {"loadavg": quiet[0], "reached_quiet": quiet[1]}
        total = round(sum(timings.values()), 4)
        probe = min(cond["cpu_probe_ms"], cond["cpu_probe_ms_end"])
        storm_flags = sorted(
            n for n in timings
            if min(pass_best[0][n], pass_best[1][n]) > 0
            and max(pass_best[0][n], pass_best[1][n])
            / min(pass_best[0][n], pass_best[1][n]) > STORM_RATIO
        )
        print(
            json.dumps(
                {
                    "metric": "reference_parity_total_sec",
                    "value": total,
                    "unit": "sec",
                    "value_normalized": round(total * _norm_factor(probe), 4),
                    "storm_flags": storm_flags,
                    "queries": timings,
                    "rows": num_rows,
                    "seed": seed,
                    "conditions": cond,
                }
            )
        )


def _bench_quartet(spark, df, num_rows: int, n_bytes: int) -> list[dict]:
    """The reference's 4 benchmark queries, measured warm (best-of-3),
    emitted in the reference's result shape (benchmark.cpp:233-276):
    name / elapsed_ms / rows_processed / bytes_processed /
    throughput_mbps / rows_per_sec."""
    from pyspark.sql import functions as F

    queries = {
        "Full Table Scan": lambda: df.count(),
        "Filtered Scan (value > 50000)": lambda: df.filter(
            F.col("value") > 50_000
        ).count(),
        "Aggregation (SUM value)": lambda: df.agg(
            F.sum("value").alias("s"), F.count("*").alias("n")
        ).collect(),
        "GROUP BY region": lambda: df.groupBy("region")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .orderBy("region")
        .collect(),
    }
    results = []
    _set_low_latency(spark, True)
    for fn in queries.values():  # warm-up
        fn()
    for name, fn in queries.items():
        best = float("inf")
        for _ in range(N_TIMED_RUNS):
            start = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - start)
        elapsed_ms = best * 1000.0
        results.append(
            {
                "name": name,
                "elapsed_ms": round(elapsed_ms, 3),
                "rows_processed": num_rows,
                "bytes_processed": n_bytes,
                "throughput_mbps": round(n_bytes / 1e6 / best, 2),
                "rows_per_sec": round(num_rows / best, 1),
            }
        )
    _set_low_latency(spark, False)
    return results


def _write_results_files(results: list[dict], out_dir: str, tag: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"benchmark_results_{tag}.json"), "w") as fh:
        json.dump({"benchmarks": results}, fh, indent=2)
    cols = [
        "benchmark", "elapsed_ms", "rows_processed", "bytes_processed",
        "throughput_mbps", "rows_per_sec",
    ]
    with open(os.path.join(out_dir, f"benchmark_results_{tag}.csv"), "w") as fh:
        fh.write(",".join(cols) + "\n")
        for r in results:
            fh.write(
                f"{r['name']},{r['elapsed_ms']},{r['rows_processed']},"
                f"{r['bytes_processed']},{r['throughput_mbps']},{r['rows_per_sec']}\n"
            )


def _svg_scalability_chart(all_results: dict[int, list[dict]], path: str) -> None:
    """Dependency-free SVG twin of the reference's scalability plot
    (benches/run_multiple_benchmarks.py): rows/sec per query vs size."""
    sizes = sorted(all_results)
    names = [r["name"] for r in all_results[sizes[0]]]
    colors = ["#2c7fb8", "#7fcdbb", "#f03b20", "#756bb1"]
    w, h, pad = 720, 420, 60
    series = {
        n: [all_results[s][i]["rows_per_sec"] / 1e6 for s in sizes]
        for i, n in enumerate(names)
    }
    y_max = max(max(v) for v in series.values()) * 1.1 or 1.0
    x_of = lambda i: pad + i * (w - 2 * pad) / max(1, len(sizes) - 1)
    y_of = lambda v: h - pad - v / y_max * (h - 2 * pad)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'font-family="sans-serif" font-size="11">',
        f'<rect width="{w}" height="{h}" fill="white"/>',
        f'<text x="{w/2}" y="20" text-anchor="middle" font-size="14">'
        f"Scalability: processing speed vs dataset size</text>",
        f'<line x1="{pad}" y1="{h-pad}" x2="{w-pad}" y2="{h-pad}" stroke="#333"/>',
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{h-pad}" stroke="#333"/>',
        f'<text x="{w/2}" y="{h-12}" text-anchor="middle">rows</text>',
        f'<text x="14" y="{h/2}" text-anchor="middle" '
        f'transform="rotate(-90 14 {h/2})">M rows/s</text>',
    ]
    for i, s in enumerate(sizes):
        parts.append(
            f'<text x="{x_of(i)}" y="{h-pad+16}" text-anchor="middle">{s:,}</text>'
        )
    for t in range(5):
        v = y_max * t / 4
        parts.append(
            f'<text x="{pad-6}" y="{y_of(v)+4}" text-anchor="end">{v:.0f}</text>'
        )
    for k, (n, vals) in enumerate(series.items()):
        pts = " ".join(f"{x_of(i):.1f},{y_of(v):.1f}" for i, v in enumerate(vals))
        c = colors[k % len(colors)]
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="{c}" stroke-width="2"/>'
        )
        for i, v in enumerate(vals):
            parts.append(f'<circle cx="{x_of(i):.1f}" cy="{y_of(v):.1f}" r="3" fill="{c}"/>')
        parts.append(
            f'<text x="{pad+8}" y="{pad + 14*k}" fill="{c}">{n}</text>'
        )
    parts.append("</svg>")
    with open(path, "w") as fh:
        fh.write("\n".join(parts))


def _png_scalability_chart(all_results: dict[int, list[dict]], path: str) -> bool:
    """matplotlib PNG twin (the reference's visualize_results.py shape);
    returns False when matplotlib is not installed (SVG is authoritative
    in this container)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    sizes = sorted(all_results)
    names = [r["name"] for r in all_results[sizes[0]]]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))
    for i, n in enumerate(names):
        ax1.plot(sizes, [all_results[s][i]["throughput_mbps"] for s in sizes], marker="o", label=n)
        ax2.plot(sizes, [all_results[s][i]["rows_per_sec"] / 1e6 for s in sizes], marker="o", label=n)
    ax1.set_xlabel("rows"); ax1.set_ylabel("MB/s"); ax1.set_title("Throughput"); ax1.legend(); ax1.grid(alpha=0.3)
    ax2.set_xlabel("rows"); ax2.set_ylabel("M rows/s"); ax2.set_title("Processing speed"); ax2.legend(); ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return True


def multi_size_bench(sizes: list[int], out_dir: str, seed: int = 42) -> None:
    """Multi-size sweep twin of the reference's
    benches/run_multiple_benchmarks.py: run the quartet at each size,
    export per-size JSON+CSV in the reference's schema, a combined
    scalability.json, and a chart (SVG always; PNG when matplotlib
    exists)."""
    import tempfile

    from columnar_analytics_engine_spark.sources.synthetic import bench_table
    from columnar_analytics_engine_spark.io import write_table

    spark = get_spark(app_name="cae-bench-sweep")
    all_results: dict[int, list[dict]] = {}
    for num_rows in sizes:
        with tempfile.TemporaryDirectory() as tmp:
            path = f"{tmp}/bench_{num_rows}.parquet"
            write_table(_bench_layout(bench_table(spark, num_rows, seed=seed), num_rows), path)
            n_bytes = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _d, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
            df = spark.read.parquet(path)
            all_results[num_rows] = _bench_quartet(spark, df, num_rows, n_bytes)
            _write_results_files(all_results[num_rows], out_dir, str(num_rows))
            print(f"sized {num_rows}: " + json.dumps(all_results[num_rows]))
    with open(os.path.join(out_dir, "scalability.json"), "w") as fh:
        json.dump(
            {"sizes": sorted(all_results), "results": {str(k): v for k, v in all_results.items()}},
            fh,
            indent=2,
        )
    _svg_scalability_chart(all_results, os.path.join(out_dir, "scalability.svg"))
    if _png_scalability_chart(all_results, os.path.join(out_dir, "scalability.png")):
        print(f"wrote {out_dir}/scalability.png")
    print(f"wrote {out_dir}/scalability.svg + per-size JSON/CSV")


def main() -> None:
    if "--reference" in sys.argv:
        reference_parity_bench()
        return
    if "--sizes" in sys.argv:
        sizes = [
            int(s) for s in sys.argv[sys.argv.index("--sizes") + 1].split(",")
        ]
        out_dir = (
            sys.argv[sys.argv.index("--plot") + 1]
            if "--plot" in sys.argv
            else "bench_out"
        )
        multi_size_bench(sizes, out_dir)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    quiet: tuple[float | None, bool] | None = None
    if "--until-quiet" in sys.argv:
        quiet = _wait_until_quiet()
    cond = _bench_conditions()
    spark = get_spark(app_name="cae-bench")
    qs = all_queries()

    # Global warm pass (JVM code cache, codegen, parquet footers) with
    # its persist_once entries released afterwards: JIT warmth is
    # global state we WANT shared; cache entries are per-query state we
    # don't (see below).  Queries with a registered ``setup`` (on-disk
    # fixture build = table MAINTENANCE, e.g. skipping_dynamic_join's
    # clustered write + index build) run it here ONCE, timed separately:
    # maintenance cost must not read as query cost in the headline
    # (VERDICT r11 item 3) — both numbers land in the JSON.
    setup_secs: dict[str, float] = {}
    with cache_scope():
        for name in BENCH_QUERIES:
            if qs[name].setup is not None:
                t0 = time.perf_counter()
                qs[name].setup(spark, sf_dir)
                setup_secs[name] = round(time.perf_counter() - t0, 4)
            qs[name].fn(spark, sf_dir).count()

    # Per-query cache scope: each query warms its own persist_once
    # entries untimed, runs best-of-N timed, then releases them.  This
    # keeps timed numbers ORDER-INDEPENDENT (no query freeloads on a
    # predecessor's cache during timed runs — round 7's 3.2 s
    # containment number was really "containment with signatures
    # pre-cached by the minhash entry that ran earlier") and bounds
    # executor storage memory to one query's working set instead of 26
    # accumulated cache entries pressuring the tail of the suite.
    # TWO interleaved suite passes, per-query min across passes: the
    # shared host exhibits multi-minute single-core slowdown windows
    # (reproduced round 9: a trivial query recording 17 s because all
    # of its consecutive best-of-3 samples landed inside one window;
    # the same query times 0.2 s minutes later).  Consecutive samples
    # cannot dodge a window longer than the query; a second full pass
    # minutes later almost never hits the same query inside a window,
    # so min-across-passes recovers the plan-cost floor.
    timings: dict[str, float] = {}
    per_pass: list[dict[str, float]] = [{}, {}]
    for _pass in range(2):
        for name, low_latency in BENCH_QUERIES.items():
            _set_low_latency(spark, low_latency)
            with cache_scope():
                qs[name].fn(spark, sf_dir).count()  # warm-up (untimed)
                t = round(run_query(qs[name], spark, sf_dir), 4)
            per_pass[_pass][name] = t
            timings[name] = min(timings.get(name, t), t)
    _set_low_latency(spark, False)
    cond["cache_isolated"] = True
    cond["passes"] = 2

    total = round(sum(timings.values()), 4)
    cond["loadavg_end"] = _loadavg()
    cond["cpu_probe_ms_end"] = _cpu_probe_ms()
    cond["membw_gbps_end"] = _membw_probe_gbps()
    if quiet is not None:
        cond["until_quiet"] = {"loadavg": quiet[0], "reached_quiet": quiet[1]}
    # pass-1-vs-pass-2 divergence > STORM_RATIO marks a query whose min
    # came from a single healthy pass on a degraded host
    storm_flags = sorted(
        n for n in timings
        if min(per_pass[0][n], per_pass[1][n]) > 0
        and max(per_pass[0][n], per_pass[1][n])
        / min(per_pass[0][n], per_pass[1][n]) > STORM_RATIO
    )
    probe = min(cond["cpu_probe_ms"], cond["cpu_probe_ms_end"])
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                # host-speed-rescaled total: identity on healthy/fast
                # probes, discounts only degraded hosts (see
                # PROBE_DEGRADED_MS)
                "value_normalized": round(total * _norm_factor(probe), 4),
                "storm_flags": storm_flags,
                "queries": timings,
                # per-run fixture maintenance, timed apart from queries
                "setup_sec": setup_secs,
                "setup_total_sec": round(sum(setup_secs.values()), 4),
                "sf": sf,
                "conditions": cond,
            }
        )
    )


if __name__ == "__main__":
    main()
