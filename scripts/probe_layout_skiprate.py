"""Layout × stats-index skip-rate probe.

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1), how much of the file
manifest the stats index prunes for the SAME table written three ways
(shuffled / range-sorted on one key / Z-ordered on two), under
single-column and two-column predicates, plus the clustering-depth
metric that predicts it and the dynamic-join file pruning rate.

This is the 100 TB argument in numbers: the index is identical in all
three runs — only the LAYOUT changes the fraction of the corpus a
query touches.

Run:  python scripts/probe_layout_skiprate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.io import (
    read_table,
    write_shuffled,
    write_sorted,
    write_zorder,
)
from columnar_analytics_engine_spark.layout import clustering_depth, index_extents
from columnar_analytics_engine_spark.session import get_spark
from columnar_analytics_engine_spark.skipping import (
    build_stats_index,
    plan_skipping,
    plan_skipping_join,
    read_skipping,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 64


def main() -> None:
    import tempfile

    spark = get_spark(app_name="probe-layout")
    base = tempfile.mkdtemp(prefix="cae_probe_layout_")
    orders = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo, hi = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    klo, khi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    # ~2% slices on each column
    c_hi = lo + max(1, (hi - lo) // 50)
    k_hi = klo + max(1, (khi - klo) // 50)
    preds = {
        "custkey_slice": f"o_custkey ge {lo} and o_custkey le {c_hi}",
        "orderkey_slice": f"o_orderkey ge {klo} and o_orderkey le {k_hi}",
        "both": (
            f"o_custkey ge {lo} and o_custkey le {c_hi} and "
            f"o_orderkey ge {klo} and o_orderkey le {k_hi}"
        ),
    }

    layouts = {}
    for name, write in (
        ("shuffled", lambda d, p: write_shuffled(d, p, "o_orderkey", n_files=N_FILES)),
        ("sorted_custkey", lambda d, p: write_sorted(d, p, ["o_custkey"], n_files=N_FILES)),
        (
            "zorder_custkey_orderkey",
            lambda d, p: write_zorder(
                d, p, ["o_custkey", "o_orderkey"], n_files=N_FILES
            ),
        ),
    ):
        data = os.path.join(base, name)
        index = os.path.join(base, name + "_idx")
        write(orders, data)
        build_stats_index(spark, data, index)
        layouts[name] = (data, index)

    results = []
    for lname, (data, index) in layouts.items():
        depth = {
            r["probe_col"]: round(r["avg_depth"], 2)
            for r in clustering_depth(
                index_extents(spark, index, ["o_custkey", "o_orderkey"])
            ).collect()
        }
        for pname, pred in preds.items():
            plan = plan_skipping(spark, index, pred)
            t0 = time.monotonic()
            n = read_skipping(spark, data, index, pred).count()
            wall = round(time.monotonic() - t0, 3)
            results.append(
                {
                    "layout": lname,
                    "predicate": pname,
                    "files_total": plan["files_total"],
                    "files_pruned": plan["files_pruned"],
                    "skip_pct": round(
                        100.0 * plan["files_pruned"] / plan["files_total"], 1
                    ),
                    "rows": n,
                    "scan_sec": wall,
                    "avg_depth": depth,
                }
            )

    # dynamic file pruning for a join: dim = 2% key slice
    dim = spark.range(int(klo), int(k_hi)).select(
        F.col("id").alias("o_orderkey")
    )
    for lname in ("shuffled", "sorted_custkey", "zorder_custkey_orderkey"):
        _, index = layouts[lname]
        jp = plan_skipping_join(spark, index, "o_orderkey", dim)
        results.append(
            {
                "layout": lname,
                "predicate": "join_keys_2pct",
                "files_total": jp["files_total"],
                "files_pruned": jp["files_pruned"],
                "skip_pct": round(100.0 * jp["files_pruned"] / jp["files_total"], 1),
                "mode": jp["mode"],
            }
        )

    # needle lookup: a mid-domain eq probe — intervals useless on the
    # shuffled layout, the bloom index prunes regardless of layout
    from columnar_analytics_engine_spark.skipping import build_bloom_index

    data, index = layouts["shuffled"]
    bloom = os.path.join(base, "shuffled_bloom")
    t0 = time.monotonic()
    build_bloom_index(spark, data, bloom, ["o_orderkey"])
    build_sec = round(time.monotonic() - t0, 3)
    mid = int((klo + khi) // 2)
    pred = f"o_orderkey eq {mid}"
    for label, bp in (("stats_only", None), ("stats+bloom", bloom)):
        plan = plan_skipping(spark, index, pred, bloom_path=bp)
        t0 = time.monotonic()
        n = read_skipping(spark, data, index, pred, bloom_path=bp).count()
        results.append(
            {
                "layout": "shuffled",
                "predicate": f"point_lookup/{label}",
                "files_total": plan["files_total"],
                "files_pruned": plan["files_pruned"],
                "skip_pct": round(
                    100.0 * plan["files_pruned"] / plan["files_total"], 1
                ),
                "rows": n,
                "scan_sec": round(time.monotonic() - t0, 3),
                "bloom_build_sec": build_sec if bp else None,
            }
        )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
