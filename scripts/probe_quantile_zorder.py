"""Linear vs quantile Z-order on a real skewed column.

``events.value`` at $SPARK_GRAFT_SF_DIR is long-tailed (median ~35,
max ~560): equal-width bins map most rows into the lowest few bins, so
the Morton interleave degenerates toward user_id-only clustering and a
median-range predicate on value prunes poorly.  Equi-frequency rank
bins (``zorder_frame(method='quantile')``) keep the interleave
balanced.  Prints depth + skip rate per method.

Run:  python scripts/probe_quantile_zorder.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.io import read_table
from columnar_analytics_engine_spark.layout import (
    clustering_depth,
    index_extents,
    zorder_frame,
)
from columnar_analytics_engine_spark.session import get_spark
from columnar_analytics_engine_spark.skipping import (
    build_stats_index,
    plan_skipping,
    read_skipping,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 64


def main() -> None:
    spark = get_spark(app_name="probe-qz")
    base = tempfile.mkdtemp(prefix="cae_probe_qz_")
    ev = read_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    med, hi = ev.stat.approxQuantile("value", [0.5, 0.55], 0.001)
    pred = f"value ge {med:.4f} and value le {hi:.4f}"  # a 5%-of-rows band
    for method in ("linear", "quantile"):
        data = os.path.join(base, method)
        index = data + "_idx"
        zorder_frame(
            ev, ["value", "user_id"], N_FILES, bits=8, method=method
        ).write.parquet(data)
        build_stats_index(spark, data, index)
        depth = {
            r["probe_col"]: round(r["avg_depth"], 1)
            for r in clustering_depth(
                index_extents(spark, index, ["value", "user_id"])
            ).collect()
        }
        plan = plan_skipping(spark, index, pred)
        t0 = time.monotonic()
        n = read_skipping(spark, data, index, pred).count()
        print(
            json.dumps(
                {
                    "method": method,
                    "predicate": pred,
                    "files_total": plan["files_total"],
                    "files_pruned": plan["files_pruned"],
                    "skip_pct": round(
                        100.0 * plan["files_pruned"] / plan["files_total"], 1
                    ),
                    "rows": n,
                    "scan_sec": round(time.monotonic() - t0, 3),
                    "avg_depth": depth,
                }
            )
        )


if __name__ == "__main__":
    main()
