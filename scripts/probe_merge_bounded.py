"""Bounded-MERGE probe: upsert cost vs affected files.

Upserts key-slices of growing width into a key-clustered ``lineitem``
at $SPARK_GRAFT_SF_DIR (default sf0.1) and records how many of the 64
data files each merge rewrites plus the wall time — the evidence that
``layout.merge_upsert_files`` scales with the TOUCHED key range, not
the table (at 100 TB: a 10k-row upsert rewrites a handful of files,
never terabytes).

Run:  python scripts/probe_merge_bounded.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.io import read_table, write_sorted
from columnar_analytics_engine_spark.layout import merge_upsert_files
from columnar_analytics_engine_spark.session import get_spark
from columnar_analytics_engine_spark.skipping import build_stats_index

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 64


def main() -> None:
    spark = get_spark(app_name="probe-merge")
    base = tempfile.mkdtemp(prefix="cae_probe_merge_")
    fact = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    lo, hi = fact.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    span = hi - lo
    total_rows = fact.count()

    for frac in (0.002, 0.01, 0.05, 0.25):
        data = os.path.join(base, f"t{int(frac * 1000)}")
        index = data + "_idx"
        write_sorted(fact, data, ["l_orderkey"], n_files=N_FILES)
        build_stats_index(spark, data, index)
        cut = lo + max(1, int(span * frac))
        source = fact.filter(F.col("l_orderkey") <= cut).withColumn(
            "l_quantity", F.col("l_quantity") + F.lit(1.0)
        )
        n_src = source.count()
        t0 = time.monotonic()
        out = merge_upsert_files(spark, data, index, source, "l_orderkey")
        wall = round(time.monotonic() - t0, 3)
        print(
            json.dumps(
                {
                    "key_slice_frac": frac,
                    "source_rows": n_src,
                    "table_rows": total_rows,
                    "files_total": N_FILES,
                    "affected_files": out["affected_files"],
                    "new_files": out["new_files"],
                    "merge_sec": wall,
                }
            )
        )


if __name__ == "__main__":
    main()
