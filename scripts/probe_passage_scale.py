#!/usr/bin/env python
"""Passage-dedup scaling probe: the BASELINE.md document-operator
methodology (synthetic docs via ``sources.synthetic.docs_table``,
vocab_scale=1000, warm timings on local[32]) applied to the
``dedup_duplicate_passages`` inverted-index pipeline — per-token md5 →
rolling 8-gram span hashes → (doc, span) distinct agg → span-cardinality
window → per-doc coverage rollup.

The plan is LINEAR in the number of spans (≈ tokens), so the evidence
the 100 TB claim needs is wall time tracking the span count: spans grow
linearly with docs and warm wall should too.  A superlinear wall curve
would implicate the gh-partition window (hot span keys), which is where
a skew guard would go.

Prints one JSON line per size:
{"docs": N, "spans": S, "dup_spans": D, "warm_sec": W, "loadavg": L}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from columnar_analytics_engine_spark.functions.caching import cache_scope  # noqa: E402
from columnar_analytics_engine_spark.io import write_table  # noqa: E402
from columnar_analytics_engine_spark.queries.curation import (  # noqa: E402
    dedup_duplicate_passages,
)
from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.sources.synthetic import docs_table  # noqa: E402


def probe(spark, num_docs: int) -> dict:
    with tempfile.TemporaryDirectory() as tmp:
        sf_dir = f"{tmp}/sf_probe"
        write_table(
            docs_table(spark, num_docs, vocab_scale=1000).coalesce(
                max(1, min(32, num_docs // 50_000))
            ),
            f"{sf_dir}/documents.parquet",
        )

        def run() -> tuple[int, int]:
            rep = dedup_duplicate_passages(spark, sf_dir)
            row = rep.agg(
                F.sum("n_spans").alias("s"), F.sum("n_dup_spans").alias("d")
            ).collect()[0]
            return int(row["s"]), int(row["d"])

        with cache_scope():  # per-size caches released between probes
            run()  # warm-up: codegen + shuffle-file reuse
            start = time.perf_counter()
            n_spans, n_dup = run()
            warm = time.perf_counter() - start
    return {
        "docs": num_docs,
        "spans": n_spans,
        "dup_spans": n_dup,
        "warm_sec": round(warm, 2),
        "loadavg": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    sizes = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [100_000, 1_000_000]
    )
    spark = get_spark(app_name="cae-passage-probe")
    for n in sizes:
        print(json.dumps(probe(spark, n)), flush=True)


if __name__ == "__main__":
    main()
