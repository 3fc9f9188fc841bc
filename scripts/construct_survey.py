#!/usr/bin/env python
"""Survey DataFrame-construction cost (driver-side, no execution) for
the headline queries — the guide-§5/§7.3 stall class round 15 attacks.

Usage: python scripts/construct_survey.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES
from columnar_analytics_engine_spark.functions.caching import cache_scope
from columnar_analytics_engine_spark.queries import all_queries
from columnar_analytics_engine_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cae-construct-survey")
    qs = all_queries()
    out = {}
    for name in names:
        spec = qs[name]
        with cache_scope():
            if spec.setup is not None:
                spec.setup(spark, sf_dir)
            spec.fn(spark, sf_dir)  # warm the construction path (imports, analysis caches)
            t0 = time.perf_counter()
            for _ in range(3):
                spec.fn(spark, sf_dir)
            out[name] = round((time.perf_counter() - t0) / 3, 4)
    for name, sec in sorted(out.items(), key=lambda kv: -kv[1]):
        print(f"{name:32s} {sec:8.4f}s")
    import json

    print(json.dumps({"mode": "construct", "queries": out}))


if __name__ == "__main__":
    main()
