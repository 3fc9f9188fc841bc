#!/usr/bin/env python
"""Oracle sweep for a subset of queries at one SF (round-15 gate tool).

Usage: python scripts/oracle_sweep.py <sf_dir> [pattern ...]
Patterns are substring filters over query names (default: all oracle
queries).  Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from columnar_analytics_engine_spark.compare import compare, oracle_connection
from columnar_analytics_engine_spark.functions.caching import cache_scope
from columnar_analytics_engine_spark.queries import all_queries
from columnar_analytics_engine_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1]
    patterns = sys.argv[2:]
    qs = all_queries()
    names = [
        n for n, s in qs.items()
        if s.sql is not None and (not patterns or any(p in n for p in patterns))
    ]
    spark = get_spark(app_name="cae-oracle-sweep")
    con = oracle_connection(sf_dir)
    failed = []
    for n in sorted(names):
        spec = qs[n]
        with cache_scope():
            if spec.setup is not None:
                spec.setup(spark, sf_dir)
            try:
                res = compare(n, spec.fn(spark, sf_dir), spec.sql, con)
                ok = res.ok
                msg = str(res)
            except Exception as e:  # noqa: BLE001
                ok, msg = False, repr(e)
        print(("PASS " if ok else "FAIL ") + n + ("" if ok else f": {msg}"))
        if not ok:
            failed.append(n)
    print(f"{len(names) - len(failed)}/{len(names)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
