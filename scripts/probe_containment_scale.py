#!/usr/bin/env python
"""Containment-LSH scaling probe: the BASELINE.md document-operator
methodology (synthetic docs via ``sources.synthetic.docs_table``,
vocab_scale=1000, warm timings on local[32]) applied to
``dedup_containment_lsh``'s pipeline — MinHash signatures → LSH band
candidates → single-pass set-array containment verify.

The verify cost is candidate-bound, so the evidence the 100 TB claim
needs is the candidate-count curve next to the wall-time curve: if
candidates grow ~linearly with docs (sparse vocabulary ≈ planted dups)
and wall time tracks candidates, the operator scales; a superlinear
candidate curve would mean the banding, not the verify, needs retuning.

Prints one JSON line per size:
{"docs": N, "candidates": C, "confirmed": P, "warm_sec": S, "loadavg": L}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from columnar_analytics_engine_spark.functions.caching import cache_scope  # noqa: E402
from columnar_analytics_engine_spark.io import write_table  # noqa: E402
from columnar_analytics_engine_spark.operators import dedup as D  # noqa: E402
from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.sources.synthetic import docs_table  # noqa: E402


def probe(spark, num_docs: int) -> dict:
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/docs_{num_docs}.parquet"
        write_table(
            docs_table(spark, num_docs, vocab_scale=1000).coalesce(
                max(1, min(32, num_docs // 50_000))
            ),
            path,
        )
        docs = spark.read.parquet(path)

        def run() -> tuple[int, int]:
            sigs = D.minhash_signatures(docs)
            cand = D.lsh_candidates(sigs)
            pairs = D.containment_pairs(docs, threshold=0.7, candidates=cand)
            return cand.count(), pairs.count()

        with cache_scope():  # per-size caches released between probes
            run()  # warm-up: codegen + persist_once materialization
            start = time.perf_counter()
            n_cand, n_pairs = run()
            warm = time.perf_counter() - start
    return {
        "docs": num_docs,
        "candidates": n_cand,
        "confirmed": n_pairs,
        "warm_sec": round(warm, 2),
        "loadavg": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    sizes = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [100_000, 1_000_000]
    )
    spark = get_spark(app_name="cae-containment-probe")
    for n in sizes:
        print(json.dumps(probe(spark, n)), flush=True)


if __name__ == "__main__":
    main()
