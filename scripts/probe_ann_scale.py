#!/usr/bin/env python
"""ANN scaling probe: brute-force vs persisted-IVF top-k over synthetic
clustered embeddings (``sources.synthetic.embeddings_table``), the
BASELINE.md document-operator methodology applied to the similarity
path.

The 100 TB claim for similarity search is a cost SPLIT, not a single
number: the IVF index build is one linear pass over the corpus
(amortized across every query ever served), and the per-query probe
scores only the ~n_probe/n_lists fraction of the corpus in the probed
lists — so with n_lists ~ sqrt(N) probe work grows ~sqrt-of-corpus
while brute force grows linearly.  The probe therefore builds the
index ONCE per size (``ivf_assignments`` → ``io.write_bucketed`` by
list_id, the deployment shape from tests/test_scale_ops.py), then
times ``ivf_probe_topk`` against the persisted index, next to the
brute-force ``cosine_topk`` baseline and the recall@k the saved work
costs.

Prints one JSON line per size:
{"vectors": N, "n_lists": L, "build_sec": _, "brute_pairs": _,
 "brute_sec": _, "probe_pairs_scored": _, "probe_sec": _,
 "recall_at_10": _, "loadavg": _}
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from columnar_analytics_engine_spark.functions.caching import cache_scope  # noqa: E402
from columnar_analytics_engine_spark.io import write_bucketed, write_table  # noqa: E402
from columnar_analytics_engine_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_assignments,
    ivf_probe_topk,
)
from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.sources.synthetic import (  # noqa: E402
    embeddings_table,
)

K = 10
N_QUERIES = 50
N_PROBE = 8


def probe(spark, num_vecs: int) -> dict:
    n_lists = 2 ** round(math.log2(math.sqrt(num_vecs)))
    index_tbl = f"ann_probe_index_{num_vecs}"
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/emb_{num_vecs}.parquet"
        write_table(
            embeddings_table(spark, num_vecs).repartition(32),
            path,
        )
        cands = spark.read.parquet(path)
        queries = cands.filter(F.col("vec_id") < N_QUERIES)

        with cache_scope():
            # ---- brute-force baseline ------------------------------
            cosine_topk(queries, cands, k=K).count()  # warm: codegen
            start = time.perf_counter()
            brute = cosine_topk(queries, cands, k=K)
            brute_rows = brute.count()
            brute_sec = time.perf_counter() - start

            # ---- index build (once per corpus) ---------------------
            start = time.perf_counter()
            seeds_df, assigned = ivf_assignments(cands, n_lists)
            seeds_path = f"{tmp}/seeds_{num_vecs}.parquet"
            write_table(seeds_df, seeds_path)
            write_bucketed(assigned, index_tbl, "list_id", n_buckets=32)
            build_sec = time.perf_counter() - start

            seeds = spark.read.parquet(seeds_path)
            index = spark.table(index_tbl)

            # ---- probe against the persisted index -----------------
            def run_probe():
                return ivf_probe_topk(
                    queries, seeds, index, k=K, n_probe=N_PROBE
                )

            run_probe().count()  # warm
            start = time.perf_counter()
            ivf = run_probe()
            ivf.count()
            probe_sec = time.perf_counter() - start

            # scored-pair count: rows flowing into the ranking window
            probes_scored = (
                ivf_probe_topk(queries, seeds, index, k=10**9, n_probe=N_PROBE)
                .count()
            )

            # recall@K: fraction of true top-K pairs the probe found
            truth = brute.select("query_id", "neighbor_id")
            hits = truth.join(
                ivf.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            ).count()
            recall = hits / brute_rows if brute_rows else None
        spark.sql(f"DROP TABLE IF EXISTS {index_tbl}")
    return {
        "vectors": num_vecs,
        "n_lists": n_lists,
        "n_probe": N_PROBE,
        "build_sec": round(build_sec, 2),
        "brute_pairs": N_QUERIES * (num_vecs - 1),
        "brute_sec": round(brute_sec, 2),
        "probe_pairs_scored": probes_scored,
        "probe_sec": round(probe_sec, 2),
        "recall_at_10": round(recall, 4) if recall is not None else None,
        "loadavg": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "100000,1000000").split(",")]
    spark = get_spark()
    for n in sizes:
        print(json.dumps(probe(spark, n)), flush=True)


if __name__ == "__main__":
    main()
