#!/usr/bin/env python
"""IVF index maintenance probe: APPEND vs REBUILD wall-clock as the
corpus grows (VERDICT r10 item 6).

A production ANN corpus is append-only.  Rebuilding the index per batch
re-assigns the ENTIRE corpus to the centroids — linear in N per batch,
quadratic over the corpus lifetime.  ``ivf_append`` assigns only the
batch against the frozen centroids and publishes a new snapshot
(``versioned.write_version``), so per-batch compute is linear in the
BATCH.  This probe measures both paths over the same grown corpus and
verifies the appended index serves the same top-k as a from-scratch
assignment (the correctness contract the oracle-checked
``similarity_ivf_append_probe`` entry pins at sf0.01), plus the drift
report's cost.

Prints one JSON line per size:
{"base_vectors": N, "batch_vectors": B, "n_lists": L,
 "rebuild_sec": _, "append_sec": _, "speedup": _, "drift_sec": _,
 "served_equal": true, "loadavg": _}
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

from columnar_analytics_engine_spark import versioned  # noqa: E402
from columnar_analytics_engine_spark.functions.caching import cache_scope  # noqa: E402
from columnar_analytics_engine_spark.io import write_table  # noqa: E402
from columnar_analytics_engine_spark.operators.similarity import (  # noqa: E402
    ivf_append,
    ivf_assignments,
    ivf_drift_report,
    ivf_probe_topk,
)
from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.sources.synthetic import (  # noqa: E402
    embeddings_table,
)

K = 10
N_QUERIES = 50
N_PROBE = 8
BATCH_FRACTION = 100  # batch = corpus / BATCH_FRACTION


def probe(spark, num_vecs: int) -> dict:
    n_lists = 2 ** round(math.log2(math.sqrt(num_vecs)))
    n_batch = max(1000, num_vecs // BATCH_FRACTION)
    with tempfile.TemporaryDirectory() as tmp:
        base_path = f"{tmp}/base.parquet"
        batch_path = f"{tmp}/batch.parquet"
        # batch ids continue after the base corpus (append-only ingest)
        write_table(embeddings_table(spark, num_vecs).repartition(32), base_path)
        write_table(
            embeddings_table(spark, num_vecs + n_batch)
            .filter(F.col("vec_id") >= num_vecs)
            .repartition(4),
            batch_path,
        )
        base = spark.read.parquet(base_path)
        batch = spark.read.parquet(batch_path)
        tbl = f"{tmp}/entries"

        with cache_scope():
            # ---- build once over the base corpus (snapshot v0) ------
            seeds_df, assigned = ivf_assignments(base, n_lists)
            seeds_path = f"{tmp}/seeds.parquet"
            write_table(seeds_df, seeds_path)
            seeds = spark.read.parquet(seeds_path)
            versioned.write_version(assigned, tbl)

            # ---- REBUILD path: re-assign the whole grown corpus -----
            grown = base.unionByName(batch)
            start = time.perf_counter()
            _, rebuilt = ivf_assignments(grown, n_lists)
            rebuilt_cnt = rebuilt.count()
            rebuild_sec = time.perf_counter() - start

            # ---- APPEND path: assign the batch only, snapshot v1 ----
            start = time.perf_counter()
            delta = ivf_append(batch, seeds)
            v1 = versioned.read_version(spark, tbl, 0).unionByName(delta)
            versioned.write_version(v1, tbl)
            append_sec = time.perf_counter() - start

            # ---- the two indexes serve identical top-k --------------
            queries = base.filter(F.col("vec_id") < N_QUERIES)
            entries = versioned.read_version(spark, tbl)
            served = sorted(map(tuple, ivf_probe_topk(
                queries, seeds, entries, k=K, n_probe=N_PROBE).collect()))
            # rebuild trains NEW seeds; compare against same-seed truth
            from columnar_analytics_engine_spark.functions.similarity import with_norms
            from columnar_analytics_engine_spark.operators.similarity import _assign_to_seeds

            all_n = with_norms(grown, "embedding").select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("cv"),
                F.col("sq_norm").alias("cn"),
            )
            scratch = sorted(map(tuple, ivf_probe_topk(
                queries, seeds, _assign_to_seeds(all_n, seeds),
                k=K, n_probe=N_PROBE).collect()))

            # ---- drift report cost ----------------------------------
            start = time.perf_counter()
            drift_rows = ivf_drift_report(
                versioned.read_version(spark, tbl, 0), delta, seeds
            ).count()
            drift_sec = time.perf_counter() - start

    return {
        "base_vectors": num_vecs,
        "batch_vectors": n_batch,
        "n_lists": n_lists,
        "rebuild_rows": rebuilt_cnt,
        "rebuild_sec": round(rebuild_sec, 2),
        "append_sec": round(append_sec, 2),
        "speedup": round(rebuild_sec / append_sec, 1) if append_sec else None,
        "drift_lists": drift_rows,
        "drift_sec": round(drift_sec, 2),
        "served_equal": served == scratch and len(served) > 0,
        "loadavg": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "100000,1000000").split(",")]
    spark = get_spark()
    for n in sizes:
        print(json.dumps(probe(spark, n)), flush=True)


if __name__ == "__main__":
    main()
