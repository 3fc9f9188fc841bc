#!/usr/bin/env python
"""Round-15 experiment: fused intersect-count for the dedup verify family.

VERDICT r14 item 1: ~9 s of the 22.8 s headline burns in 7.6M per-pair
``size(array_intersect(a, b))`` calls that allocate an intersection
array (and an OpenHashSet) per pair just to count matches.  This lab
isolates the verify stage and A/Bs the shipped JVM expression against a
``mapInArrow`` numpy kernel that amortizes the per-B-set work across
runs of candidates sharing d2 (candidates sorted by d2 within
partitions; per run: one sorted B array + one vectorized searchsorted
over every A value in the run).

Usage: python scripts/verify_lab.py [stage|ab|check]
  stage  — time candidate generation alone vs full query (isolates verify)
  ab     — interleaved A/B: JVM array_intersect vs mapInArrow kernel
  check  — row-for-row equality of the two verify implementations
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.functions.caching import cache_scope
from columnar_analytics_engine_spark.session import get_spark
from columnar_analytics_engine_spark import operators
from columnar_analytics_engine_spark.operators import dedup as D
from columnar_analytics_engine_spark.io import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def docs(spark):
    return read_table(spark, SF_DIR, "documents")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _kernel_batches(batches):
    """Yield (left, right, n1, n2, n_common) RecordBatches.

    Input batches: (k1, k2, ta, tb) with ta/tb list<int64>.  Rows whose
    ta/tb is NULL are dropped (the JVM filter drops them via NULL
    predicates).  Per run of consecutive equal k2, B is sorted once and
    all A values in the run are searchsorted in one vectorized call.
    """
    for batch in batches:
        n = batch.num_rows
        if n == 0:
            continue
        k1 = batch.column(0)
        k2 = batch.column(1)
        ta = batch.column(2)
        tb = batch.column(3)
        null_mask = None
        if ta.null_count or tb.null_count:
            null_mask = pa.compute.or_(ta.is_null(), tb.is_null())
            keep = pa.compute.invert(null_mask)
            k1, k2, ta, tb = (c.filter(keep) for c in (k1, k2, ta, tb))
            n = len(k1)
            if n == 0:
                continue
        key2 = k2.to_numpy(zero_copy_only=False)
        oa = np.asarray(ta.offsets)
        va = np.asarray(ta.values)
        ob = np.asarray(tb.offsets)
        vb = np.asarray(tb.values)
        n1 = np.diff(oa).astype(np.int64)
        n2 = np.diff(ob).astype(np.int64)
        counts = np.empty(n, dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, key2[1:] != key2[:-1]])
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            B = vb[ob[s]:ob[s + 1]]
            Bs = np.sort(B)
            A = va[oa[s]:oa[e]]
            if len(Bs) == 0 or len(A) == 0:
                counts[s:e] = 0
                continue
            pos = np.searchsorted(Bs, A)
            pos[pos == len(Bs)] = len(Bs) - 1
            hits = Bs[pos] == A
            cs = np.zeros(len(hits) + 1, dtype=np.int64)
            np.cumsum(hits, out=cs[1:])
            row_off = oa[s:e + 1] - oa[s]
            counts[s:e] = cs[row_off[1:]] - cs[row_off[:-1]]
        yield pa.record_batch(
            [k1, k2, pa.array(n1), pa.array(n2), pa.array(counts)],
            names=["d1", "d2", "n1", "n2", "n_common"],
        )


def jaccard_pairs_arrow(spark, d, threshold=0.8):
    """mapInArrow twin of jaccard_pairs(candidates=...)."""
    num, den = D._rational_threshold(threshold)
    sigs = D._persist_once(D.minhash_signatures(d))
    cands = D.lsh_candidates(sigs)
    sets = D._persist_once(D.hashed_token_sets(d))
    bs = F.broadcast(sets)
    joined = (
        cands.sortWithinPartitions("d2")
        .join(bs.alias("sa"), F.col("d1") == F.col("sa.doc_id"))
        .join(bs.alias("sb"), F.col("d2") == F.col("sb.doc_id"))
        .select("d1", "d2", F.col("sa.toks").alias("ta"), F.col("sb.toks").alias("tb"))
    )
    counts = joined.mapInArrow(
        _kernel_batches, "d1 long, d2 long, n1 long, n2 long, n_common long"
    )
    n1, n2, nc = F.col("n1"), F.col("n2"), F.col("n_common")
    size_ok = F.lit(den + num) * F.least(n1, n2) >= F.lit(num) * (n1 + n2)
    hit = size_ok & (F.lit(den + num) * nc >= F.lit(num) * (n1 + n2))
    jac = nc.cast("double") / (n1 + n2 - nc).cast("double")
    return counts.filter(hit).select("d1", "d2", jac.alias("jaccard"))


def stage(spark):
    d = docs(spark)
    for label, fn in [
        ("candidates_only", lambda: D.lsh_candidates(
            D._persist_once(D.minhash_signatures(d)))),
        ("full_query", lambda: D.minhash_near_duplicates(d, threshold=0.8)),
    ]:
        with cache_scope():
            _noop(fn())  # warm
            best = min(
                _timed(lambda: _noop(fn())) for _ in range(3)
            )
        print(f"{label}: {best:.4f}s")


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def ab(spark):
    d = docs(spark)
    variants = {
        "jvm_array_intersect": lambda: D.minhash_near_duplicates(d, threshold=0.8),
        "arrow_kernel": lambda: jaccard_pairs_arrow(spark, d),
    }
    results = {k: [] for k in variants}
    for rnd in range(3):
        for name, fn in variants.items():
            with cache_scope():
                _noop(fn())  # warm (builds persists)
                results[name].append(_timed(lambda: _noop(fn())))
    for name, ts in results.items():
        print(f"{name}: min={min(ts):.4f}s  all={[round(t,3) for t in ts]}")


def check(spark):
    d = docs(spark)
    with cache_scope():
        a = sorted(D.minhash_near_duplicates(d, threshold=0.8).collect())
        b = sorted(jaccard_pairs_arrow(spark, d).collect())
    print(f"rows: jvm={len(a)} arrow={len(b)} equal={a == b}")
    if a != b:
        sa, sb = set(a), set(b)
        print("only_jvm:", list(sa - sb)[:5])
        print("only_arrow:", list(sb - sa)[:5])


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stage"
    s = get_spark(app_name="cae-verify-lab")
    {"stage": stage, "ab": ab, "check": check}[mode](s)
