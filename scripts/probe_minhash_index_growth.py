#!/usr/bin/env python
"""MinHash probe-vs-index-growth probe (VERDICT r10 item 1 done
criterion): with the PROBE BATCH fixed, grow the persisted index 10×
and show probe wall-clock stays ~flat.

This is the axis the earlier probes didn't cover.  The round-11
candidate-bounded verify makes it the designed behavior: the batch
band table joins the stored bands (index side bucketable, batch side
broadcast), the candidate list is bounded by true band collisions of
the BATCH, and ``index_sets`` is semi-joined down to candidate
``hist_id``s before its broadcast — so no stage's working set grows
with history except the one linear scan of the stored band table.
Before the fix, ``F.broadcast(index_sets)`` shipped the ENTIRE history
set table to every executor, linear in index size.

Prints one JSON line per size:
{"history_docs": N, "batch_docs": B, "index_band_rows": _,
 "candidates": _, "pairs": _, "probe_sec": _, "loadavg": _}
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
from columnar_analytics_engine_spark.operators import dedup as D  # noqa: E402
from columnar_analytics_engine_spark.session import get_spark  # noqa: E402
from columnar_analytics_engine_spark.sources.synthetic import docs_table  # noqa: E402

BATCH_DOCS = 5_000
VOCAB_SCALE = 1_000  # sparse token sets: candidates ≈ true dups, like real text


def probe(spark, history_docs: int) -> dict:
    with tempfile.TemporaryDirectory() as tmp:
        # history corpus + a FIXED batch whose ids continue after it
        # (every 10th synthetic doc duplicates its predecessor, so the
        # batch genuinely collides with history at every scale)
        corpus = docs_table(
            spark, history_docs + BATCH_DOCS, vocab_scale=VOCAB_SCALE,
            partitions=32,
        )
        hist_path = f"{tmp}/hist.parquet"
        batch_path = f"{tmp}/batch.parquet"
        write_table(corpus.filter(F.col("doc_id") < history_docs), hist_path)
        write_table(corpus.filter(F.col("doc_id") >= history_docs), batch_path)

        with cache_scope():
            # build-once: persist the index frames (the cost a probe
            # amortizes away; not timed here)
            bands_df, sets_df = D.minhash_index_frames(
                spark.read.parquet(hist_path)
            )
            write_table(bands_df, f"{tmp}/bands.parquet")
            write_table(sets_df, f"{tmp}/sets.parquet")

        index_bands = spark.read.parquet(f"{tmp}/bands.parquet")
        index_sets = spark.read.parquet(f"{tmp}/sets.parquet")
        batch = spark.read.parquet(batch_path)

        def run():
            with cache_scope():
                return D.minhash_probe(
                    batch, index_bands, index_sets, threshold=0.8
                ).count()

        run()  # warm: codegen + file listing
        start = time.perf_counter()
        pairs = run()
        probe_sec = time.perf_counter() - start

        with cache_scope():
            sigs = D.minhash_signatures(batch)
            nb = D.band_table(sigs)
            cands = (
                nb.alias("n")
                .join(index_bands.alias("h"), ["band_id", "band_key"])
                .filter(F.col("n.doc_id") != F.col("h.doc_id"))
                .select("n.doc_id", "h.doc_id")
                .distinct()
                .count()
            )
        band_rows = index_bands.count()

    return {
        "history_docs": history_docs,
        "batch_docs": BATCH_DOCS,
        "index_band_rows": band_rows,
        "candidates": cands,
        "pairs": pairs,
        "probe_sec": round(probe_sec, 2),
        "loadavg": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "100000,1000000").split(",")
    ]
    spark = get_spark()
    for n in sizes:
        print(json.dumps(probe(spark, n)), flush=True)


if __name__ == "__main__":
    main()
