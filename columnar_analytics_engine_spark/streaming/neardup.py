"""Streaming incremental NEAR-dedup: a ``foreachBatch`` sink that
screens each arriving micro-batch of documents against a persistent
MinHash/LSH index — the continuous-crawl companion to the exact
fingerprint dedup in streaming/incremental.py.  Exact dedup only
catches byte-identical recrawls; this catches the re-templated /
lightly-edited copies that dominate real crawl churn, without ever
rescanning history.

Per micro-batch:

  1. MinHash signatures for the batch (operators/dedup.minhash_signatures
     — one md5 per distinct token, affine k-family);
  2. LSH band keys (operators/dedup.band_table) probe the persistent
     band index: an equality join on (band_id, band_key), so history
     candidates surface via a key-shuffle, never a scan of history;
  3. candidates are verified by SIGNATURE similarity — the fraction of
     equal MinHash components, the standard streaming estimator of
     Jaccard (the batch twins verify with exact token sets; an index
     stores signatures, not corpora, so the estimator is what a
     production index can afford at 100 TB);
  4. within-batch near-dups come from the batch's own LSH self-join,
     first (lowest doc_id) occurrence wins;
  5. docs classified ``new`` append their signature + band rows to the
     index so later batches see them as history.

Statuses: ``near_dup_of_history`` (best history match by similarity,
then lowest id), ``near_dup_in_batch`` (lowest-id in-batch partner),
``new``.  Exact duplicates are near-dups at similarity 1.0 and classify
accordingly — run the exact pipeline first if byte-identity must be
distinguished.

Exactly-once: both sinks and both index tables partition by ``batch_id``
with dynamic partition overwrite (same retry contract as
streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.artifacts import resolve_artifact
from columnar_analytics_engine_spark.operators.dedup import (
    LSH_BANDS,
    MINHASH_K,
    _rational_threshold,
    band_table,
    lsh_candidates,
    minhash_signatures,
)


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # resolve through the artifact pointer: after an offline generation
    # compaction (streaming/maintenance.py) the live state is the
    # published generation's sibling dir, not the original path
    try:
        return spark.read.parquet(resolve_artifact(path))
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return spark.createDataFrame([], schema)
        raise


def _sig_schema(k: int) -> str:
    return "doc_id long, " + ", ".join(f"h{i} long" for i in range(k))


def _n_equal(k: int, left_prefix: str = "h", right_prefix: str = "hh") -> F.Column:
    """Number of equal signature components between two joined sigs."""
    terms = [
        (F.col(f"{left_prefix}{i}") == F.col(f"{right_prefix}{i}")).cast("int")
        for i in range(k)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def classify_neardup_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, status, matched_id, sim) for one batch of (doc_id, text).

    ``sim`` is the signature similarity to the matched doc (NULL for
    ``new``).  The ≥-threshold comparison is integer-exact
    (``n_equal·den ≥ num·k``), so classification is deterministic.
    ``sigs`` lets the caller pass (and persist/unpersist) the batch's
    signature table — it feeds three subtrees here plus the index
    append, and per-batch plans would otherwise pile up cache entries.
    """
    num, den = _rational_threshold(threshold)
    if sigs is None:
        sigs = minhash_signatures(batch, k=k)
    bnd = band_table(sigs, bands=bands, rows_per_band=k // bands)

    hist_sigs = _read_or_empty(spark, f"{state_dir}/sigs", _sig_schema(k)).select(
        F.col("doc_id").alias("hist_id"),
        *[F.col(f"h{i}").alias(f"hh{i}") for i in range(k)],
    )
    hist_bands = _read_or_empty(
        spark, f"{state_dir}/bands", "doc_id long, band_id int, band_key string"
    ).select("band_id", "band_key", F.col("doc_id").alias("hist_id"))

    hist_cand = (
        bnd.join(hist_bands, ["band_id", "band_key"])
        .select("doc_id", "hist_id")
        .distinct()
    )
    n_eq = _n_equal(k)
    hist_match = (
        hist_cand.join(sigs, "doc_id")
        .join(hist_sigs, "hist_id")
        .select("doc_id", "hist_id", n_eq.alias("n_eq"))
        .filter(F.col("n_eq") * den >= num * k)
    )
    w_best = W.partitionBy("doc_id").orderBy(F.desc("n_eq"), "hist_id")
    best_hist = (
        hist_match.withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            F.col("hist_id").alias("hist_match"),
            (F.col("n_eq").cast("double") / F.lit(float(k))).alias("hist_sim"),
        )
    )

    in_batch = lsh_candidates(sigs, bands=bands, rows_per_band=k // bands)
    batch_match = (
        in_batch.join(sigs.select(F.col("doc_id").alias("d1"), *[F.col(f"h{i}").alias(f"hh{i}") for i in range(k)]), "d1")
        .join(sigs.select(F.col("doc_id").alias("d2"), *[F.col(f"h{i}") for i in range(k)]), "d2")
        .select("d1", "d2", n_eq.alias("n_eq"))
        .filter(F.col("n_eq") * den >= num * k)
    )
    w_first = W.partitionBy("d2").orderBy("d1")
    best_batch = (
        batch_match.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("d2").alias("doc_id"),
            F.col("d1").alias("batch_match"),
            (F.col("n_eq").cast("double") / F.lit(float(k))).alias("batch_sim"),
        )
    )

    status = (
        F.when(F.col("hist_match").isNotNull(), F.lit("near_dup_of_history"))
        .when(F.col("batch_match").isNotNull(), F.lit("near_dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    matched = F.coalesce(F.col("hist_match"), F.col("batch_match"))
    sim = F.when(
        F.col("hist_match").isNotNull(), F.col("hist_sim")
    ).otherwise(F.col("batch_sim"))
    return (
        batch.select("doc_id")
        .join(best_hist, "doc_id", "left")
        .join(best_batch, "doc_id", "left")
        .select(
            "doc_id",
            status.alias("status"),
            matched.alias("matched_id"),
            sim.alias("sim"),
        )
    )


def incremental_neardup_query(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
):
    """Streaming query builder: classify each micro-batch against the
    persistent MinHash index, write classifications to
    ``{state_dir}/classified``, and append ``new`` docs' signatures and
    band keys to ``{state_dir}/sigs`` / ``{state_dir}/bands``.

    Returns the (not-yet-started) ``DataStreamWriter``.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sigs = minhash_signatures(batch_df, k=k).persist()
        classified = classify_neardup_batch(
            spark, batch_df, state_dir,
            threshold=threshold, k=k, bands=bands, sigs=sigs,
        ).withColumn("batch_id", F.lit(batch_id))
        classified.persist()
        try:
            (
                classified.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(resolve_artifact(f"{state_dir}/classified"))
            )
            new_ids = classified.filter(F.col("status") == "new").select("doc_id")
            new_sigs = sigs.join(new_ids, "doc_id").withColumn(
                "batch_id", F.lit(batch_id)
            ).persist()
            try:
                (
                    new_sigs.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(resolve_artifact(f"{state_dir}/sigs"))
                )
                (
                    band_table(new_sigs, bands=bands, rows_per_band=k // bands)
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(resolve_artifact(f"{state_dir}/bands"))
                )
            finally:
                new_sigs.unpersist()
        finally:
            classified.unpersist()
            sigs.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
    )
