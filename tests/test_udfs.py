"""UDF surface tests: pandas UDF, grouped map, UDTF (SURVEY §2.10)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.functions.udfs import (
    chunk_text_builtin,
    make_chunk_udtf,
    make_zscore,
    normalize_group,
)
from columnar_analytics_engine_spark.io import read_table


def test_pandas_udf_zscore(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4, 5]], "v double").coalesce(1)
    got = [r["z"] for r in df.select(make_zscore()("v").alias("z")).collect()]
    mean, std = 3.0, math.sqrt(2.0)
    want = [(v - mean) / std for v in [1, 2, 3, 4, 5]]
    assert all(abs(g - w) < 1e-9 for g, w in zip(sorted(got), sorted(want)))


def test_grouped_map_normalize(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 5.0), ("b", 5.0)],
        "k string, v double",
    )
    out = {(r["k"], r["v"]): r["normalized"] for r in normalize_group(df, "k", "v").collect()}
    assert out[("a", 10.0)] == 0.0 and out[("a", 30.0)] == 1.0 and out[("a", 20.0)] == 0.5
    assert out[("b", 5.0)] == 0.0  # degenerate range → 0


def test_udtf_matches_builtin_chunker(spark, sf_small):
    docs = read_table(spark, sf_small, "documents").limit(50)
    builtin = chunk_text_builtin(docs, chunk_chars=200, overlap=50)
    spark.udtf.register("chunk_text_t", make_chunk_udtf(200, 50))
    docs.createOrReplaceTempView("docs_for_udtf")
    via_udtf = spark.sql(
        "SELECT c.doc_id, c.chunk_id, c.chunk FROM docs_for_udtf, LATERAL chunk_text_t(doc_id, text) c"
    )
    a = sorted(tuple(r) for r in builtin.collect())
    b = sorted(tuple(r) for r in via_udtf.collect())
    assert a == b


def test_chunker_covers_text(spark):
    df = spark.createDataFrame([(1, "x" * 500)], "doc_id long, text string")
    chunks = chunk_text_builtin(df, chunk_chars=200, overlap=50).collect()
    assert len(chunks) == 3  # ceil((500-50)/150) = 3
    # reconstruction: strip the 50-char overlaps, concatenation = original
    ordered = sorted(chunks, key=lambda r: r["chunk_id"])
    rebuilt = ordered[0]["chunk"] + "".join(c["chunk"][50:] for c in ordered[1:])
    assert rebuilt == "x" * 500
