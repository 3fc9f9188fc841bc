"""Approximate aggregates must land near the exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_analytics_engine_spark.io import read_table


def test_approx_distinct_within_5pct(spark, sf_small):
    df = read_table(spark, sf_small, "lineitem")
    row = df.agg(
        F.approx_count_distinct("l_partkey").alias("a"),
        F.countDistinct("l_partkey").alias("e"),
    ).first()
    assert abs(row["a"] - row["e"]) / row["e"] < 0.05


def test_approx_percentile_close_to_exact(spark, sf_small):
    df = read_table(spark, sf_small, "lineitem")
    row = df.agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("a"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("e"),
    ).first()
    assert abs(row["a"] - row["e"]) / row["e"] < 0.02
