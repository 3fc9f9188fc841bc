"""Scalar/array function helpers: text analysis, similarity, hashing."""

from columnar_analytics_engine_spark.functions.hashing import h60, sql_h60
from columnar_analytics_engine_spark.functions.text import tokens, distinct_tokens

__all__ = ["h60", "sql_h60", "tokens", "distinct_tokens"]
