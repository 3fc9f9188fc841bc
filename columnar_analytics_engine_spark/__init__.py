"""columnar_analytics_engine_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference columnar engine (a single-node C++20
columnar store + query executor, see ``/root/reference``), extended to
the full relational surface (joins, windows, sorts, set ops), Structured
Streaming, and large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): the reference spends ~70% of its code on
concerns Parquet + Catalyst already own (file format, encodings, zone
maps, vectorization).  This library therefore expresses every operator
declaratively through the DataFrame/SQL API and lets Catalyst/Tungsten
pick the physical strategy; Pandas UDFs are used only where built-in
operators genuinely can't express the semantics (MinHash, SimHash,
multimodal decode).
"""

from columnar_analytics_engine_spark.session import get_spark
from columnar_analytics_engine_spark.io import read_table, write_table, describe
from columnar_analytics_engine_spark.ops import Query, CompareOp, AggFunc

__all__ = [
    "get_spark",
    "read_table",
    "write_table",
    "describe",
    "Query",
    "CompareOp",
    "AggFunc",
]

__version__ = "0.1.0"
