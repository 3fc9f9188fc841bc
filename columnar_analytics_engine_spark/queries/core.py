"""Reference-parity queries: scan / projection / filter / agg / group-by.

This is the complete operator surface of the reference engine
(SURVEY.md §2; columnar-analytics-engine/src/execution.cpp), expressed
over the driver's TPC-H-ish tables.  Each query exists both as a
DataFrame program (via the ``Query`` builder where the shape fits, to
exercise the parity API) and as DuckDB oracle SQL.

Scale notes: every query here is scan→(filter)→(agg) shaped.  Catalyst
pushes the filters and projections into the Parquet scan (PushedFilters
/ ReadSchema in .explain), the reference's zone-map skipping
(src/execution.cpp:48-71) becomes row-group pruning, and aggregation
runs partial→shuffle→final, so the same plan holds at 100 TB — the only
shuffle is on the (low-cardinality) group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.ops import AggFunc, CompareOp, Query
from columnar_analytics_engine_spark.queries._util import (
    QuerySpec,
    exact_sum,
    sql_exact_sum,
    t,
)


# -- scans --------------------------------------------------------------------

def scan_full_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan row count (reference Q1, benches/benchmark.cpp:97-124).

    Unfiltered COUNT(*) is answered from Parquet footer metadata — the
    industrial version of the reference's 'COUNT scans only the first
    column' shortcut (src/execution.cpp:283-289).
    """
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning (setProjection, src/execution.cpp:235-237): the
    Parquet scan reads exactly these three columns (ReadSchema)."""
    q = Query(t(spark, sf_dir, "lineitem"))
    return q.set_projection(["l_orderkey", "l_linenumber", "l_quantity"]).execute()


# -- filters ------------------------------------------------------------------

def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-composed predicates (src/execution.cpp:163-188), including a
    string equality the reference silently ignored (§2.12-4 — here it
    works and is pushed to the scan)."""
    q = (
        Query(t(spark, sf_dir, "lineitem"))
        .add_filter("l_quantity", CompareOp.GT, 45.0)
        .add_filter("l_discount", CompareOp.LE, 0.02)
        .add_filter("l_returnflag", CompareOp.EQ, "A")
        .set_projection(["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])
    )
    return q.execute()


def filter_six_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six comparison ops EQ NE LT LE GT GE (include/execution.h:39-46)
    in one conjunction."""
    q = (
        Query(t(spark, sf_dir, "lineitem"))
        .add_filter("l_linestatus", CompareOp.EQ, "F")
        .add_filter("l_suppkey", CompareOp.NE, 7)
        .add_filter("l_partkey", CompareOp.LT, 1000)
        .add_filter("l_linenumber", CompareOp.LE, 5)
        .add_filter("l_quantity", CompareOp.GT, 30.0)
        .add_filter("l_orderkey", CompareOp.GE, 100)
        .set_projection(["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])
    )
    return q.execute()


def filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan count (reference Q2, benches/benchmark.cpp:126-153)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 25.0)
        .agg(F.count("*").alias("n_rows"))
    )


# -- aggregates ---------------------------------------------------------------

def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate always returning count+sum+min+max together
    (AggResult, src/execution.cpp:296-334), with a filter (reference Q3
    shape, benches/benchmark.cpp:155-177)."""
    df = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 25.0)
    return df.agg(
        F.count("*").alias("row_count"),
        exact_sum("l_extendedprice", "sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


def agg_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-key group-by with count+sum+min+max and key-ascending output
    (reference Q4, src/execution.cpp:339-401; ordering §2.12-1)."""
    df = t(spark, sf_dir, "lineitem")
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("count"),
            exact_sum("l_quantity", "sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


def group_by_count_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-only group-by — the mode where the reference scans just the
    group column (src/execution.cpp:351-354)."""
    return (
        Query(t(spark, sf_dir, "lineitem")).set_group_by("l_linestatus").execute()
    )


def group_by_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + group-by + aggregate: the composed reference pipeline
    (scan → zone-map skip → residual filter → hash agg)."""
    df = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        df.groupBy("l_returnflag")
        .agg(F.count("*").alias("count"), exact_sum("l_extendedprice", "sum_price"))
        .orderBy("l_returnflag")
    )


def group_by_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key group-by (superset: reference allows exactly one string
    key, src/execution.cpp:367)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("count"), exact_sum("l_discount", "sum_disc"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def colfile_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``.col`` format round-trip: write ``orders`` key columns
    to the reference engine's own file format with the distributed
    colfile sink (one shard per task; DELTA keys, DICTIONARY status —
    per-column encoding control, include/format.h:49-61), read it back
    through the colfile DataSource (one scan partition per row group),
    and aggregate.  The oracle runs the same aggregate on the parquet
    source table, so a hash match proves the format encode→decode cycle
    is lossless end-to-end under Spark — the migration guarantee a
    reference user needs (their existing .col files are first-class
    inputs here; byte-level cross-validation against a compiled
    reference binary lives in tests/test_colfile.py)."""
    import hashlib
    import os
    import tempfile

    from columnar_analytics_engine_spark.io import read_colfile, write_colfile

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    # tag includes the pid so concurrent processes (bench + pytest on
    # the same sf_dir) never overwrite each other's shards mid-read;
    # within one process the rewrite is idempotent byte-for-byte
    tag = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/cae_colfile_q_{tag}"
    write_colfile(
        src, path,
        encodings={"o_orderkey": "delta", "o_custkey": "plain",
                   "o_orderstatus": "dictionary"},
    )
    return (
        read_colfile(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("sum_orderkey"),
            F.sum("o_custkey").alias("sum_custkey"),
        )
        .orderBy("o_orderstatus")
    )


def skipping_index_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level stats-skipping scan (manifest pruning): write
    ``orders`` range-sorted by ``o_custkey``, build the per-file stats
    index (distributed footer scan, ``skipping.build_stats_index``),
    prune the file manifest with a custkey-range predicate against the
    index, and aggregate ONLY the surviving files.  The oracle runs the
    same filter + aggregate over the source table, so a hash match
    proves pruning is a pure superset optimization — files are skipped,
    rows never are.  This is the reference's zone-map skip (SURVEY
    §2.2, ``src/execution.cpp`` ``Predicate::canSkipPage``) lifted one
    level up, to where it matters at 100 TB: the pruned files are never
    listed into tasks or footer-opened at scan time, the planning cost
    is one tiny index read, and the index itself maintains
    incrementally as the corpus appends (``update_stats_index``)."""
    import hashlib
    import os
    import tempfile

    from columnar_analytics_engine_spark.io import write_sorted
    from columnar_analytics_engine_spark.skipping import (
        build_stats_index,
        read_skipping,
    )

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tag = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    data = f"{tempfile.gettempdir()}/cae_skip_data_{tag}"
    index = f"{tempfile.gettempdir()}/cae_skip_idx_{tag}"
    write_sorted(src, data, ["o_custkey"], n_files=16)
    build_stats_index(spark, data, index)
    return (
        read_skipping(
            spark, data, index, "o_custkey ge 10 and o_custkey le 60"
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("sum_orderkey"),
            exact_sum("o_totalprice", "sum_price"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
        )
    )


QUERIES: dict[str, QuerySpec] = {
    "skipping_index_scan": QuerySpec(
        skipping_index_scan,
        f"""
        SELECT COUNT(*) AS n_orders,
               CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey,
               {sql_exact_sum('o_totalprice', 'sum_price')},
               MIN(o_custkey) AS min_cust,
               MAX(o_custkey) AS max_cust
        FROM orders
        WHERE o_custkey >= 10 AND o_custkey <= 60
        """,
        "file-level stats index: manifest pruning + exact residual filter "
        "(oracle on the unpruned source)",
        ("scale", "scan", "index", "format"),
    ),
    "colfile_roundtrip_agg": QuerySpec(
        colfile_roundtrip_agg,
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey,
               CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """,
        "native .col format write+read round-trip (oracle on the parquet source)",
        ("parity", "format", "source", "sink"),
    ),
    "scan_full_count": QuerySpec(
        scan_full_count,
        "SELECT COUNT(*) AS n_rows FROM lineitem",
        "full-scan count (reference benchmark Q1)",
        ("parity", "scan"),
    ),
    "scan_projection": QuerySpec(
        scan_projection,
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
        "projection / column pruning",
        ("parity", "scan"),
    ),
    "filter_conjunctive": QuerySpec(
        filter_conjunctive,
        """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity > 45.0 AND l_discount <= 0.02 AND l_returnflag = 'A'
        """,
        "conjunctive predicates incl. string equality",
        ("parity", "filter"),
    ),
    "filter_six_ops": QuerySpec(
        filter_six_ops,
        """
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        FROM lineitem
        WHERE l_linestatus = 'F' AND l_suppkey != 7 AND l_partkey < 1000
          AND l_linenumber <= 5 AND l_quantity > 30.0 AND l_orderkey >= 100
        """,
        "all six comparison operators",
        ("parity", "filter"),
    ),
    "filter_count": QuerySpec(
        filter_count,
        "SELECT COUNT(*) AS n_rows FROM lineitem WHERE l_quantity > 25.0",
        "filtered count (reference benchmark Q2)",
        ("parity", "filter"),
    ),
    "agg_global": QuerySpec(
        agg_global,
        f"""
        SELECT COUNT(*) AS row_count,
               {sql_exact_sum('l_extendedprice', 'sum_price')},
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price
        FROM lineitem WHERE l_quantity > 25.0
        """,
        "global count+sum+min+max (reference AggResult semantics)",
        ("parity", "agg"),
    ),
    "agg_group_by": QuerySpec(
        agg_group_by,
        f"""
        SELECT l_returnflag,
               COUNT(*) AS count,
               {sql_exact_sum('l_quantity', 'sum_qty')},
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "group-by with key-sorted output (reference benchmark Q4)",
        ("parity", "agg"),
    ),
    "group_by_count_only": QuerySpec(
        group_by_count_only,
        """
        SELECT l_linestatus, COUNT(*) AS count
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        "count-only group-by",
        ("parity", "agg"),
    ),
    "group_by_filtered": QuerySpec(
        group_by_filtered,
        f"""
        SELECT l_returnflag, COUNT(*) AS count,
               {sql_exact_sum('l_extendedprice', 'sum_price')}
        FROM lineitem
        WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "filter + group-by composition",
        ("parity", "agg"),
    ),
    "group_by_multi_key": QuerySpec(
        group_by_multi_key,
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS count,
               {sql_exact_sum('l_discount', 'sum_disc')}
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
        "multi-key group-by (superset of reference)",
        ("parity", "agg"),
    ),
}
