"""Further TPC-H adaptations (Q4/Q7/Q9/Q14/Q18/Q19 shapes).

Adapted where the driver fixture lacks columns (no l_commitdate /
l_receiptdate / ps_supplycost / c_phone): each docstring states the
adaptation.  Collectively these cover: EXISTS with correlated date
arithmetic, dual-aliased dimension joins, disjunctive multi-conjunct
predicates, conditional-aggregate ratios, and having-gated semi joins —
the relational shapes the simpler queries don't reach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.queries._util import (
    QuerySpec,
    exact_sum,
    sql_exact_sum,
    t,
)

def _rev() -> F.Column:
    """Discounted revenue (built lazily — Column construction needs an
    active SparkContext, so no module-level Column objects)."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1.0 - l_discount)"


def tpch_q4_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (adapted: no l_commitdate — 'late'
    means shipped >60 days after the order date)."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: revenue shipped between NATION_1 and NATION_2 in either
    direction, by year — dual-aliased nation dimension."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    supplier = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(exact_sum(_rev(), "revenue", scale=10_000))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q9_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit (adapted: no ps_supplycost — profit is
    discounted revenue), for parts with 'red' in the name, by supplier
    nation and order year."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supplier = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(exact_sum(_rev(), "sum_profit", scale=10_000))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: promo revenue share in one month.  The
    ratio divides two exact scaled-integer sums, so it is bit-stable."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cents = F.round(_rev() * F.lit(10_000.0)).cast("long")
    promo = F.sum(F.when(F.col("p_type").startswith("PROMO"), cents).otherwise(F.lit(0)))
    total = F.sum(cents)
    return joined.agg(
        ((promo.cast("double") / total.cast("double")) * F.lit(100.0)).alias(
            "promo_revenue_pct"
        ),
        F.count("*").alias("n_rows"),
    )


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds
    300, with customer detail, top-100."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 300.0)
    )
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under an OR of three brand/size/quantity
    conjunct groups — the disjunctive-pushdown stress case."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1.0, 11.0))
    )
    c2 = (
        (F.col("p_brand") == "Brand#15")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10.0, 20.0))
    )
    c3 = (
        (F.col("p_brand") == "Brand#6")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20.0, 30.0))
    )
    return j.filter(c1 | c2 | c3).agg(
        exact_sum(_rev(), "revenue", scale=10_000), F.count("*").alias("n_rows")
    )


QUERIES: dict[str, QuerySpec] = {
    "tpch_q4_adapted": QuerySpec(
        tpch_q4_adapted,
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "TPC-H Q4 (adapted): late-shipping order counts by priority",
        ("tpch", "join"),
    ),
    "tpch_q7_volume_shipping": QuerySpec(
        tpch_q7_volume_shipping,
        f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               {sql_exact_sum(_REV_SQL, 'revenue', 10_000)}
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year
        """,
        "TPC-H Q7: bilateral shipping volume by year",
        ("tpch", "join"),
    ),
    "tpch_q9_adapted": QuerySpec(
        tpch_q9_adapted,
        f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               {sql_exact_sum(_REV_SQL, 'sum_profit', 10_000)}
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
        """,
        "TPC-H Q9 (adapted): nation profit by year",
        ("tpch", "join"),
    ),
    "tpch_q14_promo_revenue": QuerySpec(
        tpch_q14_promo_revenue,
        f"""
        SELECT (CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN CAST(ROUND(({_REV_SQL}) * CAST(10000 AS DOUBLE)) AS BIGINT)
                         ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CAST(ROUND(({_REV_SQL}) * CAST(10000 AS DOUBLE)) AS BIGINT)) AS DOUBLE))
               * 100.0 AS promo_revenue_pct,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
        """,
        "TPC-H Q14: promo revenue share (exact-ratio)",
        ("tpch", "agg"),
    ),
    "tpch_q18_large_orders": QuerySpec(
        tpch_q18_large_orders,
        f"""
        WITH big AS (
          SELECT l_orderkey, {sql_exact_sum('l_quantity', 'total_qty')}
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(ROUND(l_quantity * CAST(100 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
                 / CAST(100 AS DOUBLE) > 300.0
        )
        SELECT c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice, total_qty
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """,
        "TPC-H Q18: large-volume orders top-100",
        ("tpch", "join"),
    ),
    "tpch_q19_disjunctive": QuerySpec(
        tpch_q19_disjunctive,
        f"""
        SELECT {sql_exact_sum(_REV_SQL, 'revenue', 10_000)},
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1.0 AND 11.0)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10.0 AND 20.0)
           OR (p_brand = 'Brand#6' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20.0 AND 30.0)
        """,
        "TPC-H Q19: disjunctive predicate revenue",
        ("tpch", "filter"),
    ),
}


def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer distribution: histogram of orders-per-customer
    (left join keeps zero-order customers; adapted: the order filter is
    on priority instead of the absent o_comment)."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: supplier(s) with maximum quarterly revenue —
    the revenue-view + scalar-max pattern, exact-arithmetic so the max
    comparison is deterministic."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supplier = t(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(exact_sum(_rev(), "total_revenue", scale=10_000))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == F.col("m"))
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: lineitems of one brand whose
    quantity is below 20% of that part's average quantity; correlated
    average decorrelated into a per-part aggregate join."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    qty_cents = F.round(F.col("l_quantity") * F.lit(100.0)).cast("long")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            (F.sum(qty_cents).cast("double") / F.count("*").cast("double"))
            / F.lit(100.0)
        ).alias("avg_qty")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
    )
    price_cents = F.round(F.col("l_extendedprice") * F.lit(100.0)).cast("long")
    return joined.agg(
        ((F.sum(price_cents).cast("double") / F.lit(100.0)) / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count("*").alias("n_rows"),
    )


QUERIES["tpch_q13_custdist"] = QuerySpec(
    tpch_q13_custdist,
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
      GROUP BY c_custkey) pc
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "TPC-H Q13: orders-per-customer distribution",
    ("tpch", "join"),
)

QUERIES["tpch_q15_top_supplier"] = QuerySpec(
    tpch_q15_top_supplier,
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_exact_sum(_REV_SQL, 'total_revenue', 10_000)}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON supplier_no = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    "TPC-H Q15: top revenue supplier",
    ("tpch", "join"),
)

QUERIES["tpch_q17_small_quantity"] = QuerySpec(
    tpch_q17_small_quantity,
    """
    WITH per_part AS (
      SELECT l_partkey AS pk,
             (CAST(SUM(CAST(ROUND(l_quantity * CAST(100 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) / CAST(100 AS DOUBLE) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT (CAST(SUM(CAST(ROUND(l_extendedprice * CAST(100 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
            / CAST(100 AS DOUBLE)) / 7.0 AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN per_part ON l_partkey = pk
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * avg_qty
    """,
    "TPC-H Q17: small-quantity-order revenue",
    ("tpch", "agg"),
)


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: one nation's revenue share of its
    region's total per order year — conditional-aggregate ratio of two
    exact integer sums."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    cents4 = F.round(_rev() * F.lit(10_000.0)).cast("long")
    target = F.sum(F.when(F.col("n_name") == "NATION_5", cents4).otherwise(F.lit(0)))
    total = F.sum(cents4)
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (target.cast("double") / total.cast("double")).alias("mkt_share"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("o_year")
    )


def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship (adapted: supplier-part pairs come
    from lineitem instead of the absent partsupp table): distinct
    supplier count per (brand, type-prefix, size)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 9, 13, 17))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.substring("p_type", 1, 3).alias("type_prefix"),
            F.col("p_size").cast("long").alias("p_size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "type_prefix", "p_size")
    )


def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity (adapted: country code is the
    customer key modulo 7 — the fixture has no phone column): customers
    with above-average positive balance and no urgent orders, per code
    (the fixture has no fully order-less customers)."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * F.lit(100.0)).cast("long")
    avg_pos = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                (F.sum(cents).cast("double") / F.count("*").cast("double"))
                / F.lit(100.0)
            ).alias("avg_bal")
        )
    )
    rich = (
        customer.join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "left_anti",
        )
    )
    return (
        rich.groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(F.count("*").alias("numcust"), exact_sum("c_acctbal", "totacctbal"))
        .orderBy("cntrycode")
    )


QUERIES["tpch_q8_market_share"] = QuerySpec(
    tpch_q8_market_share,
    f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n_name = 'NATION_5'
                    THEN CAST(ROUND(({_REV_SQL}) * CAST(10000 AS DOUBLE)) AS BIGINT)
                    ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(ROUND(({_REV_SQL}) * CAST(10000 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
             AS mkt_share,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY 1 ORDER BY o_year
    """,
    "TPC-H Q8: national market share per year",
    ("tpch", "join"),
)

QUERIES["tpch_q16_supplier_count"] = QuerySpec(
    tpch_q16_supplier_count,
    """
    SELECT p_brand, SUBSTRING(p_type, 1, 3) AS type_prefix,
           CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand != 'Brand#1' AND p_size IN (1, 5, 9, 13, 17)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, type_prefix, p_size
    """,
    "TPC-H Q16 (adapted): supplier counts per part attribute",
    ("tpch", "agg"),
)

QUERIES["tpch_q22_idle_customers"] = QuerySpec(
    tpch_q22_idle_customers,
    f"""
    WITH avg_pos AS (
      SELECT (CAST(SUM(CAST(ROUND(c_acctbal * CAST(100 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) / CAST(100 AS DOUBLE) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_custkey % 7 AS cntrycode,
           COUNT(*) AS numcust,
           {sql_exact_sum('c_acctbal', 'totacctbal')}
    FROM customer, avg_pos
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY 1 ORDER BY cntrycode
    """,
    "TPC-H Q22 (adapted): idle high-balance customers",
    ("tpch", "join"),
)
