"""Relational analytics over the TPC-H-ish tables.

These exercise the engine's core relational surface — the same
filter/join/agg/sort/limit primitives the reference composes in its Go
handlers (SURVEY.md §2.2-2.6) — expressed declaratively so Catalyst
gets predicate pushdown, column pruning, and join planning for free.

Scale notes (100 TB):
- every query filters/prunes at the parquet scan (verify with
  .explain: PushedFilters / ReadSchema);
- small dimensions (region/nation/supplier/customer at TPC-H ratios)
  broadcast automatically under AQE; the big fact (lineitem/events)
  never shuffles more than once per agg;
- monetary aggregates are computed as exact BIGINT cents
  (FLOOR(x*100 + 0.5) per row — identical IEEE double math in any
  engine, then an exact integer sum that is independent of partition
  count and reduction order). Float sums are order-dependent and would
  make results nondeterministic across cluster sizes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from the_hive_spark.registry import query
from the_hive_spark.tables import table


def cents(expr: Column) -> Column:
    """Exact half-up rounding of a money double to integer cents.

    floor(x*100 + 0.5) evaluates identically in Spark and any ANSI
    engine (single IEEE ops), unlike round(), whose tie-breaking
    differs between engines.
    """
    return F.floor(expr * 100 + F.lit(0.5)).cast("bigint")


# per-row revenue in cents: l_extendedprice * (1 - l_discount)
_REV = None  # placeholder so module reads top-to-bottom; see _rev()


def _rev() -> Column:
    return cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


_REV_SQL = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# TPC-H-flavored relational queries
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS sum_disc_price_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: one pass over the fact, map-side partial agg, tiny result."""
    li = table(spark, sf_dir, "lineitem")
    charge = cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).cast("bigint").alias("sum_base_price_cents"),
            F.sum(_rev()).cast("bigint").alias("sum_disc_price_cents"),
            F.sum(charge).cast("bigint").alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter broadcast into the fact join, top-10."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("bigint").alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
    )


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_quantity > 45
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: left-semi join (EXISTS) then count by priority."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join; dims broadcast, fact shuffles once."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("bigint").alias("revenue_cents"))
    )


@query(
    "q6_revenue_forecast",
    oracle="""
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + pushed filters + single global agg."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(cents(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("bigint")
        .alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("bigint").alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue_cents", "n_name")
    )


@query(
    "q_brand_volume",
    oracle=f"""
SELECT p_brand,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def q_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(part) → per-brand volume rollup."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"),
            F.sum(_rev()).cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_top_supplier_per_nation",
    oracle=f"""
WITH srev AS (
  SELECT s_nationkey, s_suppkey, s_name,
         CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_nationkey, s_suppkey, s_name
), ranked AS (
  SELECT n_name, s_name, revenue_cents,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue_cents DESC, s_suppkey) AS rn
  FROM srev JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, s_name, revenue_cents FROM ranked WHERE rn = 1
""",
)
def q_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group via ranked window (SURVEY §2.5 top-k pattern)."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    srev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey", "s_name")
        .agg(F.sum(_rev()).cast("bigint").alias("revenue_cents"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue_cents"), F.asc("s_suppkey"))
    return (
        srev.join(F.broadcast(nation), srev.s_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", "s_name", "revenue_cents")
    )


@query(
    "q_mktsegment_yearly",
    oracle="""
SELECT c_mktsegment,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, order_year
""",
)
def q_mktsegment_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-joined yearly rollup (A9-style tally at warehouse scale)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("c_mktsegment", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).cast("bigint").alias("total_price_cents"),
        )
    )


@query(
    "q16_part_supplier_variety",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4, 5)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct aggregation after a fact join.

    count(DISTINCT) adds an expand+dedup stage; the part-side filter
    prunes at the scan and the filtered part table broadcasts.
    """
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey, 0.2 * AVG(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM({_REV_SQL}) AS BIGINT) AS small_lot_revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem JOIN avg_qty ON l_partkey = ap_partkey
WHERE l_quantity < threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    self-agg + join (the rewrite every optimizer applies — expressed
    directly so the plan is one shuffle for the agg, then a join that
    AQE converts to broadcast when the agg side is small)."""
    li = table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("threshold")
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.sum(_rev()).cast("bigint").alias("small_lot_revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q22_idle_customers",
    oracle="""
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_acctbal_cents
FROM customer
WHERE c_acctbal > 0
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS as a left-anti join — positive-
    balance customers with no urgent order, rolled up by nation. The
    anti join's build side is the filtered orders projection (one
    pruned column) and AQE broadcasts it."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(cents(F.col("c_acctbal"))).cast("bigint")
            .alias("total_acctbal_cents"),
        )
    )


@query(
    "q_active_parts_semi",
    oracle="""
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_retailprice > 990
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_returnflag = 'R')
GROUP BY p_brand
""",
)
def q_active_parts_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: premium parts with at least one
    returned lineitem. The semi join deduplicates the fact side
    without a distinct — one shuffle, no row multiplication."""
    part = table(spark, sf_dir, "part").filter(F.col("p_retailprice") > 990)
    returned = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_partkey")
    return (
        part.join(returned, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
