"""The ad-hoc SQL surface (register_views + spark.sql) must agree with
the curated DataFrame operators — Catalyst should plan both to the
same answer, proving the views are a full general-purpose query
surface and not just a demo."""

from __future__ import annotations

import pyspark.sql.functions as F

from the_hive_spark.tables import register_views

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_equals_dataframe_q1(spark):
    from the_hive_spark.registry import QUERIES, load_all

    load_all()
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = (
        QUERIES["q1_pricing_summary"](spark, SF_DIR)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    )
    assert _rows(sql) == _rows(df)


def test_sql_join_pushdown_matches(spark):
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    from the_hive_spark.tables import table

    df = (
        table(spark, SF_DIR, "customer")
        .join(
            table(spark, SF_DIR, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    assert _rows(sql) == _rows(df)


def test_sql_events_ts_normalized(spark):
    """The events view must carry the normalized TIMESTAMP ts (the raw
    parquet is TIMESTAMP(NANOS)); a raw read would throw or mismatch."""
    register_views(spark, SF_DIR)
    row = spark.sql(
        "SELECT MIN(ts) AS lo, MAX(ts) AS hi, COUNT(*) AS n FROM events"
    ).collect()[0]
    assert row["n"] > 0
    assert row["lo"].year >= 2000 and row["hi"].year <= 2100
