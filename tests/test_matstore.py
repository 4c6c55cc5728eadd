"""Materialization store and right-sizing: build-once semantics,
keying, eviction, and measured partition sizing."""

from __future__ import annotations

import pyspark.sql.functions as F

from the_hive_spark.functions import matstore
from the_hive_spark.functions.partitioning import persist_right_sized


def test_materialized_builds_once_per_key(spark):
    matstore.clear()
    calls = []

    def build():
        calls.append(1)
        return spark.range(10).withColumn("v", F.col("id") * 2)

    a = matstore.materialized(spark, ("t", "k1"), build)
    b = matstore.materialized(spark, ("t", "k1"), build)
    assert len(calls) == 1
    assert a is b
    assert a.count() == 10

    matstore.materialized(spark, ("t", "k2"), build)
    assert len(calls) == 2
    matstore.clear()


def test_materialized_stores_plain_values(spark):
    matstore.clear()
    v1 = matstore.materialized(spark, ("vocab", "x"), lambda: [3, 1, 2])
    v2 = matstore.materialized(spark, ("vocab", "x"), lambda: [9, 9, 9])
    assert v1 == [3, 1, 2]
    assert v2 is v1, "second build must not run"
    matstore.clear()


def test_materialized_lru_eviction(spark):
    matstore.clear()
    old_max = matstore.MAX_ENTRIES
    matstore.MAX_ENTRIES = 2
    try:
        calls = []

        def make(name):
            def build():
                calls.append(name)
                return name

            return build

        matstore.materialized(spark, ("e", "a"), make("a"))
        matstore.materialized(spark, ("e", "b"), make("b"))
        matstore.materialized(spark, ("e", "c"), make("c"))  # evicts a
        matstore.materialized(spark, ("e", "a"), make("a"))  # rebuild
        assert calls == ["a", "b", "c", "a"]
    finally:
        matstore.MAX_ENTRIES = old_max
        matstore.clear()


def test_persist_right_sized_coalesces_small(spark):
    df = spark.range(1000).repartition(32)
    out, n = persist_right_sized(df)
    assert n == 1000
    assert out.rdd.getNumPartitions() == 1
    assert out.count() == 1000
    out.unpersist()


def test_persist_right_sized_keeps_large_parallel(spark):
    df = spark.range(100_000).repartition(8)
    out, n = persist_right_sized(df, rows_per_partition=10_000)
    assert n == 100_000
    # 100k rows at 10k/partition wants 10, but never MORE than current
    assert out.rdd.getNumPartitions() == 8
    out.unpersist()
