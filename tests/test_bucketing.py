"""Bucketed layout: joining two identically-bucketed tables must plan
zero Exchange (the co-located big-big join that survives 100 TB)."""

from __future__ import annotations

import pytest

from the_hive_spark.functions.bucketing import colocated_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(5_000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bkt_a", "k", n_buckets=8, path=str(tmp_path / "a"))
    write_bucketed(b, "bkt_b", "k", n_buckets=8, path=str(tmp_path / "b"))
    yield "bkt_a", "bkt_b"
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    # force the join path (not broadcast) so the assertion is about
    # bucketing, not about the small test size
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "identically-bucketed tables must join without a shuffle"
        )
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correctness(spark, bucketed_pair):
    left, right = bucketed_pair
    rows = colocated_join(spark, left, right, "k").orderBy("k").limit(3).collect()
    assert [(r["k"], r["va"], r["vb"]) for r in rows] == [
        (0, 0, 0), (1, 2, 3), (2, 4, 6),
    ]
