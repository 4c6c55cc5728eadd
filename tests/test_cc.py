"""Unit tests for the large-star/small-star connected components
operator (operators/graph.py) — the scale path behind
doc_dup_clusters."""

from __future__ import annotations

import pyspark.sql.functions as F

from the_hive_spark.operators.graph import connected_components


def _components(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_cc_two_components(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain(spark):
    """A path graph is the worst case for naive label propagation
    (diameter rounds); star-contraction must still converge fast."""
    n = 64
    got = _components(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_cc_direction_and_dup_invariant(spark):
    """Edge direction, duplicate edges, and self-loops don't change
    the result."""
    base = _components(spark, [(1, 2), (3, 2)])
    messy = _components(spark, [(2, 1), (1, 2), (2, 3), (3, 3), (3, 2)])
    assert base == messy == {1: 1, 2: 1, 3: 1}


def test_cc_min_id_is_canonical(spark):
    """Component label is the minimum node id, independent of the
    order edges arrive in."""
    edges = [(9, 5), (5, 7), (100, 7), (42, 100)]
    got = _components(spark, edges)
    assert set(got.values()) == {5}
