"""Unit tests for the large-star/small-star connected components
operator (operators/graph.py) — the scale path behind
doc_dup_clusters."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from the_hive_spark.operators.graph import connected_components

# both execution paths must agree: driver union-find (small edge
# lists) and distributed star-contraction (local_threshold=0)
pytestmark = pytest.mark.parametrize("threshold", [1_000_000, 0])


def _components(
    spark, edges: list[tuple[int, int]], threshold: int
) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, local_threshold=threshold).collect()
    }


def test_cc_two_components(spark, threshold):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)], threshold)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain(spark, threshold):
    """A path graph is the worst case for naive label propagation
    (diameter rounds); star-contraction must still converge fast."""
    n = 64
    got = _components(spark, [(i, i + 1) for i in range(n)], threshold)
    assert got == {i: 0 for i in range(n + 1)}


def test_cc_direction_and_dup_invariant(spark, threshold):
    """Edge direction, duplicate edges, and self-loops don't change
    the result."""
    base = _components(spark, [(1, 2), (3, 2)], threshold)
    messy = _components(spark, [(2, 1), (1, 2), (2, 3), (3, 3), (3, 2)], threshold)
    assert base == messy == {1: 1, 2: 1, 3: 1}


def test_cc_min_id_is_canonical(spark, threshold):
    """Component label is the minimum node id, independent of the
    order edges arrive in."""
    edges = [(9, 5), (5, 7), (100, 7), (42, 100)]
    got = _components(spark, edges, threshold)
    assert set(got.values()) == {5}
