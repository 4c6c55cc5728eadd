"""Quantized-vector primitives shared by the similarity operators and
the hive-parity query surface.

Float cosine is not reproducible across engines (IEEE summation order
differs), so every oracle-checked similarity query quantizes elements
to integer milli-units first: floor(float64(x)*1000 + 0.5). Dot
products are then exact int64 arithmetic and hash identically on any
engine and any partitioning. The three images of the same arithmetic —
Spark SQL, DuckDB SQL, numpy — live here so they can never drift apart.

Kept free of registry imports: modules that only need the arithmetic
(e.g. hive_queries) must not transitively register the similarity
query family, because registration order is the driver's verification
order (see registry.load_all).
"""

from __future__ import annotations

import numpy as np

# integer milli-unit quantization of a float element
Q_SPARK = "CAST(FLOOR(CAST({x} AS DOUBLE) * 1000 + 0.5) AS BIGINT)"
Q_DUCK = "CAST(FLOOR(CAST({x} AS DOUBLE) * 1000 + 0.5) AS BIGINT)"


def qdot_spark(a: str, b: str) -> str:
    """Spark SQL fragment: exact int64 dot product of two quantized
    float-array columns (JVM fold, no UDF)."""
    xa = Q_SPARK.format(x="x")
    xb = Q_SPARK.format(x="y")
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> {xa} * {xb}), 0L, (acc, v) -> acc + v)"
    )


def qvec_spark(a: str) -> str:
    """Spark SQL fragment: quantize a float array column to its int64
    milli-unit image ONCE. Pair-scoring operators (batch kNN, hard-
    negative mining) materialize this per side before the cross join,
    so the per-pair expression is a plain integer zip-fold instead of
    re-quantizing both vectors for every (row, query) combination —
    same integers, ~3× less expression work in the |corpus|×|Q| stage."""
    xq = Q_SPARK.format(x="x")
    return f"transform({a}, x -> {xq})"


def dot_spark(a: str, b: str) -> str:
    """Spark SQL fragment: int64 dot product of two ALREADY-quantized
    (bigint array) columns."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def qdot_duck(a: str, b: str) -> str:
    """DuckDB SQL fragment computing the identical int64 dot product."""
    ea = Q_DUCK.format(x=f"{a}[i]")
    eb = Q_DUCK.format(x=f"{b}[i]")
    return f"list_sum(list_transform(range(1, len({a}) + 1), i -> {ea} * {eb}))"


def quantize_block(col) -> np.ndarray:
    """pandas Series of float arrays → (n, d) int64 milli-unit matrix.

    floor(float64(x)·1000 + 0.5) elementwise — the numpy image of
    ``Q_SPARK``/``Q_DUCK``, so every downstream integer dot product
    is bit-identical to the SQL engines' arithmetic.
    """
    return np.floor(
        np.array(col.tolist(), dtype=np.float64) * 1000.0 + 0.5
    ).astype(np.int64)
