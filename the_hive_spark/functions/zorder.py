"""Z-order (Morton) clustering keys — multi-dimensional data layout.

Parquet prunes row groups by per-column min/max statistics, which a
1-D ``sortWithinPartitions`` only makes tight for ONE column. Sorting
by the bit-interleaved Z-value of two columns keeps BOTH columns'
ranges narrow inside every run of rows, so range predicates on either
dimension (or both) skip row groups — the technique behind
Delta/Iceberg OPTIMIZE ZORDER, built here from plain Spark column
expressions (shift/mask chains, JVM-side, codegen-friendly).

Usage with the layout writer::

    df = df.withColumn("_z", zorder2(F.col("ts_bucket"), F.col("user_bucket")))
    write_dataset(df, path, sort_within=["_z"])

Values must be non-negative; each coordinate contributes its low
``bits`` bits (default 31, the max that keeps the interleaved result
inside a positive int64). Rank-transform or bucket skewed/unbounded
columns first — Z-order locality is only as good as the value
distribution it interleaves.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# magic masks of the standard 2-D bit-spread (x -> even bit positions)
_SPREAD_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(col: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of ``col`` to even positions."""
    x = col.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder2(a: Column, b: Column, bits: int = 31) -> Column:
    """The 2-D Morton code of two non-negative integer columns:
    ``a``'s bits at even positions, ``b``'s at odd. Sorting by this
    value walks the Z-curve, clustering rows that are close in BOTH
    dimensions."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return _spread_bits(a, bits).bitwiseOR(
        F.shiftleft(_spread_bits(b, bits), 1)
    )
