"""Exact interval-union aggregation — the sweep every span/segment
consumer shares (duplicated-span coverage, silence-run merging,
session overlap math).

Classic single-pass union: order a group's intervals by start, mark an
island wherever a start exceeds the running max of prior ends, then
each island contributes max(end) − min(start) + 1 covered positions.
All windows are partitioned BY the group key — bounded by the group's
interval count, parallel across groups, never corpus-wide.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def interval_union_length(
    df: DataFrame,
    group_col: str,
    start_col: str = "s",
    end_col: str = "e",
    out_col: str = "covered",
) -> DataFrame:
    """Per group: total INTEGER positions covered by the union of
    closed intervals [start, end]. Overlapping and touching intervals
    merge; adjacent-but-disjoint islands sum to the same total either
    way (the island boundary only matters for run STRUCTURE, not
    coverage — pinned by the hypothesis property test)."""
    w_prev = (
        Window.partitionBy(group_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(group_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        df.withColumn("_prev_max_e", F.max(end_col).over(w_prev))
        .withColumn(
            "_new_island",
            F.when(
                F.col("_prev_max_e").isNull()
                | (F.col(start_col) > F.col("_prev_max_e")),
                1,
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new_island").over(w_run))
    )
    return (
        islands.groupBy(group_col, "_island")
        .agg(
            (F.max(end_col) - F.min(start_col) + 1).alias("_cov")
        )
        .groupBy(group_col)
        .agg(F.sum("_cov").cast("bigint").alias(out_col))
    )
