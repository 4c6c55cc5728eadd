"""Size-adaptive partitioning for derived datasets.

Iterative operators (k-core peeling, triangle join, dedup clustering)
run many stages over a derived dataset that is orders of magnitude
smaller than the fact table it came from — a 7k-row edge list inherits
the fact scan's 32-64 partitions, and every subsequent round pays
(tasks × stages) scheduling overhead for partitions holding ~100 rows
each. AQE coalesces *shuffle* reads, but it cannot re-partition an
already-persisted RDD: every stage that re-reads the cache launches one
task per cached block.

``persist_right_sized`` measures the dataset once (the count also
materializes the cache) and, when it is over-partitioned for its size,
re-persists a coalesced copy so downstream rounds run at a task count
matched to the data. At 100 TB the same call is a no-op: the measured
row count keeps ``rows_per_partition`` worth of data in every
partition, so big derived sets stay at full cluster parallelism —
this is sizing to measured statistics, not a small-data shortcut.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Fixed-width long/int rows: ~500k rows is a few MB per partition —
# far below executor memory, big enough that task overhead is noise.
DEFAULT_ROWS_PER_PARTITION = 500_000


def persist_right_sized(
    df: DataFrame,
    rows_per_partition: int = DEFAULT_ROWS_PER_PARTITION,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> tuple[DataFrame, int]:
    """Persist ``df`` with a partition count matched to its measured size.

    Returns ``(persisted_df, row_count)``. The input pipeline runs
    exactly once (for the measuring count); if the natural partition
    count is already right, that first persist is kept as-is.
    """
    first = df.persist(storage_level)
    n = first.count()
    current = first.rdd.getNumPartitions()
    target = max(1, min(current, (n + rows_per_partition - 1) // rows_per_partition))
    if target >= current:
        return first, n
    # Coalesce reads the already-cached blocks (narrow dependency — no
    # shuffle, no recompute of the input pipeline), so re-persisting
    # the compact copy costs one cheap pass.
    compact = first.coalesce(target).persist(storage_level)
    compact.count()
    first.unpersist()
    return compact, n
