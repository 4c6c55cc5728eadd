"""Bucketed-table layout for shuffle-free repeated joins.

At 100 TB the chunks↔documents and fact↔fact joins dominate; bucketing
both sides by the join key at write time makes every subsequent join
shuffle-free (SortMergeJoin with zero Exchange): each task reads
matching bucket files from both tables. This is the persistent-layout
complement to broadcast (small dims) and AQE (runtime fixes) — use it
for the joins you run every day on the same key.

Local note: Spark bucketing metadata lives in the session catalog, so
these write via ``saveAsTable`` with an explicit path (external
table). On a cluster the same call against the metastore is the real
deployment shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401  (callers compose exprs)
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | list[str],
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    ``n_buckets`` should divide evenly into cluster parallelism and
    keep bucket files in the 100 MB–1 GB band at target scale.
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables.

    With matching bucket specs, the planner emits SortMergeJoin with
    no Exchange on either side — verify with .explain; asserted in
    tests/test_bucketing.py.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
