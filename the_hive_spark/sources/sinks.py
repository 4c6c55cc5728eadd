"""Dataset sinks: layout-controlled parquet writers.

The reference's write path is row-at-a-time SQLite/Qdrant upserts
(SURVEY.md §2.1 S12-S16); the Spark engine's equivalent "ship a
dataset" operation is a partitioned, sorted, size-targeted parquet
write. Layout is as load-bearing as the query plan at 100 TB:

- partition columns give downstream readers partition pruning (the
  multi-tenancy predicate of §1.3 becomes a directory skip);
- sortWithinPartitions clusters rows so parquet row-group min/max
  stats prune inside files (Z-order-lite for the 1-D case) and
  run-length encoding compresses sorted keys;
- file sizing avoids both the many-tiny-files metadata explosion and
  the one-giant-file no-parallelism trap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    target_files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a pruning-friendly parquet dataset.

    ``repartition(partition cols)`` routes every output partition's
    rows to ``target_files_per_partition`` tasks, so each Hive-style
    directory holds a controlled file count instead of one shard per
    upstream task (the small-files failure mode: 32 tasks × 1000
    partitions = 32k files). At real scale, raise
    ``target_files_per_partition`` until files land near the 128 MB-1 GB
    sweet spot — or let AQE's rebalance do it with
    ``spark.sql.adaptive.coalescePartitions`` on a final shuffle.
    """
    out = df
    if partition_by:
        keys = [F.col(c) for c in partition_by]
        if target_files_per_partition > 1:
            # salt spreads one output partition over N files/tasks —
            # needed when a single partition value dominates (skew).
            # The explicit partition count pins the shuffle to
            # REPARTITION_BY_NUM, which AQE will NOT coalesce back to
            # one task (coalescing would silently undo the spread).
            salt = (F.crc32(F.concat_ws("|", *df.columns)) % target_files_per_partition)
            n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
            out = out.repartition(n, *keys, salt)
        else:
            out = out.repartition(*keys)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def ship_corpus(spark: SparkSession, sf_dir: str, path: str) -> int:
    """Materialize the filtered training corpus (doc_corpus_filtered ⋈
    text) to ``path``, partitioned by lang and clustered by doc_id.

    Returns the shipped row count. This is the terminal operator of
    the dedup/quality pipeline — the dataset a trainer reads.
    """
    from the_hive_spark.operators.dedup import doc_corpus_filtered
    from the_hive_spark.tables import table

    kept = doc_corpus_filtered(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = kept.join(docs, "doc_id").select(
        "doc_id", "lang", "source", "n_chars", "text"
    )
    write_dataset(
        corpus,
        path,
        partition_by=["lang"],
        sort_within=["doc_id"],
    )
    return spark.read.parquet(path).count()


def compact_dataset(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: int = 256,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
) -> dict:
    """Small-file compaction — the table-maintenance pass every
    long-lived dataset needs: streaming/incremental writers emit one
    file per micro-batch task, and a year of that turns scans into
    metadata storms (file listing + one footer read per file dominates
    the actual I/O).

    Reads ``src_path``, rewrites it to ``dst_path`` with
    ceil(bytes / target_mb) output files — explicit-count repartition,
    which AQE will not coalesce — preserving optional Hive
    partitioning and within-file sort order. Writing to a NEW path and
    swapping at the catalog/symlink level is deliberate: in-place
    compaction that deletes source files it is still reading is how
    datasets die. Returns before/after file counts and byte size.

    File size is measured by walking the local path (tests, local
    mode); a cluster deployment swaps in the Hadoop FileSystem
    listing — the plan is identical.
    """
    import math
    import os

    n_files_before = 0
    total_bytes = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                n_files_before += 1
                total_bytes += os.path.getsize(os.path.join(root, f))

    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    if partition_by:
        write_dataset(
            df,
            dst_path,
            partition_by=partition_by,
            sort_within=sort_within,
            target_files_per_partition=n_out,
        )
    else:
        out = df.repartition(n_out)
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        out.write.mode("overwrite").parquet(dst_path)

    n_files_after = sum(
        1
        for root, _dirs, files in os.walk(dst_path)
        for f in files
        if f.endswith(".parquet")
    )
    return {
        "files_before": n_files_before,
        "files_after": n_files_after,
        "bytes": total_bytes,
        "target_files": n_out,
    }
