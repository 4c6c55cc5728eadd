"""SparkSession factory tuned for the-hive-spark engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads),
but every setting here is chosen to also hold on a large multi-executor
cluster: AQE re-plans shuffles at runtime (coalescing small partitions,
splitting skewed ones, demoting sort-merge joins to broadcast when a
side turns out small), Arrow makes the unavoidable pandas-UDF hops
cheap, and the session timezone is pinned to UTC so timestamp semantics
are engine-independent (and match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_heap() -> str:
    """min(20g, ~70% of physical RAM), whole GiB, floor 2g."""
    try:
        page = os.sysconf("SC_PAGE_SIZE")
        phys = os.sysconf("SC_PHYS_PAGES") * page
    except (ValueError, OSError, AttributeError):
        return "20g"
    return f"{max(2, min(20, int(phys * 0.7 / 2**30)))}g"

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "the-hive-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-ready defaults.

    On a real cluster, drop ``master`` and let the submit environment
    decide; everything else carries over unchanged.
    """
    # Executor python workers must be able to import this package (our
    # pandas UDFs close over it). Locally that means PYTHONPATH before
    # the JVM gateway starts; on a cluster, ship a wheel / --py-files.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- correctness-critical ---
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (events.ts) reads as LongType ns;
        # tables.py converts to µs timestamps (Spark has no ns precision)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- adaptive execution: the 100TB insurance policy ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- python/JVM boundary: Arrow batches, never per-row pickle ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: 128MB splits, the parquet sweet spot ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # quieter local runs
        .config("spark.ui.enabled", "false")
        # local-mode heap: the "driver" JVM IS the whole cluster here
        # (all 32 task threads + block manager + any collected result
        # share it), so size it like an executor fleet, not a driver.
        # 20g keeps a full sf1 sweep (6M-row facts, FP-growth, multi-
        # million-row result hashing) inside one session — but capped
        # at ~70% of physical RAM so a smaller dev box gets a JVM the
        # OOM killer won't take down mid-run (an unconditional virtual
        # -Xmx *starts* fine there and dies later, which is worse).
        # Override with SPARK_DRIVER_MEMORY either way.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_heap()),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
