"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the_hive_spark's query registry: every implemented
operator from SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame
callable plus, when SQL-expressible, a DuckDB oracle with identical
column names and engine-stable (integer/decimal-exact) aggregates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from the_hive_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLES)
