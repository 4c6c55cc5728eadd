"""Query registry: every implemented operator registers a Spark
callable and (when SQL-expressible) a DuckDB oracle here.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin re-exports of
this registry, so the driver's correctness gate and our own test
harness (tests/test_oracle_parity.py) see the identical surface.

Registration contract (mirrors the driver's comparator):
- the Spark callable takes (spark, sf_dir) and returns a DataFrame;
- result column names must match the oracle's exactly (the comparator
  sorts columns by name before hashing);
- float aggregation must be decimal-cast on BOTH sides so the hash is
  reproducible across engines (IEEE sums are order-dependent; decimal
  sums are exact).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    Import order IS driver-verification order: the driver's correctness
    gate checks the first 50 registrations, so families that have never
    had a driver-oracle row register first. This round's top-50 budget:
    timeline events_* (27) + text_analysis doc_* (17) + hive parity (6)
    = 50 hash-checked rows (pinned by tests/test_registry.py); the
    analytics/dedup/graph/media/rules/similarity blocks (driver-green
    in round 1) rotate back in next round. New oracled queries should
    register in LATE modules so this gate allocation stays stable.

    Round-3 rotation note: once this round's gate lands, the families
    with NO driver-oracle row yet are the round-2 additions —
    corpus_quality, entity_resolution, warehouse, the newer
    similarity/analytics entries (PQ/IVF-PQ evals, HHI/Gini/Benford,
    fuzzy match, SCD2/CDC, funnel, KS drift, TF-IDF …). Rotate those
    to the front of the next budget, then the round-1-green blocks.
    """
    from the_hive_spark.operators import (  # noqa: F401
        timeline,
        text_analysis,
    )
    from the_hive_spark import hive_queries  # noqa: F401
    from the_hive_spark.operators import (  # noqa: F401
        similarity,
        analytics,
        dedup,
        graph,
        multimodal,
        rules,
        corpus_quality,
        entity_resolution,
        warehouse,
    )
