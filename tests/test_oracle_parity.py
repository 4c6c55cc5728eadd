"""Every registered query must match its DuckDB oracle — the local
mirror of the driver's correctness gate (row count + schema + values).

Runs at sf0.001 for speed in the default suite; set
HIVE_SPARK_PARITY_SF=/root/testdata/sf0.01 to run at the driver's SF.
"""

from __future__ import annotations

import os

import pytest

from the_hive_spark import registry
from the_hive_spark.oracle import compare

registry.load_all()

SF_DIR = os.environ.get("HIVE_SPARK_PARITY_SF", "/root/testdata/sf0.001")

_ORACLE_CASES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", _ORACLE_CASES)
def test_oracle_parity(spark, name):
    result = compare(spark, name, registry.QUERIES[name], registry.ORACLES[name], SF_DIR)
    assert result.ok, f"{name}: {result.detail}"


def test_all_queries_return_rows(spark):
    """Queries without an oracle still must run and return a DataFrame."""
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
