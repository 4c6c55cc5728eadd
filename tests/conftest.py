from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from the_hive_spark.compat import ensure_tws_protobuf  # noqa: E402
from the_hive_spark.session import get_spark  # noqa: E402

# Worker env freezes when the session fixture launches the JVM, so the
# transformWithState protobuf shim (no-op where protobuf is installed)
# must be wired before any test builds the session. The TWS tests
# themselves skip when this returns False.
TWS_AVAILABLE = ensure_tws_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="the-hive-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
