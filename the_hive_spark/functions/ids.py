"""Deterministic id schemes (F3/F4, SURVEY.md §2.7).

The reference derives chunk ids as UUIDv5(SHA-1, namespace URL,
"{file_path}-{chunk_index}") so re-ingest is idempotent
(internal/server/ingest_handler.go:113-114, drone_client.go:40-42).
``uuid5_chunk_id`` reproduces those ids byte-for-byte (Python's
uuid.uuid5 is the same RFC-4122 construction) as a vectorized pandas
UDF. ``sha256_hex`` is the ST2 file-content hash — pure JVM.
"""

from __future__ import annotations

import uuid

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def _uuid5_url(name: pd.Series) -> pd.Series:
    ns = uuid.NAMESPACE_URL
    return name.map(lambda s: str(uuid.uuid5(ns, s)) if s is not None else None)


def uuid5_chunk_id(path: Column, chunk_index: Column) -> Column:
    """UUIDv5(ns=URL, "{path}-{index}") — bit-identical to the
    reference's ids, so idempotency tests can compare raw id values."""
    return _uuid5_url(F.concat(path, F.lit("-"), chunk_index.cast("string")))


def sha256_hex(content: Column) -> Column:
    """SHA-256 content hash for change detection (decision.go:101-114).
    Works on either binary or string columns; JVM-side."""
    return F.sha2(content, 256)


def digest_chunk_id(doc_id: Column, chunk_index: Column) -> Column:
    """Portable md5 digest id — same determinism contract as uuid5 but
    expressible in any SQL engine (used by oracle-checked queries)."""
    return F.md5(F.concat(doc_id.cast("string"), F.lit("-"), chunk_index.cast("string")))
