"""S5 — parser dispatch by extension, as an Arrow-batched pandas UDF.

Reference: internal/parser/dispatcher.go:12-77 (ParseFile routing,
IsSupportedFile whitelist, IsTemporaryFile skip). The Spark form takes
the ``binaryFile`` source's (path, content) columns and produces the
extracted text; parse failures yield null so a downstream
``filter(parsed IS NOT NULL)`` drops them without failing the job
(the reference logs-and-skips per file the same way).

Scale: one Python worker call per Arrow batch, not per file; the
binary content never round-trips through the driver.
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import StringType

from the_hive_spark.sources import parsers

SUPPORTED_EXTENSIONS = {
    ".pdf", ".docx", ".txt", ".md", ".xlsx", ".xls", ".html", ".htm", ".eml",
}

_PARSERS = {
    ".pdf": parsers.parse_pdf,
    ".docx": parsers.parse_docx,
    ".txt": parsers.parse_text,
    ".md": parsers.parse_text,
    ".xlsx": parsers.parse_xlsx,
    ".xls": parsers.parse_xlsx,  # modern .xls exports are zip-based; legacy BIFF unsupported
    ".html": parsers.parse_html,
    ".htm": parsers.parse_html,
    ".eml": parsers.parse_eml,
}


def is_supported_file(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in SUPPORTED_EXTENSIONS


def is_temporary_file(path: str) -> bool:
    base = os.path.basename(path)
    return base.startswith("~$") or base.startswith("._") or base.endswith(".tmp")


def parse_bytes(path: str, data: bytes) -> str:
    """Route by extension (dispatcher.go:12-49). Raises on unsupported."""
    ext = os.path.splitext(path)[1].lower()
    fn = _PARSERS.get(ext)
    if fn is None:
        raise ValueError(f"unsupported file type: {ext}")
    return fn(data)


@F.pandas_udf(StringType())
def parse_file_udf(path: pd.Series, content: pd.Series) -> pd.Series:
    """(path, binary content) -> extracted text; null on parse failure."""

    def one(p, data):
        if data is None:
            return None
        try:
            return parse_bytes(p, bytes(data))
        except Exception:
            return None

    return pd.Series([one(p, d) for p, d in zip(path, content)])
