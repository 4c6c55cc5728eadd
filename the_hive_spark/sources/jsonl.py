"""JSONL corpus interchange: the de-facto format LLM training corpora
ship in (one JSON object per line, a ``text`` field plus free-form
metadata — the layout of The Pile / C4 / RedPajama-style dumps).

This module is the boundary adapter between that world and the
engine's ``documents`` schema (doc_id bigint, text, lang, source,
n_chars): ``read_jsonl_corpus`` normalizes any JSONL dump into it, and
``write_jsonl_shards`` exports a corpus back out in shard-count-
controlled JSONL.

Scale notes:
- the reader takes an EXPLICIT schema — JSON schema inference is a
  full extra pass over 100 TB and is never acceptable on the hot path;
- absent ids are derived as the md5 of the text (hex prefix → int64):
  deterministic across engines/runs, and byte-identical documents
  collapse onto one id — which is exactly the exact-dedup semantic
  the downstream pipeline wants at ingestion;
- the shard writer pins an explicit repartition count (AQE will not
  coalesce an explicit-N shuffle), so output shard count — and thus
  shard size — is controlled rather than inherited from upstream
  task structure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _jsonl_schema(
    text_field: str, id_field: str | None, lang_field: str | None
) -> str:
    fields = [f"{text_field} STRING"]
    if id_field:
        fields.append(f"{id_field} BIGINT")
    if lang_field:
        fields.append(f"{lang_field} STRING")
    return ", ".join(fields)


def _normalize(
    raw: DataFrame,
    text_field: str,
    id_field: str | None,
    lang_field: str | None,
    source: str,
) -> DataFrame:
    text = F.col(text_field)
    # md5-derived deterministic id; 15 hex chars < 2^60 fits int64
    derived = F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("bigint")
    if id_field:
        # records missing the id field (or carrying a non-integer the
        # permissive JSON reader nulls out) FALL BACK to the derived
        # id — a NULL doc_id would silently drop rows from every
        # downstream join and shard partitioning
        doc_id = F.coalesce(F.col(id_field).cast("bigint"), derived)
    else:
        doc_id = derived
    lang = F.col(lang_field) if lang_field else F.lit("und")
    return (
        raw.filter(text.isNotNull() & (F.length(text) > 0))
        .select(
            doc_id.alias("doc_id"),
            text.alias("text"),
            lang.alias("lang"),
            F.lit(source).alias("source"),
            F.length(text).cast("bigint").alias("n_chars"),
        )
    )


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source: str = "jsonl",
) -> DataFrame:
    """Load a JSONL dump into the engine's documents schema.

    Only the named fields are read (explicit schema ⇒ single pass, no
    inference); rows with a missing/empty text field are dropped —
    the P12 empty-input guard applied at the corpus boundary.
    """
    schema = _jsonl_schema(text_field, id_field, lang_field)
    raw = spark.read.schema(schema).json(path)
    return _normalize(raw, text_field, id_field, lang_field, source)


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source: str = "jsonl",
) -> DataFrame:
    """Streaming face of :func:`read_jsonl_corpus`: watch a directory
    of JSONL dumps (the drop-zone pattern — producers land shard
    files, the pipeline picks them up exactly-once via checkpointed
    file tracking) and emit the same normalized documents schema.
    Identical normalization ⇒ batch/stream parity by construction;
    pair with ``trigger(availableNow=True)`` for backlog-then-follow.
    """
    schema = _jsonl_schema(text_field, id_field, lang_field)
    raw = spark.readStream.schema(schema).json(path)
    return _normalize(raw, text_field, id_field, lang_field, source)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    mode: str = "overwrite",
) -> None:
    """Export a corpus as exactly ``n_shards`` JSONL files.

    Shards are hash-partitioned on doc_id (uniform sizes regardless of
    input ordering); each output task writes one part file. At real
    scale pick n_shards so shards land in the 100 MB-1 GB band the
    downstream dataloader wants.
    """
    df.repartition(n_shards, "doc_id").write.mode(mode).json(path)
