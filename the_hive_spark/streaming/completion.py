"""ST3 — document-completion sessionization as a custom stateful
streaming operator.

Reference semantics (internal/server/hive_service.go:129-219): chunks
of a document arrive in any order; the doc is *complete* when the
received count reaches the ``total_chunks`` metadata value, or after
2 seconds of inactivity when that metadata is absent. On completion
the full text is assembled and downstream analysis fires.

Spark-native form: ``applyInPandasWithState`` keyed by document_id
with a processing-time timeout. State = accumulated (chunk_index,
content) pairs + expected total. Completion emits one row with the
text joined in chunk_index order (the reference joins in *arrival*
order — hive_service.go:157-161 — a quirk we consciously fix;
SURVEY.md §7.3).

At scale state is per-key and shuffled by document_id once; RocksDB
state store handles millions of in-flight documents.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COMPLETION_TIMEOUT_MS = 2000  # hive_service.go:171-188

CHUNK_INPUT_SCHEMA = StructType(
    [
        StructField("document_id", StringType()),
        StructField("chunk_index", IntegerType()),
        StructField("content", StringType()),
        StructField("total_chunks", IntegerType()),  # null = unknown
    ]
)

COMPLETED_SCHEMA = StructType(
    [
        StructField("document_id", StringType()),
        StructField("n_chunks", LongType()),
        StructField("full_text", StringType()),
        StructField("completion_reason", StringType()),  # count|timeout
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("indices", ArrayType(IntegerType())),
        StructField("contents", ArrayType(StringType())),
        StructField("total", IntegerType()),
    ]
)


def _assemble(indices: list[int], contents: list[str]) -> str:
    ordered = [c for _, c in sorted(zip(indices, contents), key=lambda p: p[0])]
    return "\n\n".join(ordered)


def track_completion(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    timeout_ms: int = COMPLETION_TIMEOUT_MS,
) -> Iterable[pd.DataFrame]:
    """Per-document state function (applyInPandasWithState contract)."""
    document_id = key[0]

    if state.hasTimedOut:
        indices, contents, _total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "document_id": [document_id],
                "n_chunks": [len(contents)],
                "full_text": [_assemble(list(indices), list(contents))],
                "completion_reason": ["timeout"],
            }
        )
        return

    indices: list[int] = []
    contents: list[str] = []
    total: int | None = None
    if state.exists:
        prev_idx, prev_content, prev_total = state.get
        indices = list(prev_idx)
        contents = list(prev_content)
        total = prev_total

    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            # idempotent re-delivery (ST4): same chunk_index replaces
            if row.chunk_index in indices:
                contents[indices.index(row.chunk_index)] = row.content
            else:
                indices.append(int(row.chunk_index))
                contents.append(row.content)
            if row.total_chunks is not None and not pd.isna(row.total_chunks):
                total = int(row.total_chunks)

    if total is not None and len(indices) >= total:
        state.remove()
        yield pd.DataFrame(
            {
                "document_id": [document_id],
                "n_chunks": [len(contents)],
                "full_text": [_assemble(indices, contents)],
                "completion_reason": ["count"],
            }
        )
    else:
        state.update((indices, contents, total))
        state.setTimeoutDuration(timeout_ms)


def completed_documents(
    chunk_stream: DataFrame, timeout_ms: int = COMPLETION_TIMEOUT_MS
) -> DataFrame:
    """Wire the stateful operator onto a stream of chunk rows
    (CHUNK_INPUT_SCHEMA shape). ``timeout_ms`` is the ST3 inactivity
    window (2 s in the reference; raise it in tests that must not race
    the timeout)."""

    def fn(key, pdfs, state):
        yield from track_completion(key, pdfs, state, timeout_ms=timeout_ms)

    return chunk_stream.groupBy("document_id").applyInPandasWithState(
        fn,
        outputStructType=COMPLETED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
