"""The full §3.2 streaming lifecycle: chunk stream → stateful
document completion → analyst reactions (rules, alerts, events).

Reference flow (hive_service.go:129-219 → analyst.go:134-260): each
completed document fires rule evaluation and keyword alerting. Here
the completion stream's ``foreachBatch`` applies those reactions
transactionally per micro-batch — the worker-pool/channel machinery
(ST7) is replaced by Spark's own scheduling and backpressure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from the_hive_spark.engine import ALERT_KEYWORD, HiveEngine
from the_hive_spark.functions.ids import dense_sequential_ids
from the_hive_spark.streaming.completion import completed_documents


def analyze_batch(engine: HiveEngine, completed: DataFrame) -> None:
    """Analyst reactions for one micro-batch of completed documents.

    Scale note: a micro-batch is usually small, but on an
    ``availableNow`` backlog replay (the "process existing files"
    path, S1) ONE batch is the entire backlog. So nothing here may be
    proportional-to-batch-size on the driver: document ids stay in
    DataFrames (semi-joined downstream, never ``collect()``-ed into an
    ``isin`` literal) and event ids come from
    :func:`~the_hive_spark.functions.ids.dense_sequential_ids` (range-
    partitioned two-pass numbering) instead of a ``row_number`` over an
    unpartitioned window.
    """
    completed = completed.cache()
    try:
        if completed.isEmpty():
            return

        # completion events (events.go:36-62)
        base = engine._next_id("events")
        events = dense_sequential_ids(
            completed.select(
                F.col("document_id"),
                F.col("n_chunks"),
                F.col("completion_reason"),
            ),
            "document_id",
            base=base,
            id_col="id",
        ).select(
            "id",
            F.current_timestamp().alias("timestamp"),
            F.lit("ingest").alias("event_type"),
            F.col("document_id").alias("document_name"),
            F.format_string(
                "Document complete: %d chunks (%s)", "n_chunks", "completion_reason"
            ).alias("details"),
        )
        engine._append("events", events)

        # P7 keyword alert on the assembled text
        alerts = completed.filter(
            F.instr(F.upper("full_text"), ALERT_KEYWORD) > 0
        ).select(
            F.current_timestamp().alias("timestamp"),
            F.lit("ALERT").alias("alert_type"),
            F.format_string(
                "Document %s contains %s content", "document_id", F.lit(ALERT_KEYWORD)
            ).alias("message"),
            F.lit("warning").alias("level"),
            F.col("document_id").alias("document_id"),
            F.lit("").alias("organization_id"),
        )
        if not alerts.isEmpty():
            engine._append("alerts", alerts)

        # standing rules against the completed docs (J3 single-doc mode;
        # chunks were upserted by the ingest leg of the pipeline) —
        # restricted by semi-join on the batch's ids, not a driver list
        if not engine.active_rules().isEmpty():
            engine.evaluate_rules(document_ids=completed.select("document_id"))
    finally:
        # release the per-batch cache entry — CacheManager holds a
        # strong reference, so without this every micro-batch (or the
        # WHOLE corpus on an availableNow backlog batch) stays pinned
        # in storage memory for the life of the stream
        completed.unpersist()


def chunk_pipeline(
    engine: HiveEngine,
    chunk_stream: DataFrame,
    checkpoint_dir: str,
    timeout_ms: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Wire chunk arrivals through completion into analyst reactions.

    ``chunk_stream`` rows: CHUNK_INPUT_SCHEMA (document_id,
    chunk_index, content, total_chunks). ``available_now=True`` runs
    the S1 backlog-replay mode: drain everything already present
    (respecting source rate limits like maxFilesPerTrigger, so state
    still builds and drains per micro-batch) and stop.
    """
    kwargs = {} if timeout_ms is None else {"timeout_ms": timeout_ms}
    completed = completed_documents(chunk_stream, **kwargs)

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        analyze_batch(engine, batch_df)

    writer = (
        completed.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
