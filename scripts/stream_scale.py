#!/usr/bin/env python
"""Streaming-at-scale datapoint: drive the full chunk → stateful
completion → analyst-reaction pipeline (streaming/pipeline.py) over an
sf1-volume chunk backlog and record throughput and state-store
footprint per micro-batch.

Method: the SF_DIR documents table is split into fixed-size chunks
(document_id, chunk_index, content, total_chunks) and written as a
many-file parquet backlog; the pipeline replays it with
``availableNow`` + ``maxFilesPerTrigger`` pacing, so the
completion operator's keyed state builds and drains across real
micro-batches exactly as it would on a live feed (one giant batch
would never exercise cross-batch state). Every document carries
``total_chunks``, so completion is count-driven and deterministic;
the events table the reactions append to is counted afterwards as the
end-to-end delivery check.

Usage: python scripts/stream_scale.py [SF_DIR] [--out FILE]
           [--files N] [--files-per-trigger M] [--chunk CHARS]
Defaults: SF_DIR=/tmp/spark_graft_sf1, files=64, trigger=8, chunk=500.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from the_hive_spark.engine import HiveEngine
from the_hive_spark.session import get_spark
from the_hive_spark.streaming.completion import CHUNK_INPUT_SCHEMA
from the_hive_spark.streaming.pipeline import chunk_pipeline
from the_hive_spark.tables import table


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag: str, default: int) -> int:
        return int(argv[argv.index(flag) + 1]) if flag in argv else default

    sf_dir = argv[0] if argv and not argv[0].startswith("--") else "/tmp/spark_graft_sf1"
    out_path = argv[argv.index("--out") + 1] if "--out" in argv else None
    n_files = opt("--files", 64)
    per_trigger = opt("--files-per-trigger", 8)
    chunk_chars = opt("--chunk", 500)

    spark = get_spark(app_name="stream-scale")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="stream_scale_")
    backlog = os.path.join(root, "backlog")
    try:
        docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
        chunks = docs.select(
            F.col("doc_id").cast("string").alias("document_id"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, (length(text) - 1) div {chunk_chars}),"
                    f" i -> substring(text, i * {chunk_chars} + 1, {chunk_chars}))"
                )
            ).alias("chunk_index", "content"),
        ).withColumn(
            "total_chunks",
            F.count(F.lit(1))
            .over(Window.partitionBy("document_id"))
            .cast("int"),
        )
        # the window above is only data PREP (building the fixture), not
        # part of the measured pipeline
        chunks.repartition(n_files).write.mode("overwrite").parquet(backlog)
        n_chunks = spark.read.parquet(backlog).count()
        n_docs = docs.count()

        eng = HiveEngine(spark, os.path.join(root, "wh"), embedding_dim=16)
        stream = (
            spark.readStream.schema(CHUNK_INPUT_SCHEMA)
            .option("maxFilesPerTrigger", per_trigger)
            .parquet(backlog)
        )
        t0 = time.perf_counter()
        q = chunk_pipeline(
            eng,
            stream,
            os.path.join(root, "ckpt"),
            # must exceed the backlog's full drain time: a doc whose
            # chunks span early and late micro-batches would otherwise
            # complete by TIMEOUT mid-replay (partial text), then again
            # when the rest arrives — double completion events
            timeout_ms=3_600_000,
            available_now=True,
        )
        # availableNow + a ProcessingTimeTimeout stateful operator keeps
        # firing no-data "cleaning up state" batches after the backlog
        # drains (even with zero state rows), so termination is detected
        # by observation: stop once the source is exhausted AND the
        # state store is empty (count-based completion empties it; the
        # timeout path would drain it within timeout_ms).
        wall = None
        deadline = time.time() + 3600
        while time.time() < deadline and q.isActive:
            time.sleep(2)
            prog = [json.loads(p.json) for p in q.recentProgress[-3:]]
            if len(prog) < 2:
                continue
            drained = all(p.get("numInputRows", 0) == 0 for p in prog[-2:])
            state_rows = sum(
                so.get("numRowsTotal", 0)
                for p in prog[-1:]
                for so in p.get("stateOperators", [])
            )
            if drained and state_rows == 0:
                wall = time.perf_counter() - t0
                q.stop()
                break
        q.awaitTermination(120)
        wall = wall if wall is not None else time.perf_counter() - t0

        progress = [json.loads(p.json) for p in q.recentProgress]
        # drain time = start -> end of the last batch that carried rows
        data_batches = [p for p in progress if p.get("numInputRows", 0) > 0]
        batches = data_batches
        state_rows_max = 0
        state_mem_max = 0
        for p in progress:
            for so in p.get("stateOperators", []):
                state_rows_max = max(state_rows_max, so.get("numRowsTotal", 0))
                state_mem_max = max(
                    state_mem_max, so.get("memoryUsedBytes", 0)
                )
        n_events = eng.read_table("events").count()
        summary = {
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "n_chunks": n_chunks,
            "n_files": n_files,
            "files_per_trigger": per_trigger,
            "n_microbatches": len(batches),
            "wall_sec": round(wall, 1),
            "chunks_per_sec": round(n_chunks / wall, 1),
            "docs_per_sec": round(n_docs / wall, 1),
            "completion_events_written": n_events,
            "events_match_docs": n_events == n_docs,
            "state_rows_max": state_rows_max,
            "state_memory_max_bytes": state_mem_max,
            "dropped_batches": 0 if n_events == n_docs else n_docs - n_events,
        }
        print(json.dumps(summary), flush=True)
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(
                    {"summary": summary, "batches": batches}, fh, indent=1
                )
        sys.exit(0 if summary["events_match_docs"] else 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
