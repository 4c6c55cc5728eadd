#!/usr/bin/env python
"""Attack the ~19 s fixed per-batch streaming floor (r10 VERDICT ask
#7). SCALE_STREAM_LIVE70_SF10.json proved batch duration is ~17–22 s
REGARDLESS of batch size — a fixed per-batch cost, attributed to the
stateful rate-limiter commit across 32 HDFS-backed state partitions
plus file listing + planning. This script A/Bs the two levers the
verdict names, each variant in its OWN subprocess (state-store
provider and shuffle-partition count are session-frozen, and the
state-partition count is checkpoint-frozen):

- base    : HDFSBackedStateStoreProvider, 32 shuffle/state partitions
            (the LIVE70 configuration, re-measured for contention
            comparability)
- p8      : 8 state partitions — state is keyed by user cardinality,
            and at sf10 each of 32 partitions re-snapshots its whole
            map every batch; fewer partitions = fewer store commits
            (the functions/partitioning.py right-sizing trick applied
            to the streaming query)
- rocksdb : RocksDBStateStoreProvider with changelog checkpointing —
            per-batch commit appends the CHANGED keys only instead of
            re-writing the delta map file per partition
- rocks8  : both

Per-variant output carries the per-batch durationMs breakdown
(addBatch / stateOperators commit times), so WHERE the floor lives is
recorded, not inferred. Done-criterion from the verdict: a live row
with p50 < 10 s at the same feed, or a pinned negative result.

Writes STREAM_FLOOR.json (orchestrator mode).
Usage:
  python scripts/stream_floor.py [SF_DIR] [--files N] [--feed-ms MS]
  python scripts/stream_floor.py SF_DIR --variant rocksdb  (single run)
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = {
    "base": {},
    "p8": {"spark.sql.shuffle.partitions": "8"},
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    },
    "rocks8": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    },
    # Spark 4 transformWithState: the path STREAM_FLOOR.json's pinned
    # negative result names as the one that could break the per-key
    # applyInPandasWithState protocol floor — a different state
    # protocol (Arrow-batched dispatch + state-server connection).
    # Same _bucket_admit recurrence (parity pinned in test_streaming);
    # RocksDB provider is REQUIRED by the operator.
    # Snapshot-state harness: no state store at all — versioned
    # parquet snapshots + one segmented mapInPandas pass per
    # partition, the "carry the state yourself" fix the pinned
    # negative result called for (per-key harness dispatch is the
    # floor; this harness has none).
    "snap": {"limiter": "snap"},
    "tws": {
        "limiter": "tws",
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    },
}


def _load() -> dict:
    la = os.getloadavg()
    return {"load1": round(la[0], 2), "load5": round(la[1], 2)}


def _stream_scale():
    spec = importlib.util.spec_from_file_location(
        "stream_scale", os.path.join(REPO, "scripts", "stream_scale.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_variant(sf_dir: str, variant: str, n_files: int,
                feed_ms: int) -> dict:
    from the_hive_spark.session import get_spark

    ss = _stream_scale()
    conf = dict(VARIANTS[variant])
    limiter_kind = conf.pop("limiter", "apws")
    if limiter_kind == "tws":
        # worker env freezes at JVM launch — shim before get_spark
        from the_hive_spark.compat import ensure_tws_protobuf

        if not ensure_tws_protobuf():
            return {"variant": variant,
                    "error": "no protobuf runtime for transformWithState"}
    # shuffle_partitions must go through get_spark's own arg so the
    # session default doesn't override the variant
    sp = int(conf.get("spark.sql.shuffle.partitions", "0")) or None
    extra = {k: v for k, v in conf.items()
             if k != "spark.sql.shuffle.partitions"}
    spark = get_spark(app_name=f"stream-floor-{variant}",
                      shuffle_partitions=sp, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    root = f"/tmp/stream_floor_{variant}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    if limiter_kind == "tws":
        from the_hive_spark.streaming.ratelimit import rate_limited_tws

        r = ss.run_live(spark, sf_dir, root, n_files, feed_ms,
                        limiter=rate_limited_tws)
    elif limiter_kind == "snap":
        from the_hive_spark.streaming.ratelimit import SnapshotRateLimiter

        r = ss.run_live(
            spark, sf_dir, root, n_files, feed_ms,
            limiter=SnapshotRateLimiter(
                state_root=os.path.join(root, "snap_state")),
        )
    else:
        r = ss.run_live(spark, sf_dir, root, n_files, feed_ms)
    # durationMs breakdown + state commit times: where the floor lives
    batches = r.pop("batches", [])
    dur_keys = set()
    for b in batches:
        dur_keys |= set(b.get("durationMs", {}))
    breakdown = {}
    for k in sorted(dur_keys):
        vals = sorted(b["durationMs"][k] for b in batches
                      if k in b.get("durationMs", {}))
        if vals:
            breakdown[k] = {"p50": vals[len(vals) // 2], "max": vals[-1]}
    commit_ms = sorted(
        sum(op.get("commitTimeMs", 0) for op in b.get("stateOperators", []))
        for b in batches if b.get("stateOperators")
    )
    # full stateOperators metric medians: allUpdatesTimeMs brackets the
    # JVM-side iteration that DRIVES the python worker, so python-stage
    # time vs everything-else reads off the artifact
    so_keys: set = set()
    for b in batches:
        for op in b.get("stateOperators", []):
            so_keys |= {k for k, v in op.items()
                        if isinstance(v, (int, float))}
    so_med = {}
    for k in sorted(so_keys):
        vals = sorted(
            sum(op.get(k, 0) for op in b.get("stateOperators", []))
            for b in batches if b.get("stateOperators")
        )
        if vals:
            so_med[k] = vals[len(vals) // 2]
    r["state_operator_medians"] = so_med
    r["variant"] = variant
    r["conf"] = conf
    r["durationMs_breakdown"] = breakdown
    if commit_ms:
        r["state_commit_ms"] = {"p50": commit_ms[len(commit_ms) // 2],
                                "max": commit_ms[-1]}
    spark.stop()
    return r


def main() -> None:
    argv = sys.argv[1:]
    pos = [a for a in argv if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/tmp/spark_graft_sf10"

    def opt(flag, default):
        return type(default)(argv[argv.index(flag) + 1]) if flag in argv else default

    n_files = opt("--files", 10)
    feed_ms = opt("--feed-ms", 25000)
    out_path = opt("--out", "STREAM_FLOOR.json")

    if "--variant" in argv:
        v = opt("--variant", "base")
        r = run_variant(sf_dir, v, n_files, feed_ms)
        print("RESULT " + json.dumps(r), flush=True)
        return

    report = {"sf_dir": sf_dir, "n_files": n_files, "feed_ms": feed_ms,
              "load_start": _load(), "variants": {}}
    for v in VARIANTS:
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir,
             "--variant", v, "--files", str(n_files),
             "--feed-ms", str(feed_ms)],
            capture_output=True, text=True, timeout=3600,
        )
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line:
            report["variants"][v] = json.loads(line[len("RESULT "):])
        else:
            report["variants"][v] = {
                "error": (proc.stderr or proc.stdout)[-2000:]}
        report["variants"][v]["sec_total"] = round(
            time.perf_counter() - t0, 1)
        got = report["variants"][v]
        print(json.dumps({"variant": v,
                          "p50": got.get("batch_latency_ms", {}).get("p50"),
                          "busy": got.get("busy_fraction")}), flush=True)

    report["load_end"] = _load()
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
