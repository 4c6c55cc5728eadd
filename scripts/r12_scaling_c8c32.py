#!/usr/bin/env python
"""Round-12 scaling datapoint (r11 verdict ask #7): run the headline +
heavy tiers at sf1 under two core counts so the driver's scaling axis
measures compute, not job-scheduling overhead (at sf0.1 the headline
tier reads ~17 MB and every c8/c32 ratio sits at ~1).

One invocation = one configuration: the core count comes from
$SPARK_GRAFT_CPUS exactly as bench.py takes it (get_spark builds
local[$SPARK_GRAFT_CPUS] and sizes shuffle partitions from it), the
timing is the bench methodology (sf0.001 JIT warm-up, noop sink,
per-query job descriptions), min of --reps.

Usage:
  SPARK_GRAFT_CPUS=32 python scripts/r12_scaling_c8c32.py SF_DIR --out /tmp/a.json
  SPARK_GRAFT_CPUS=8  python scripts/r12_scaling_c8c32.py SF_DIR --out /tmp/b.json
  python scripts/r12_scaling_c8c32.py --combine /tmp/a.json /tmp/b.json \
      --out SCALING_SF1_C8C32.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES: list[str] = []  # filled from bench tiers at runtime


def combine(a_file: str, b_file: str, out: str) -> None:
    a = json.load(open(a_file))
    b = json.load(open(b_file))
    hi, lo = (a, b) if a["cpus"] >= b["cpus"] else (b, a)
    per_query = {}
    for name, t_hi in hi["results"].items():
        t_lo = lo["results"].get(name)
        if t_hi is None or t_lo is None:
            per_query[name] = None
            continue
        per_query[name] = {
            f"c{hi['cpus']}_sec": t_hi,
            f"c{lo['cpus']}_sec": t_lo,
            "ratio_low_over_high": round(t_lo / t_hi, 2) if t_hi else None,
        }
    rep = {
        "sf_dir": hi["sf_dir"],
        "cpus_high": hi["cpus"],
        "cpus_low": lo["cpus"],
        "total_high_sec": hi["total_sec"],
        "total_low_sec": lo["total_sec"],
        "total_ratio": round(lo["total_sec"] / hi["total_sec"], 2),
        "per_query": per_query,
        "load": {"high": hi["load"], "low": lo["load"]},
        "note": (
            "ratio_low_over_high ~= cpus_high/cpus_low (4.0) means "
            "perfectly CPU-bound scaling; ~1 means the query is "
            "scheduling/latency-bound at this SF"
        ),
    }
    with open(out, "w") as fh:
        json.dump(rep, fh, indent=1)
    print(json.dumps(rep, indent=1))


def run(sf_dir: str, reps: int, out: str) -> None:
    from bench import HEADLINE, HEAVY
    from the_hive_spark import registry
    from the_hive_spark.session import get_spark

    registry.load_all()
    names = [n for n in HEADLINE + HEAVY if n in registry.QUERIES]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    spark = get_spark(app_name=f"r12-scaling-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    assert f"local[{cpus}]" in spark.sparkContext.master, (
        "SPARK_GRAFT_CPUS must drive the master for a scaling run"
    )

    spark.range(1).count()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "part", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for n in names:
            try:
                registry.QUERIES[n](spark, warm).write.mode(
                    "overwrite").format("noop").save()
            except Exception:
                pass

    results: dict[str, float | None] = {}
    for n in names:
        times = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"r12-scaling:{n}:{rep}")
            t0 = time.perf_counter()
            try:
                registry.QUERIES[n](spark, sf_dir).write.mode(
                    "overwrite").format("noop").save()
                times.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                print(f"{n}: ERROR {type(exc).__name__}: {str(exc)[:160]}",
                      flush=True)
                break
            finally:
                spark.sparkContext.setJobDescription(None)
        results[n] = min(times) if times else None
        if times:
            print(f"{n}: min={min(times)} all={times}", flush=True)
    rep_out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "reps": reps,
        "results": results,
        "total_sec": round(sum(v for v in results.values() if v), 2),
        "load": [round(x, 2) for x in os.getloadavg()],
    }
    with open(out, "w") as fh:
        json.dump(rep_out, fh, indent=1)
    print(json.dumps(rep_out))
    spark.stop()


def main() -> None:
    argv = sys.argv[1:]
    out = "SCALING_SF1_C8C32.json"
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i:i + 2]
    if argv and argv[0] == "--combine":
        combine(argv[1], argv[2], out)
        return
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/tmp/spark_graft_sf1p"
    run(sf_dir, reps, out)


if __name__ == "__main__":
    main()
