#!/usr/bin/env python
"""Round-11 optimization measurement harness (guide §1).

Times individual registry queries in isolation via the noop sink —
same methodology as bench.py (warm-up at sf0.001 for codegen JIT,
perf_counter around the noop save) but per-query, repeated, with the
physical plan captured to plans/r11/<name>_<tag>.txt.

Usage:
  python scripts/opt_measure.py --names a,b,c [--sf-dir D] [--reps 3]
         [--tag before|after] [--plans-dir plans/r11] [--out FILE]

Per guide §1.5 every timed run is labelled with setJobDescription so
a Spark UI session (if enabled) maps time to the query.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from the_hive_spark import registry
from the_hive_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True,
                    help="comma-separated query names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None,
                    help="if set, write explain('formatted') to "
                         "<plans-dir>/<name>_<tag>.txt")
    ap.add_argument("--plans-dir", default="plans/r11")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    names = [n.strip() for n in args.names.split(",") if n.strip()]
    registry.load_all()
    missing = [n for n in names if n not in registry.QUERIES]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    spark = get_spark(app_name="opt-measure-r11")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: metadata counts + one run at sf0.001
    spark.range(1).count()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "part", "events", "documents", "embeddings"):
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()
    if not args.no_warm and os.path.isdir("/root/testdata/sf0.001"):
        for n in names:
            try:
                registry.QUERIES[n](spark, "/root/testdata/sf0.001") \
                    .write.mode("overwrite").format("noop").save()
            except Exception:
                pass

    results: dict[str, dict] = {}
    for n in names:
        fn = registry.QUERIES[n]
        if args.tag:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir,
                                   f"{n}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"r11:{n}:rep{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.mode("overwrite") \
                .format("noop").save()
            times.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        results[n] = {
            "times": times,
            "min": min(times),
            "median": round(statistics.median(times), 4),
        }
        print(f"{n}: min={min(times):.3f} median={results[n]['median']:.3f} "
              f"all={times}", flush=True)

    out = {
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "results": results,
        "total_min": round(sum(r["min"] for r in results.values()), 3),
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps({k: v["min"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
