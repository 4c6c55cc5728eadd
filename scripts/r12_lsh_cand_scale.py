#!/usr/bin/env python
"""Round-12 scale A/B for the ≥2-band LSH candidate stage (the r11
verdict's top ask): single-band join + per-pair band count (the r11
plan) vs band-pair composite-key join, on the realistic sf10r corpus
(500k docs — the regime DEDUP_SCALE_100X.json attested).

The MinHash signature table is persisted once and BOTH plans read it,
so the A/B isolates the candidate join itself (guide §1). Each plan is
timed with the noop sink, alternating, 2 reps. Also meters the join
output volume of each plan with the guard aggregate (Σ C(bucket,2)) —
the "candidate shuffle cut" number.

Writes LSH_CAND_SCALE.json.
Usage: python scripts/r12_lsh_cand_scale.py [SF_DIR] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark import StorageLevel

from the_hive_spark.operators import dedup
from the_hive_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/spark_graft_sf10r"
    out_file = "LSH_CAND_SCALE.json"
    if "--out" in sys.argv:
        out_file = sys.argv[sys.argv.index("--out") + 1]

    spark = get_spark(app_name="r12-lsh-cand-scale")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {
        "sf_dir": sf_dir,
        "load_start": dict(zip(("load1", "load5", "load15"),
                               [round(x, 2) for x in os.getloadavg()])),
    }

    t0 = time.perf_counter()
    sig = dedup.minhash_signatures(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_docs = sig.count()
    report["n_docs"] = n_docs
    report["sec_signatures"] = round(time.perf_counter() - t0, 2)

    # join-volume meters (one linear aggregate each, the guard's math)
    bands = dedup.band_signatures(sig)
    report["single_band_join_rows"] = int(
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .collect()[0]["cand"]
        or 0
    )

    def run(label: str, threshold: int) -> float:
        spark.sparkContext.setJobDescription(f"r12-cand:{label}")
        t0 = time.perf_counter()
        dedup._lsh_band_pair_candidates_ge2(
            sig, composite_threshold=threshold
        ).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"{label}: {dt:.1f}s", flush=True)
        return round(dt, 2)

    times: dict[str, list] = {"single_band": [], "composite": []}
    for rep in range(2):
        times["single_band"].append(run(f"single[{rep}]", 10**18))
        times["composite"].append(run(f"composite[{rep}]", 0))
    report["sec_single_band"] = times["single_band"]
    report["sec_composite"] = times["composite"]

    # composite volume meter (after timing, so it never warms anything)
    band_keys = F.array(*[
        F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
        for b in range(dedup.N_BANDS)
    ])
    comp = F.flatten(F.expr(
        f"transform(sequence(0, {dedup.N_BANDS - 2}), i ->"
        f" transform(sequence(i + 1, {dedup.N_BANDS - 1}), j ->"
        f" struct(i * {dedup.N_BANDS} + j AS bp, concat(_bk[i], _bk[j]) AS val)))"
    ))
    ctab = (
        sig.withColumn("_bk", band_keys)
        .select("doc_id", F.explode(comp).alias("c"))
        .select(F.col("c.bp").alias("bp"), F.col("c.val").alias("val"))
    )
    report["composite_join_rows"] = int(
        ctab.groupBy("bp", "val")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .collect()[0]["cand"]
        or 0
    )
    report["candidates_ge2"] = dedup._lsh_band_pair_candidates_ge2(
        sig, composite_threshold=0
    ).count()

    report["load_end"] = dict(zip(("load1", "load5", "load15"),
                                  [round(x, 2) for x in os.getloadavg()]))
    with open(out_file, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
