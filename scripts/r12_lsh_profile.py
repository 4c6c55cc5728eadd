#!/usr/bin/env python
"""Round-12 measurement (guide §1): profile the MinHash-LSH band
self-join's candidate structure at a given SF — how many candidate
ROWS the band join emits (Σ C(bucket,2)), how many DISTINCT pairs
that is, and the n_bands distribution (1 vs ≥2 shared bands) — to
decide between the current single-band join + groupBy filter and a
≥2-shared-band band-pair composite-key join.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from the_hive_spark.operators import dedup
from the_hive_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r12-lsh-profile")
    spark.sparkContext.setLogLevel("ERROR")

    sig = dedup.minhash_signatures(spark, sf_dir)
    bands = dedup.band_signatures(sig).persist()
    n_rows = bands.count()
    n_docs = n_rows // dedup.N_BANDS

    # exact join output volume per band (the 1.54M the verdict cites)
    per_band = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) div 2")).alias("cand_rows"),
            F.max("c").alias("max_bucket"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .collect()[0]
    )

    t0 = time.perf_counter()
    dist = (
        dedup._lsh_band_pairs(sig)
        .groupBy("n_bands")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("n_bands")
        .collect()
    )
    t_join = time.perf_counter() - t0
    nb_hist = {int(r["n_bands"]): int(r["n_pairs"]) for r in dist}

    # composite band-pair cost model: per doc C(16,2)=120 keys; join
    # volume = Σ over band-pairs C(bucket,2). A pair sharing k bands
    # appears in C(k,2) composite buckets, and background pairs
    # sharing <2 bands appear in none — so composite join volume
    # = Σ_pairs C(n_bands,2).
    comp_rows = sum(n * (k * (k - 1) // 2) for k, n in nb_hist.items())
    out = {
        "sf_dir": sf_dir,
        "n_docs": int(n_docs),
        "banded_rows": int(n_rows),
        "single_band": {
            "cand_rows": int(per_band["cand_rows"] or 0),
            "max_bucket": int(per_band["max_bucket"] or 0),
            "n_buckets": int(per_band["n_buckets"] or 0),
        },
        "n_bands_hist": nb_hist,
        "pairs_total": sum(nb_hist.values()),
        "pairs_ge2": sum(v for k, v in nb_hist.items() if k >= 2),
        "composite_join_rows": int(comp_rows),
        "composite_banded_rows": int(n_docs * 120),
        "t_current_join_sec": round(t_join, 3),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
