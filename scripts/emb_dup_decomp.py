#!/usr/bin/env python
"""Decompose the emb_semantic_dup_clusters scale step (r9 VERDICT #4).

BENCH_SF1/SF10 showed the query at 1.25 s (sf1) → 170.5 s (sf10) —
136× wall for 10× data — while emb_hard_negatives grew only 13.9× on
the same corpora. This script attributes the growth by measuring each
stage of the pipeline separately at both scale dirs:

  1. exact-duplicate vector mass (emb_exact_dup_mass totals): on the
     verbatim-clone corpora every base vector has K exact copies, so
     the VERIFIED pair floor is 5,000·C(K,2) — K² in the clone factor
     while the corpus grows only K-fold. sf1 (K=10): 225k pairs;
     sf10 (K=100): 24.75M pairs — a 110× output-volume step for 10×
     input is intrinsic to the data, not the plan.
  2. LSH band-candidate count (pre-verification join volume);
  3. verified near-dup pair count (emb_near_dup_lsh output);
  4. wall time of the pair build (cold) vs the connected-components
     consumer (warm pair artifact via the matstore).

Writes EMB_DUP_DECOMP.json with per-SF rows and the growth ratios.
Usage: python scripts/emb_dup_decomp.py [SF_DIR ...] [--out FILE]
Defaults: /tmp/spark_graft_sf1 /tmp/spark_graft_sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from the_hive_spark import registry
from the_hive_spark.session import get_spark
from the_hive_spark.tables import table


def measure(spark, sf_dir: str) -> dict:
    from the_hive_spark.functions import matstore
    from the_hive_spark.functions.lsh import lsh_near_dup_candidates
    from the_hive_spark.operators.similarity import emb_near_dup_lsh

    matstore.clear()  # cold measurement: no artifact reuse across dirs
    emb = table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()

    # stage 1: exact-dup family mass (linear meter)
    t0 = time.perf_counter()
    mass = (
        registry.QUERIES["emb_exact_dup_mass"](spark, sf_dir)
        .agg(
            F.sum("n_vecs").alias("v"),
            F.sum("n_dup_families").alias("f"),
            F.sum("exact_pair_mass").alias("m"),
        )
        .collect()[0]
    )
    t_mass = time.perf_counter() - t0

    # stage 2: band-candidate volume (the join the verifier consumes)
    t0 = time.perf_counter()
    n_candidates = lsh_near_dup_candidates(
        emb, id_col="vec_id", vec_col="embedding", n_planes=192, n_bands=16
    ).count()
    t_cand = time.perf_counter() - t0

    # stage 3+4: verified pair build (cold), then CC over the warm
    # artifact — the split BENCH conflates into one number
    t0 = time.perf_counter()
    n_pairs = emb_near_dup_lsh(spark, sf_dir).count()
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_rows = (
        registry.QUERIES["emb_semantic_dup_clusters"](spark, sf_dir)
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    t_cc = time.perf_counter() - t0
    return {
        "n_vecs": n_vecs,
        "exact_dup_families": int(mass["f"]),
        "exact_pair_mass": int(mass["m"]),
        "lsh_candidates": n_candidates,
        "verified_pairs": n_pairs,
        "sec_mass_meter": round(t_mass, 2),
        "sec_candidates": round(t_cand, 2),
        "sec_pair_build_cold": round(t_build, 2),
        "sec_clusters_warm": round(t_cc, 2),
    }


def main() -> None:
    argv = sys.argv[1:]
    out = "EMB_DUP_DECOMP.json"
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    dirs = [a for a in argv if not a.startswith("--")] or [
        "/tmp/spark_graft_sf1",
        "/tmp/spark_graft_sf10",
    ]
    registry.load_all()
    spark = get_spark(app_name="emb-dup-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {d: measure(spark, d) for d in dirs}
    result: dict = {"dirs": rows}
    if len(dirs) == 2:
        a, b = (rows[d] for d in dirs)
        result["growth"] = {
            "data": round(b["n_vecs"] / a["n_vecs"], 2),
            "exact_pair_mass": round(
                b["exact_pair_mass"] / max(a["exact_pair_mass"], 1), 2
            ),
            "lsh_candidates": round(
                b["lsh_candidates"] / max(a["lsh_candidates"], 1), 2
            ),
            "verified_pairs": round(
                b["verified_pairs"] / max(a["verified_pairs"], 1), 2
            ),
            "pair_build_wall": round(
                b["sec_pair_build_cold"] / max(a["sec_pair_build_cold"], 1e-9),
                2,
            ),
            "clusters_wall": round(
                b["sec_clusters_warm"] / max(a["sec_clusters_warm"], 1e-9), 2
            ),
        }
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
