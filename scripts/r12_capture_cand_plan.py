#!/usr/bin/env python
"""Capture the physical plan of the dedup pipeline's ≥2-band candidate
stage (the subplan the r12 band-pair rewrite changes; the full
doc_dup_clusters query plan truncates at the matstore/checkpoint
boundary and cannot show it).

Usage: python scripts/r12_capture_cand_plan.py OUTFILE [SF_DIR]
Writes explain('formatted') of the candidate DataFrame of whichever
tree this script runs in (old: _lsh_band_pairs + n_bands>=2 filter;
new: _lsh_band_pair_candidates_ge2).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from the_hive_spark.operators import dedup
from the_hive_spark.session import get_spark


def main() -> None:
    out = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r12-cand-plan")
    spark.sparkContext.setLogLevel("ERROR")
    sig = dedup.minhash_signatures(spark, sf_dir)
    if hasattr(dedup, "_lsh_band_pair_candidates_ge2"):
        cand = dedup._lsh_band_pair_candidates_ge2(sig)
    else:
        cand = (
            dedup._lsh_band_pairs(sig)
            .filter(F.col("n_bands") >= 2)
            .select("doc_a", "doc_b")
        )
    plan = cand._sc._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as fh:
        fh.write(plan)
    print(f"wrote {out} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
