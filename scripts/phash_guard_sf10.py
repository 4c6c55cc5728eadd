#!/usr/bin/env python
"""media_phash_near_dup at sf10: the guard datapoint (r10 VERDICT ask
#4). At r10 this query burned the full 900 s sf10 budget — the clone
corpus makes every image payload 100×-duplicated, so the 4×16-bit
pigeonhole buckets each hold every copy and the band join's output is
C(100,2)-quadratic by data. With the round-11 measure-then-refuse
guard the same corpus costs one metered aggregate: either a refusal
in seconds naming the exact candidate mass and the data-side
remediation, or (if under cap) a completion. Also records the sf1
row, which should complete, and the remediation path the refusal
names (exact byte-dedup first via media_dedup_fingerprint keep-one,
then re-run on survivors).

Writes SCALE_PHASH_GUARD.json.
Usage: python scripts/phash_guard_sf10.py [SF10_DIR] [SF1_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load() -> dict:
    la = os.getloadavg()
    return {"load1": round(la[0], 2), "load5": round(la[1], 2)}


def run_one(spark, sf_dir: str) -> dict:
    from the_hive_spark.functions import matstore
    from the_hive_spark.operators.multimodal import media_phash_near_dup

    matstore.clear()
    t0 = time.perf_counter()
    out: dict = {"sf_dir": sf_dir}
    try:
        out["rows"] = media_phash_near_dup(spark, sf_dir).count()
        out["outcome"] = "completed"
    except ValueError as e:
        out["outcome"] = "guard refusal"
        out["err"] = str(e)
    out["sec"] = round(time.perf_counter() - t0, 2)
    return out


def run_remediation(spark, sf_dir: str) -> dict:
    """The refusal's named remediation, executed: keep one media row
    per exact byte fingerprint, then run the phash banding on the
    survivors — the guard passes because duplicate-dense buckets
    collapsed at the exact tier."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from the_hive_spark.operators.multimodal import (
        _PHASH_CHUNKS,
        PHASH_HAMMING_MAX,
        documents_as_media,
        image_phash,
    )
    from the_hive_spark.tables import table

    t0 = time.perf_counter()
    media = documents_as_media(table(spark, sf_dir, "documents"))
    # keep-one per (payload hash, dims): the exact tier of the dedup
    survivors = (
        media.filter(F.col("kind") == "image")
        .withColumn("fp", F.sha2(F.col("content"), 256))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("fp", "width", "height")
                .orderBy("media_id")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("fp", "rk")
    )
    sig = image_phash(survivors, fake=True).persist()
    n_survivors = sig.count()
    chunk_exprs = [
        F.struct(
            F.lit(i).alias("band"),
            F.expr(
                f"shiftrightunsigned(phash, {off}) & {(1 << width) - 1}"
            ).alias("val"),
        )
        for i, (off, width) in enumerate(_PHASH_CHUNKS)
    ]
    banded = sig.select(
        "media_id", "phash", F.explode(F.array(*chunk_exprs)).alias("bv")
    ).select("media_id", "phash", "bv.band", "bv.val").persist()
    est = (
        banded.groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .collect()[0]["cand"] or 0
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.expr("bit_count(a.phash ^ b.phash)").cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .dropDuplicates(["media_a", "media_b"])
    )
    rows = pairs.count()
    sig.unpersist()
    banded.unpersist()
    return {
        "what": "exact byte-dedup keep-one, then phash banding on survivors",
        "n_survivors": int(n_survivors),
        "metered_candidates": int(est),
        "near_dup_pairs": int(rows),
        "sec": round(time.perf_counter() - t0, 2),
    }


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"

    from the_hive_spark.session import get_spark

    spark = get_spark(app_name="phash-guard-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    report = {"load_start": _load(), "runs": []}
    for d in (sf1, sf10):
        if not os.path.isdir(d):
            report["runs"].append({"sf_dir": d, "outcome": "missing dir"})
            continue
        r = run_one(spark, d)
        report["runs"].append(r)
        print(json.dumps({k: r.get(k) for k in ("sf_dir", "outcome", "sec")}),
              flush=True)
        if r["outcome"] == "guard refusal":
            rem = run_remediation(spark, d)
            report["runs"].append({"sf_dir": d, "remediation": rem})
            print(json.dumps({"remediation_sec": rem["sec"],
                              "pairs": rem["near_dup_pairs"]}), flush=True)
    report["load_end"] = _load()
    with open("SCALE_PHASH_GUARD.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print("wrote SCALE_PHASH_GUARD.json", flush=True)


if __name__ == "__main__":
    main()
