#!/usr/bin/env python
"""Run the banded MinHash-LSH dedup family end-to-end at 100× the
bench scale factor on the sf10r realistic corpus, UNDER THE DEFAULT
GUARDS, and verify the output against exact ground truth.

This is the r9 VERDICT's top ask: every ≥sf10 datapoint for
doc_minhash_lsh_pairs / doc_dup_clusters / doc_near_dedup_corpus /
doc_dup_rates_by_source / doc_curation_funnel was previously a guard
refusal, because the verbatim-clone (sf10) and hash-noise-filler
(sf10p) corpora are candidate-dense BY SHAPE (see
make_realistic_corpus.py's preamble for the shingle-space argument).
sf10r is the corpus shape banding is FOR — bounded near-dup families
inside a letters-only topical background with ~0.01 cross-doc
Jaccard — and this script shows the default N_MINHASH/N_BANDS (32
hashes / 16 bands, the signature widened in round 10) code path,
zero knob changes, pruning C(500k,2) ≈ 1.25e11 possible pairs down to
a measured band-candidate count and completing the whole family.

Verification (scripts/dedup_ground_truth.py emits the truth set):
- recall: every exact-Jaccard-≥0.4 within-family pair must land in
  the same doc_dup_clusters component (banding may miss a borderline
  pair directly, but the family's high-J spokes transitively connect
  it — that is WHY the pipeline unions exact edges and runs CC);
  reported overall and bucketed by true Jaccard.
- precision: engine components restricted to family docs must not
  merge distinct families, and filler docs must stay singletons,
  EXCEPT where the merge is real (the sf0.1 base corpus has its own
  near-dup pairs; any cross-family merge is re-checked with exact
  python Jaccard and counted true/false).

Writes DEDUP_SCALE_100X.json.
Usage: python scripts/dedup_scale_100x.py [SF_DIR]
           [--truth /tmp/dedup_ground_truth.json]
           [--out DEDUP_SCALE_100X.json]
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

UNIT = 1_000_000_000_000
FAMILY_MAX_I = 3

FAMILY = [
    "doc_minhash_lsh_pairs",
    "doc_dup_clusters",
    "doc_dup_rates_by_source",
    "doc_near_dedup_corpus",
    "doc_curation_funnel",
    "doc_simhash_hamming_pairs",
]


def _jac(a: str, b: str, w: int = 5) -> float:
    sa = {a[i : i + w] for i in range(max(len(a) - w + 1, 0))}
    sb = {b[i : i + w] for i in range(max(len(b) - w + 1, 0))}
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/spark_graft_sf10r"
    truth_path = (
        sys.argv[sys.argv.index("--truth") + 1]
        if "--truth" in sys.argv
        else "/tmp/dedup_ground_truth.json"
    )
    out_path = (
        sys.argv[sys.argv.index("--out") + 1]
        if "--out" in sys.argv
        else "DEDUP_SCALE_100X.json"
    )
    with open(truth_path) as fh:
        truth = json.load(fh)
    true_pairs = [(a, b, p) for a, b, p in truth["true_pairs"]]

    registry.load_all()
    spark = get_spark(app_name="dedup-scale-100x")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    result: dict = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "possible_pairs": n_docs * (n_docs - 1) // 2,
        "ground_truth": truth["summary"],
        "guards": "defaults (no knob changes); any ValueError below is a guard refusal",
        "queries": {},
    }

    # --- band-candidate mass: the exact Σ C(bucket,2) the bucket
    # guard measures, recorded as the corpus's prune factor ---
    from the_hive_spark.operators.dedup import (
        band_signatures,
        minhash_signatures,
    )

    t0 = time.perf_counter()
    bands = band_signatures(minhash_signatures(spark, sf_dir))
    cand_mass = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .collect()[0]["cand"]
        or 0
    )
    result["band_candidate_mass"] = int(cand_mass)
    result["prune_factor"] = round(result["possible_pairs"] / max(cand_mass, 1), 1)
    result["sec_candidate_mass_meter"] = round(time.perf_counter() - t0, 2)

    # --- run the family, default guards, wall + rows ---
    for name in FAMILY:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
            result["queries"][name] = {
                "rows": n,
                "sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as exc:  # noqa: BLE001 — guard refusals recorded
            result["queries"][name] = {
                "err": f"{type(exc).__name__}: {str(exc)[:300]}",
                "sec": round(time.perf_counter() - t0, 2),
            }
        print(name, result["queries"][name], flush=True)

    # --- verification vs exact ground truth ---
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in registry.QUERIES["doc_dup_clusters"](spark, sf_dir)
        .filter(F.expr(f"doc_id div {UNIT}") <= FAMILY_MAX_I)
        .collect()
    }
    buckets: dict[str, list[int]] = {}
    missed: list[tuple[int, int, int]] = []
    for a, b, ppm in true_pairs:
        k = f"{ppm // 100000 / 10:.1f}"
        hit = labels.get(a) == labels.get(b) and labels.get(a) is not None
        buckets.setdefault(k, [0, 0])
        buckets[k][0] += hit
        buckets[k][1] += 1
        if not hit:
            missed.append((a, b, ppm))
    n_hit = sum(v[0] for v in buckets.values())
    result["recall"] = {
        "true_pairs": len(true_pairs),
        "same_cluster": n_hit,
        "recall": round(n_hit / max(len(true_pairs), 1), 6),
        "by_jaccard_bucket": {
            k: {"hit": v[0], "total": v[1], "recall": round(v[0] / v[1], 4)}
            for k, v in sorted(buckets.items())
        },
        "missed_sample": missed[:20],
    }

    # precision: merges across families / into filler. Re-check each
    # distinct merged pair of base families with exact python Jaccard
    # on the i=0 (verbatim) members — a TRUE merge means the sf0.1
    # base corpus itself contains that near-dup pair.
    fam_of = {d: d % UNIT for d in labels}
    by_cluster: dict[int, set[int]] = {}
    for d, c in labels.items():
        by_cluster.setdefault(c, set()).add(fam_of[d])
    merged = sorted(
        {tuple(sorted(fs)[:2]) for fs in by_cluster.values() if len(fs) > 1}
    )
    base_ids = sorted({b for pair in merged for b in pair})
    texts = {}
    if base_ids:
        texts = {
            r["doc_id"]: r["text"]
            for r in docs.filter(F.col("doc_id").isin(base_ids)).collect()
        }
    checked = [
        {"fam_a": a, "fam_b": b, "base_jaccard": round(_jac(texts[a], texts[b]), 4)}
        for a, b in merged[:50]
        if a in texts and b in texts
    ]
    false_merges = [c for c in checked if c["base_jaccard"] < 0.4]
    n_filler_dups = (
        registry.QUERIES["doc_dup_clusters"](spark, sf_dir)
        .filter(F.expr(f"doc_id div {UNIT}") > FAMILY_MAX_I)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .count()
    )
    result["precision"] = {
        "family_clusters": len(by_cluster),
        "cross_family_merges": len(merged),
        "merges_rechecked": len(checked),
        "merges_true_base_neardup": len(checked) - len(false_merges),
        "false_merges": false_merges,
        "filler_docs_marked_dup": n_filler_dups,
        "note": "filler dups are exact-md5 text collisions if any; "
        "cross-family merges are true iff the sf0.1 base pair itself "
        "has exact 5-gram Jaccard >= 0.4",
    }

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "ground_truth"},
                     default=str)[:2000])
    spark.stop()


if __name__ == "__main__":
    main()
