#!/usr/bin/env python
"""Graded-cosine ground truth for the embedding near-dup family
(r10 VERDICT ask #1 — the vector replay of the text family's sf10r win).

Until round 11 the banded-SRP near-dup path (emb_near_dup_lsh,
emb_semantic_dup_clusters) had scale evidence only on exact-clone
corpora (cosine = 1, where banding cannot miss). This script builds a
deterministic corpus whose true near-dup pairs SPAN the similarity
grade, enumerates the exact ground truth by brute force, and measures
per-cosine-bucket candidate recall of the banding — the measurement
whose absence hid the text family's 63% recall miss until round 10.

Corpus (pure function of the seed — regeneration is byte-identical):
- F families: a random unit base vector u (dim 64) plus one spoke per
  grade g ∈ {0.70, 0.75, 0.80, 0.85, 0.90, 0.93, 0.95, 0.97, 0.99}:
  v = g·u + √(1−g²)·w with w a fresh unit vector ⊥ u. Spoke–spoke
  cosines land near g_i·g_j, so within-family pairs fill every bucket
  from ~0.5 up.
- n − 10·F background: iid Gaussian unit vectors. At dim 64 the
  background is NOT negligible — over C(500k,2) ≈ 1.25e11 pairs the
  max chance cosine reaches ~0.9 — which is exactly why the truth is
  brute-enumerated, never assumed from construction.

Ground truth: blocked float32 matmul over the full n×n upper triangle
surfaces every pair with raw cosine ≥ 0.63; surfaced pairs are then
re-scored with the engine's own quantized-integer arithmetic
(functions/vectorops.py: milli-unit quantize → exact int64 dot →
ppm = floor(1e6·cos + 0.5)), so the truth set is bit-comparable with
the verified operator output.

Measurements per run:
1. band-mass guard meter value for the banding under test (the r11
   measure-then-refuse contract in functions/lsh.py);
2. candidate recall per ppm bucket (ids-only band join ∩ truth);
3. verified-pair output vs truth≥950000: exact set difference both
   ways (missed / extra — extra must be 0, verification is exact);
4. cluster recall: fraction of truth≥τ pairs sharing a connected-
   component label (transitivity through high-cos spokes can exceed
   pair recall, same mechanism as the text family's 0.9828).

Runs:
- A: n=200k, the registered emb_near_dup_lsh shape (16 bands × 12
  bits) end-to-end, incl. emb_semantic_dup_clusters.
- B: n=500k, default banding → expected guard REFUSAL (metered
  ~4.9e8-pair join), then the srp_banding_for_threshold(0.95, n)
  remediation run to completion with the same measurements.
- C: n=100k, τ=0.8 (the SemDeDup operating point): banding from
  srp_banding_for_threshold(0.8, n, recall_floor=0.95), candidate
  recall per bucket ≥0.8. At ≥200k vectors the sizer itself refuses
  τ=0.8 within the candidate budget — recorded as the honest scale
  boundary (real SemDeDup k-means-partitions the corpus first
  precisely to dodge this mass).

Writes EMB_DEDUP_SCALE_GRADED.json.
Usage: python scripts/emb_graded_eval.py [--out FILE] [--runs A,B,C]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIM = 64
GRADES = [0.70, 0.75, 0.80, 0.85, 0.90, 0.93, 0.95, 0.97, 0.99]
SEED = 0xE14BED
PPM_BUCKETS = [650, 700, 750, 800, 850, 900, 930, 950, 970, 990]  # milli
THRESH_PPM = 950_000
BG_ID_BASE = 500_000_000_000  # background ids, below the 1e12 replica space


def _load() -> dict:
    la = os.getloadavg()
    return {"load1": round(la[0], 2), "load5": round(la[1], 2)}


def make_corpus(n: int, n_families: int, out_dir: str):
    """Deterministic corpus → (ids int64, X float32 unit rows) +
    parquet at out_dir/embeddings.parquet (32 files for scan
    parallelism). Returns (ids, X)."""
    rng = np.random.default_rng(SEED)
    n_fam_vecs = n_families * (1 + len(GRADES))
    assert n_fam_vecs < n
    n_bg = n - n_fam_vecs

    ids = np.empty(n, dtype=np.int64)
    X = np.empty((n, DIM), dtype=np.float32)

    # family bases
    U = rng.standard_normal((n_families, DIM))
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    pos = 0
    ids[pos:pos + n_families] = np.arange(n_families)
    X[pos:pos + n_families] = U.astype(np.float32)
    pos += n_families
    # spokes: v = g·u + sqrt(1-g²)·w, w ⊥ u unit
    for gi, g in enumerate(GRADES):
        W = rng.standard_normal((n_families, DIM))
        W -= (W * U).sum(axis=1, keepdims=True) * U
        W /= np.linalg.norm(W, axis=1, keepdims=True)
        V = g * U + np.sqrt(1.0 - g * g) * W
        ids[pos:pos + n_families] = (gi + 1) * 10**12 + np.arange(n_families)
        X[pos:pos + n_families] = V.astype(np.float32)
        pos += n_families
    # background
    B = rng.standard_normal((n_bg, DIM))
    B /= np.linalg.norm(B, axis=1, keepdims=True)
    ids[pos:] = BG_ID_BASE + np.arange(n_bg)
    X[pos:] = B.astype(np.float32)

    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdir = os.path.join(out_dir, "embeddings.parquet")
        os.makedirs(pdir, exist_ok=True)
        n_files = 32
        bounds = np.linspace(0, n, n_files + 1).astype(int)
        # shuffle rows so family members don't share files (mirrors a
        # real ingest where near-dups land in arbitrary partitions)
        perm = np.random.default_rng(SEED + 1).permutation(n)
        for f in range(n_files):
            sel = perm[bounds[f]:bounds[f + 1]]
            tbl = pa.table({
                "vec_id": pa.array(ids[sel], type=pa.int64()),
                "embedding": pa.array(list(X[sel]), type=pa.list_(pa.float32())),
                "label": pa.array(np.zeros(len(sel), dtype=np.int32),
                                  type=pa.int32()),
            })
            pq.write_table(tbl, os.path.join(pdir, f"part-{f:05d}.parquet"))
        with open(marker, "w") as fh:
            fh.write("ok")
    return ids, X


def quant_ppm(X64: np.ndarray, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Engine-exact quantized cosine ppm for index pairs (ii, jj):
    the numpy image of vectorops.Q_*/qcos_ppm_udf."""
    Q = np.floor(X64 * 1000.0 + 0.5)  # float64 holds int64-exact here
    A, B = Q[ii], Q[jj]
    dots = (A * B).sum(axis=1)
    na = (A * A).sum(axis=1)
    nb = (B * B).sum(axis=1)
    return np.floor(1e6 * dots / np.sqrt(na * nb) + 0.5).astype(np.int64)


def ground_truth(ids: np.ndarray, X: np.ndarray, raw_floor: float = 0.63):
    """Exact enumeration of all pairs with raw cosine ≥ raw_floor via
    blocked matmul, re-scored with the quantized-ppm arithmetic.
    Returns (id_a, id_b, ppm) arrays with id_a < id_b."""
    n = X.shape[0]
    bi, bj = 8192, 65536
    out_i, out_j = [], []
    for i0 in range(0, n, bi):
        i1 = min(i0 + bi, n)
        Xi = X[i0:i1]
        for j0 in range(i0, n, bj):
            j1 = min(j0 + bj, n)
            G = Xi @ X[j0:j1].T
            if j0 == i0:  # mask diagonal + lower triangle of the tile
                rows = np.arange(i1 - i0)[:, None]
                cols = np.arange(j1 - j0)[None, :]
                G[cols <= rows] = -2.0
            hit = np.argwhere(G >= raw_floor)
            if len(hit):
                out_i.append(hit[:, 0] + i0)
                out_j.append(hit[:, 1] + j0)
    ii = np.concatenate(out_i) if out_i else np.array([], dtype=np.int64)
    jj = np.concatenate(out_j) if out_j else np.array([], dtype=np.int64)
    X64 = X.astype(np.float64)
    ppm = quant_ppm(X64, ii, jj)
    id_a = np.minimum(ids[ii], ids[jj])
    id_b = np.maximum(ids[ii], ids[jj])
    return id_a, id_b, ppm


def bucket_of(ppm: np.ndarray) -> np.ndarray:
    """Map ppm to its bucket lower edge (milli)."""
    edges = np.array(PPM_BUCKETS) * 1000
    idx = np.searchsorted(edges, ppm, side="right") - 1
    return np.where(idx >= 0, np.array(PPM_BUCKETS)[np.clip(idx, 0, None)], 0)


def cached_truth(corpus_dir: str, ids, X):
    """Ground truth is a pure function of the corpus — cache it next
    to the parquet so re-runs (and the B1/B2 split) pay the blocked
    matmul once."""
    path = os.path.join(corpus_dir, "truth.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["ta"], z["tb"], z["tppm"]
    ta, tb, tppm = ground_truth(ids, X)
    keep = tppm >= PPM_BUCKETS[0] * 1000
    ta, tb, tppm = ta[keep], tb[keep], tppm[keep]
    np.savez_compressed(path, ta=ta, tb=tb, tppm=tppm)
    return ta, tb, tppm


def measure(spark, corpus_dir: str, ids, X, n_planes: int, n_bands: int,
            thr_ppm: int, do_clusters: bool) -> dict:
    """Band join (ids only) ∩ truth → per-bucket recall; verified-pair
    set check; optional CC cluster recall."""
    import pyspark.sql.functions as F

    from the_hive_spark.functions.lsh import lsh_near_dup_candidates
    from the_hive_spark.operators.similarity import qcos_ppm_udf
    from the_hive_spark.tables import table

    res: dict = {"n_planes": n_planes, "n_bands": n_bands,
                 "bits_per_band": n_planes // n_bands}
    t0 = time.perf_counter()
    ta, tb, tppm = cached_truth(corpus_dir, ids, X)
    res["sec_ground_truth"] = round(time.perf_counter() - t0, 2)
    res["n_true_pairs_ge_650k_ppm"] = int(len(ta))
    res["truth_sha"] = hashlib.sha256(
        np.stack([ta, tb, tppm]).tobytes()).hexdigest()[:16]
    # family ids are base (< BG_ID_BASE) or spoke (>= 1e12); a pair is
    # within-family iff both are family ids of the SAME family index
    is_fam_a = (ta < BG_ID_BASE) | (ta >= 10**12)
    is_fam_b = (tb < BG_ID_BASE) | (tb >= 10**12)
    same_fam = is_fam_a & is_fam_b & (ta % 10**12 == tb % 10**12)
    res["n_truth_pairs_background_chance"] = int((~same_fam).sum())
    res["max_background_ppm"] = (
        int(tppm[~same_fam].max()) if (~same_fam).any() else None)

    import pandas as pd

    emb = table(spark, corpus_dir, "embeddings")
    truth = spark.createDataFrame(
        pd.DataFrame({"id_a": ta, "id_b": tb, "ppm": tppm}))

    # candidate ids (guard ON — a refusal propagates to the caller)
    t0 = time.perf_counter()
    cand = lsh_near_dup_candidates(
        emb, n_planes=n_planes, n_bands=n_bands, with_vectors=False,
    ).persist()
    n_cand = cand.count()
    res["n_candidates"] = int(n_cand)
    res["sec_candidates"] = round(time.perf_counter() - t0, 2)
    res["possible_pairs"] = int(len(ids)) * (int(len(ids)) - 1) // 2
    res["prune_factor"] = round(res["possible_pairs"] / max(n_cand, 1), 1)

    hits = cand.join(F.broadcast(truth), ["id_a", "id_b"], "inner")
    hit_ppm = hits.select("ppm").toPandas()["ppm"].to_numpy()
    res["by_cos_bucket"] = {}
    tb_all = bucket_of(tppm)
    tb_hit = bucket_of(hit_ppm) if len(hit_ppm) else np.array([])
    for b in PPM_BUCKETS:
        tot = int((tb_all == b).sum())
        hit = int((tb_hit == b).sum()) if len(tb_hit) else 0
        if tot:
            res["by_cos_bucket"][f"{b/1000:.2f}"] = {
                "total": tot, "candidate_hits": hit,
                "recall": round(hit / tot, 4)}

    # verified output vs truth at the operating threshold
    t0 = time.perf_counter()
    vecs = emb.select("vec_id", "embedding")
    scorer = qcos_ppm_udf()
    verified = (
        cand.join(vecs.withColumnsRenamed(
            {"vec_id": "id_a", "embedding": "vec_a"}), "id_a")
        .join(vecs.withColumnsRenamed(
            {"vec_id": "id_b", "embedding": "vec_b"}), "id_b")
        .withColumn("cos_ppm", scorer(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cos_ppm") >= thr_ppm)
        .select("id_a", "id_b", "cos_ppm")
        .persist()
    )
    n_verified = verified.count()
    res["sec_verify"] = round(time.perf_counter() - t0, 2)
    res["n_verified_pairs"] = int(n_verified)
    truth_thr = truth.filter(F.col("ppm") >= thr_ppm)
    res["n_truth_pairs_at_threshold"] = truth_thr.count()
    missed = truth_thr.join(verified, ["id_a", "id_b"], "left_anti")
    extra = verified.join(F.broadcast(truth_thr), ["id_a", "id_b"], "left_anti")
    res["missed_at_threshold"] = missed.count()
    res["extra_at_threshold"] = extra.count()  # must be 0: exact verify
    res["pair_recall_at_threshold"] = round(
        1 - res["missed_at_threshold"] / max(res["n_truth_pairs_at_threshold"], 1), 6)
    res["missed_sample"] = [
        [r["id_a"], r["id_b"], r["ppm"]] for r in missed.limit(10).collect()]

    if do_clusters:
        from the_hive_spark.operators.graph import connected_components

        t0 = time.perf_counter()
        cc = connected_components(
            verified.select(F.col("id_a").alias("src"),
                            F.col("id_b").alias("dst")))
        lab = cc.select(F.col("node").alias("id"),
                        F.col("component").alias("comp"))
        same = (
            truth_thr
            .join(lab.withColumnsRenamed({"id": "id_a", "comp": "ca"}), "id_a")
            .join(lab.withColumnsRenamed({"id": "id_b", "comp": "cb"}), "id_b")
            .filter(F.col("ca") == F.col("cb"))
            .count()
        )
        res["sec_clusters"] = round(time.perf_counter() - t0, 2)
        res["cluster_recall_at_threshold"] = round(
            same / max(res["n_truth_pairs_at_threshold"], 1), 6)
    cand.unpersist()
    verified.unpersist()
    return res


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag, default):
        return type(default)(argv[argv.index(flag) + 1]) if flag in argv else default

    out_path = opt("--out", "EMB_DEDUP_SCALE_GRADED.json")
    runs = opt("--runs", "A,B,C").split(",")

    from the_hive_spark.functions.lsh import srp_banding_for_threshold
    from the_hive_spark.session import get_spark

    spark = get_spark(app_name="emb-graded-eval")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"dim": DIM, "grades": GRADES, "seed": SEED,
                    "threshold_ppm": THRESH_PPM, "load_start": _load(),
                    "runs": {}}

    if "A" in runs:
        n, fams = 200_000, 5_000
        cdir = "/tmp/emb_graded_200k"
        ids, X = make_corpus(n, fams, cdir)
        t0 = time.perf_counter()
        r = measure(spark, cdir, ids, X, n_planes=192, n_bands=16,
                    thr_ppm=THRESH_PPM, do_clusters=True)
        r["n_vectors"], r["n_families"] = n, fams
        r["what"] = ("registered emb_near_dup_lsh banding (16×12) "
                     "end-to-end at 200k")
        r["sec_total"] = round(time.perf_counter() - t0, 2)
        report["runs"]["A_200k_default"] = r
        print(json.dumps({"run": "A", **{k: r[k] for k in
              ("n_candidates", "pair_recall_at_threshold")}}), flush=True)

    if "B" in runs:
        n, fams = 500_000, 10_000
        cdir = "/tmp/emb_graded_500k"
        ids, X = make_corpus(n, fams, cdir)
        # B1: default banding — expect the r11 guard to refuse
        b: dict = {"what": "registered banding (16×12) at 500k — guard probe"}
        t0 = time.perf_counter()
        try:
            from the_hive_spark.functions.lsh import lsh_near_dup_candidates
            from the_hive_spark.tables import table as _table

            lsh_near_dup_candidates(
                _table(spark, cdir, "embeddings"),
                n_planes=192, n_bands=16, with_vectors=False,
            ).count()
            b["outcome"] = "completed (guard did not fire)"
        except ValueError as e:
            b["outcome"] = "guard refusal"
            b["err"] = str(e)
        b["sec"] = round(time.perf_counter() - t0, 2)
        report["runs"]["B1_500k_default_guard"] = b
        print(json.dumps({"run": "B1", "outcome": b["outcome"]}), flush=True)

        # B2: the remediation the refusal names
        sized = srp_banding_for_threshold(0.95, n)
        t0 = time.perf_counter()
        r = measure(spark, cdir, ids, X, thr_ppm=THRESH_PPM,
                    do_clusters=True, **sized)
        r["n_vectors"], r["n_families"] = n, fams
        r["what"] = (f"srp_banding_for_threshold(0.95, {n}) remediation: "
                     f"{sized['n_bands']}×{sized['n_planes']//sized['n_bands']}"
                     " bits at 500k")
        r["sec_total"] = round(time.perf_counter() - t0, 2)
        report["runs"]["B2_500k_sized"] = r
        print(json.dumps({"run": "B2", **{k: r[k] for k in
              ("n_candidates", "pair_recall_at_threshold")}}), flush=True)

    if "C" in runs:
        n, fams = 100_000, 2_500
        cdir = "/tmp/emb_graded_100k"
        ids, X = make_corpus(n, fams, cdir)
        sized = srp_banding_for_threshold(0.8, n, recall_floor=0.95)
        t0 = time.perf_counter()
        r = measure(spark, cdir, ids, X, thr_ppm=800_000,
                    do_clusters=False, **sized)
        r["n_vectors"], r["n_families"] = n, fams
        r["what"] = (f"SemDeDup operating point τ=0.8: sizer picks "
                     f"{sized['n_bands']}×{sized['n_planes']//sized['n_bands']}"
                     " bits at 100k")
        r["sec_total"] = round(time.perf_counter() - t0, 2)
        # the honest boundary: the sizer refuses τ=0.8 at 200k+
        try:
            srp_banding_for_threshold(0.8, 200_000, recall_floor=0.95)
            r["sizer_at_200k"] = "fits"
        except ValueError as e:
            r["sizer_at_200k"] = f"refuses: {e}"
        report["runs"]["C_100k_tau08"] = r
        print(json.dumps({"run": "C", **{k: r[k] for k in
              ("n_candidates", "pair_recall_at_threshold")}}), flush=True)

    if "D" in runs:
        # the top of the verdict's asked range: 1M vectors, sizer-
        # chosen banding, full candidate-recall + verified-set check
        n, fams = 1_000_000, 20_000
        cdir = "/tmp/emb_graded_1m"
        ids, X = make_corpus(n, fams, cdir)
        sized = srp_banding_for_threshold(0.95, n)
        t0 = time.perf_counter()
        r = measure(spark, cdir, ids, X, thr_ppm=THRESH_PPM,
                    do_clusters=True, **sized)
        r["n_vectors"], r["n_families"] = n, fams
        r["what"] = (f"srp_banding_for_threshold(0.95, {n}): "
                     f"{sized['n_bands']}×{sized['n_planes']//sized['n_bands']}"
                     " bits at 1M")
        r["sec_total"] = round(time.perf_counter() - t0, 2)
        report["runs"]["D_1m_sized"] = r
        print(json.dumps({"run": "D", **{k: r[k] for k in
              ("n_candidates", "pair_recall_at_threshold")}}), flush=True)

    report["load_end"] = _load()
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
