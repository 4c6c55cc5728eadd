"""Round-11 operator tests: measure-then-refuse guards for the two
banded near-dup joins that lacked them (media_phash_near_dup, the
embedding SRP band join), and the analytic SRP banding sizer.

The guard tests pin BOTH directions: a duplicate-dense corpus must
refuse with the metered count in the message (under a monkeypatched
cap, so the test corpus stays tiny), and a benign corpus must pass
under the default cap. The sizer tests pin the analytic contract —
recall floor met at the threshold, background mass within budget —
and the honest refusal where no banding fits (τ=0.8 past ~200k
vectors, the boundary EMB_DEDUP_SCALE_GRADED.json records).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len()
    df["lang"] = "en"
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


# ------------------------------------------------- phash band guard


def _image_doc_rows(n, clone_text=None):
    """doc_id ≡ 0 (mod 120 = lcm(3,8,5)) ⇒ kind=image AND identical
    width/height in documents_as_media, so clone payloads hash
    identically (dims derive from doc_id % 8 / % 5)."""
    rows = []
    for i in range(n):
        text = clone_text if clone_text else f"unique image payload {i} " * 4
        rows.append({"doc_id": 120 * i, "text": text, "source": "s0"})
    return rows


def test_phash_guard_refuses_duplicate_dense(spark, tmp_path, monkeypatch):
    from the_hive_spark.operators import multimodal

    sf_dir = _write_docs(tmp_path, _image_doc_rows(40, clone_text="same " * 30))
    # 40 identical payloads ⇒ identical phash ⇒ every 16-bit chunk
    # bucket holds all 40: Σ C(40,2)·4 bands = 3120 metered pairs
    monkeypatch.setattr(multimodal, "_PHASH_GUARD_CANDIDATES", 1000)
    with pytest.raises(ValueError, match="phash pigeonhole.*cap"):
        multimodal.media_phash_near_dup(spark, sf_dir).count()


def test_phash_guard_passes_benign(spark, tmp_path):
    from the_hive_spark.operators import multimodal

    sf_dir = _write_docs(tmp_path, _image_doc_rows(40))
    out = multimodal.media_phash_near_dup(spark, sf_dir)
    assert out.count() >= 0  # completes under the default cap


# ----------------------------------------------- SRP band-mass guard


def _emb_df(spark, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [[float(x) for x in v] for v in vecs],
        }
    )
    return spark.createDataFrame(pdf).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_srp_guard_refuses_duplicate_dense(spark, monkeypatch):
    from the_hive_spark.functions import lsh

    rng = np.random.default_rng(7)
    v = rng.standard_normal(64)
    emb = _emb_df(spark, [v] * 100)  # every band bucket 100-deep
    monkeypatch.setattr(lsh, "BAND_GUARD_CANDIDATES", 1000)
    with pytest.raises(ValueError, match="SRP band buckets.*srp_banding_for_threshold"):
        lsh.lsh_near_dup_candidates(emb, n_planes=192, n_bands=16).count()


def test_srp_guard_passes_benign_and_ids_only(spark):
    from the_hive_spark.functions import lsh

    rng = np.random.default_rng(7)
    emb = _emb_df(spark, list(rng.standard_normal((200, 64))))
    ids_only = lsh.lsh_near_dup_candidates(
        emb, n_planes=192, n_bands=16, with_vectors=False
    )
    assert set(ids_only.columns) == {"id_a", "id_b"}
    full = lsh.lsh_near_dup_candidates(emb, n_planes=192, n_bands=16)
    # ids-only is the same candidate set, minus the vector join-back
    assert ids_only.count() == full.count()


# ------------------------------------------------- SRP banding sizer


def test_srp_sizer_meets_recall_floor_within_budget():
    from the_hive_spark.functions.lsh import (
        SRP_SIZER_MASS_BUDGET,
        srp_banding_for_threshold,
        srp_collision_prob,
    )

    # the sizer budget is pinned: EMB_DEDUP_SCALE_GRADED.json measured
    # THESE choices (21×15 at 0.95/500k, 36×11 at 0.8/100k) against
    # exact ground truth; a budget change silently unlinks the numbers
    assert SRP_SIZER_MASS_BUDGET == 250_000_000
    for tau, n in [(0.95, 500_000), (0.95, 1_000_000), (0.8, 100_000)]:
        floor = 0.95 if tau == 0.8 else 0.99
        p = srp_banding_for_threshold(tau, n, recall_floor=floor)
        bits = p["n_planes"] // p["n_bands"]
        assert srp_collision_prob(tau, bits, p["n_bands"]) >= floor
        bg_mass = p["n_bands"] * 2.0 ** -bits * n * (n - 1) / 2
        assert bg_mass <= SRP_SIZER_MASS_BUDGET / 2


def test_srp_sizer_refuses_infeasible_regime():
    from the_hive_spark.functions.lsh import srp_banding_for_threshold

    # τ=0.8 at 200k+: every banding meeting the floor busts the
    # candidate budget (≤64 bands) — the sizer must say so, not
    # silently hand back a join that melts the cluster
    with pytest.raises(ValueError, match="no SRP banding"):
        srp_banding_for_threshold(0.8, 200_000, recall_floor=0.95)


def test_srp_sizer_reproduces_registered_shape_at_driver_scale():
    from the_hive_spark.functions.lsh import srp_collision_prob

    # the registered emb_near_dup_lsh shape (16 bands × 12 bits) holds
    # ≥99% per-pair recall at the 0.95 operating threshold — the
    # analytic claim EMB_DEDUP_SCALE_GRADED.json verifies empirically
    assert srp_collision_prob(0.95, 12, 16) >= 0.99


# ------------------------------------- emb_near_dup_lsh auto-sizing


def test_emb_lsh_auto_banding_cutoff():
    """The registered operator keeps the attested 16×12 shape at or
    below the cutoff (every driver row + the sf10 decomposition regime)
    and hands off to the analytic sizer above it — at 500k the sizer's
    shape is the one EMB_DEDUP_SCALE_GRADED.json run B2 measured at
    0.9976 recall."""
    from the_hive_spark.functions.lsh import srp_banding_for_threshold
    from the_hive_spark.operators.similarity import EMB_LSH_AUTO_MAX

    assert EMB_LSH_AUTO_MAX == 250_000
    sized = srp_banding_for_threshold(0.95, 500_000)
    assert sized == {"n_planes": 315, "n_bands": 21}  # 21 bands × 15 bits
