"""Product-quantization floors: encode determinism, reconstruction
quality, and ADC recall against the exact scan (functions/pq.py)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from the_hive_spark.functions.pq import (
    pq_adc_topk,
    pq_decode_matrix,
    pq_encode,
    pq_train,
)
from the_hive_spark.tables import table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def trained(emb):
    books = pq_train(emb)
    codes = pq_encode(emb, books).persist()
    codes.count()
    yield books, codes
    codes.unpersist()


def test_codebook_shape_and_determinism(emb, trained):
    books, _ = trained
    assert books.shape == (8, 16, 8)  # m=8 subspaces of 64-dim, k=16
    again = pq_train(emb)
    assert np.array_equal(books, again), "seed-pinned KMeans must be stable"


def test_encode_deterministic(emb, trained):
    books, codes = trained
    a = {r["vec_id"]: tuple(r["codes"]) for r in codes.collect()}
    b = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq_encode(emb, books).collect()
    }
    assert a == b
    assert all(0 <= c < 16 for cs in a.values() for c in cs)


def test_reconstruction_beats_zero_vector(emb, trained):
    books, codes = trained
    rows = codes.join(emb.select("vec_id", "embedding"), "vec_id").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    recon = pq_decode_matrix(
        np.array([r["codes"] for r in rows], dtype=np.int64), books
    )
    err = np.linalg.norm(recon - mat, axis=1).mean()
    base = np.linalg.norm(mat, axis=1).mean()
    # 8×16-centroid codebooks over 64-dim high-entropy unit vectors:
    # must beat the zero-vector encoder (err == base) by a real margin
    assert err < 0.85 * base, (err, base)


def test_adc_recall_floor(emb, trained):
    from the_hive_spark.operators.similarity import cosine_topk

    books, codes = trained
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    corpus_codes = codes.filter(F.col("vec_id") != 0)
    exact = {
        r["vec_id"]
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 0), qv, k=10
        ).select("vec_id").collect()
    }
    got = {
        r["vec_id"]
        for r in pq_adc_topk(corpus_codes, books, qv, k=10).collect()
    }
    assert len(exact & got) >= 3, (exact, got)


def test_registry_eval_rows(spark):
    from the_hive_spark.operators.similarity import emb_pq_eval

    rows = {r["metric"]: r for r in emb_pq_eval(spark, SF_DIR).collect()}
    assert rows["pq_adc_recall"]["value_ppm"] >= 100_000
    # shortlist-50 + exact re-rank must recover most of the exact top-10
    assert rows["pq_adc_rerank_recall"]["value_ppm"] >= 400_000
    assert (
        rows["pq_adc_rerank_recall"]["value_ppm"]
        >= rows["pq_adc_recall"]["value_ppm"]
    )
    recon = rows["pq_recon_err_m8_k16"]
    assert 0 < recon["value_ppm"] < 850_000


def test_ivfpq_recall_floor(spark):
    from the_hive_spark.operators.similarity import emb_ivfpq_recall

    row = emb_ivfpq_recall(spark, SF_DIR).collect()[0]
    assert row["recall_ppm"] >= 300_000
    # the index must actually prune: 3 of 16 lists ⇒ well under half
    assert row["scanned_ppm"] < 500_000
