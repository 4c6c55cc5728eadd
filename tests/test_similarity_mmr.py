"""emb_mmr_diverse_topk invariants (rows-only registry query — no SQL
oracle exists for greedy selection, so determinism and the MMR
contract are pinned here instead)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mmr_rows(spark):
    import os

    if not os.path.isdir(SF):
        pytest.skip(f"no testdata at {SF}")
    from the_hive_spark.operators.similarity import emb_mmr_diverse_topk

    return emb_mmr_diverse_topk(spark, SF).collect()


def test_mmr_shape_and_determinism(spark, mmr_rows):
    from the_hive_spark.operators.similarity import KNN_K, emb_mmr_diverse_topk

    assert len(mmr_rows) == KNN_K
    assert [r["rank"] for r in mmr_rows] == list(range(1, KNN_K + 1))
    again = emb_mmr_diverse_topk(spark, SF).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in mmr_rows]


def test_mmr_first_pick_is_top1_and_subset_of_shortlist(spark, mmr_rows):
    from the_hive_spark.operators.similarity import cosine_topk
    from the_hive_spark.tables import table

    emb = table(spark, SF, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    short = cosine_topk(emb.filter(F.col("vec_id") != 0), qv, k=50).collect()
    short_ids = [r["vec_id"] for r in short]
    got_ids = [r["vec_id"] for r in mmr_rows]
    # with zero picked, MMR score reduces to λ·relevance ⇒ pick = top-1
    assert got_ids[0] == short_ids[0]
    assert set(got_ids) <= set(short_ids)


def test_mmr_diversifies_vs_plain_topk(spark, mmr_rows):
    """Average pairwise similarity of the MMR set must not exceed the
    plain top-k's — the entire point of the re-rank."""
    from the_hive_spark.functions.vectorops import quantize_block
    from the_hive_spark.operators.similarity import KNN_K, cosine_topk
    from the_hive_spark.tables import table
    import pandas as pd

    emb = table(spark, SF, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    plain = cosine_topk(emb.filter(F.col("vec_id") != 0), qv, k=KNN_K).collect()

    def avg_pairwise(ids):
        vecs = (
            emb.filter(F.col("vec_id").isin([int(i) for i in ids]))
            .select("embedding")
            .collect()
        )
        M = quantize_block(pd.Series([r["embedding"] for r in vecs])).astype(
            np.float64
        )
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        S = M @ M.T
        n = len(ids)
        return (S.sum() - np.trace(S)) / (n * (n - 1))

    mmr_sim = avg_pairwise([r["vec_id"] for r in mmr_rows])
    plain_sim = avg_pairwise([r["vec_id"] for r in plain])
    assert mmr_sim <= plain_sim + 1e-9


def test_kmeans_stats_partitions_corpus(spark):
    """emb_kmeans_stats: clusters partition the corpus, inertia is
    non-negative, and the fixed seed makes reruns identical."""
    from the_hive_spark.operators.similarity import emb_kmeans_stats
    from the_hive_spark.tables import table

    rows = emb_kmeans_stats(spark, SF).collect()
    n_total = table(spark, SF, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_total
    assert 1 <= len(rows) <= 8
    assert all(r["inertia_micro"] >= 0 for r in rows)

    again = emb_kmeans_stats(spark, SF).collect()
    key = lambda rs: sorted((r["cluster"], r["n_vecs"], r["inertia_micro"]) for r in rs)
    assert key(again) == key(rows)
