"""Recall floors for the Matryoshka truncation evaluation."""

from __future__ import annotations


def test_matryoshka_recall_monotone_and_full_is_perfect(spark):
    from the_hive_spark.operators.similarity import emb_matryoshka_recall

    rows = {
        r["prefix_dim"]: r
        for r in emb_matryoshka_recall(spark, "/root/testdata/sf0.001").collect()
    }
    dims = sorted(rows)
    full = dims[-1]
    # full-dimension "truncation" must reproduce the ground truth
    assert rows[full]["recall_ppm"] == 1000000
    # recall at any prefix is a valid fraction with the right k
    for d in dims:
        assert 0 <= rows[d]["recall_ppm"] <= 1000000
        assert rows[d]["k"] == 10
        assert rows[d]["n_hits"] <= rows[d]["k"]
    # the mock embedder is not MRL-trained: tiny prefixes must lose
    # real recall (this pins that the slice actually bites), while
    # 32 of 64 dims should retain a nontrivial fraction
    assert rows[8]["recall_ppm"] < 1000000
