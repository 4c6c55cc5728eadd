"""Round-10 operator tests: banding-recall regression pin for the
widened MinHash signature, and the FP-growth lattice-width guard.

The recall test is the unit-scale image of the sf10r ground-truth
eval (scripts/dedup_ground_truth.py): families of a base doc plus
every-12th/6th/4th-token rewrites have true pair Jaccard ≈ 0.85 /
0.7 / 0.55 — the graded-similarity band where the old 8-hash/4-band
signature connected only ~37% of true pairs (DEDUP_SCALE_100X.md).
MinHash here is md5-deterministic (no seed), so for a fixed fixture
the outcome is exact, not probabilistic: this fixture passes with the
32-hash/16-band signature and was verified to FAIL with the old one
(several families lose their borderline replica) — a regression that
narrows the signature breaks this test, not a production corpus.
"""

from __future__ import annotations

import random

import pandas as pd


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len()
    df["lang"] = "en"
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _family_rows(n_families=25, words_per_doc=60):
    """Families of 4: base + rewrites of every 12th/6th/4th word, the
    make_realistic_corpus.py rule. Per-family letter vocabularies keep
    cross-family 5-gram Jaccard ≈ 0 (no shared words at all)."""
    rows = []
    for fam in range(n_families):
        rng = random.Random(1000 + fam)
        base = [
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(7))
            for _ in range(words_per_doc)
        ]
        for i, step in enumerate((0, 12, 6, 4)):
            words = list(base)
            if step:
                for p in range(len(words)):
                    if (p + i) % step == 0:
                        words[p] = f"q{(fam * 97 + i * 13 + p) % 99991}z"
            rows.append(
                {
                    "doc_id": fam + i * 10**12,
                    "text": " ".join(words),
                    "source": f"s{fam % 4}",
                }
            )
    return rows


def test_dup_clusters_connect_graded_families(spark, tmp_path):
    """Every (base, rewrite) family must land in ONE cluster and no
    two families may merge: recall 1.0 / precision 1.0 on the graded
    0.55-0.85 Jaccard band at unit scale."""
    from the_hive_spark.operators.dedup import doc_dup_clusters

    rows = _family_rows()
    sf = _write_docs(tmp_path, rows)
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in doc_dup_clusters(spark, sf).collect()
    }
    assert len(labels) == len(rows)
    by_family: dict[int, set[int]] = {}
    for doc_id, cluster in labels.items():
        by_family.setdefault(doc_id % 10**12, set()).add(cluster)
    # recall: one cluster per family (all four docs connected)
    split = {f: cs for f, cs in by_family.items() if len(cs) > 1}
    assert not split, f"families split across clusters: {split}"
    # precision: distinct families must not share a cluster
    all_clusters = [min(cs) for cs in by_family.values()]
    assert len(set(all_clusters)) == len(by_family), "families merged"


def test_minhash_band_collision_floor(spark, tmp_path):
    """Direct-candidate floor under the widened signature: the
    J≈0.55 (every-4th-word rewrite) pair of each family must collide
    on ≥2 of the 16 bands for at least 90% of families — the measured
    property the 4-band signature failed (~35% at J=0.55), asserted
    below the ≥2-band filter doc_dup_clusters applies."""
    from pyspark.sql import functions as F

    from the_hive_spark.operators.dedup import (
        _lsh_band_pairs,
        minhash_signatures,
    )

    rows = [
        r
        for r in _family_rows()
        if r["doc_id"] < 10**12 or r["doc_id"] >= 3 * 10**12
    ]
    sf = _write_docs(tmp_path, rows)
    pairs = (
        _lsh_band_pairs(minhash_signatures(spark, sf))
        .filter(F.col("n_bands") >= 2)
        .collect()
    )
    hit = {
        r["doc_a"] % 10**12
        for r in pairs
        if r["doc_a"] % 10**12 == r["doc_b"] % 10**12
    }
    n_families = len({r["doc_id"] % 10**12 for r in rows})
    assert len(hit) >= 0.9 * n_families, (len(hit), n_families)


def test_frequent_itemsets_lattice_guard(spark, tmp_path):
    """The FP-growth lattice-width guard refuses an item-dense corpus
    BEFORE fitting (the sf10 clone corpus OOMed an 80g JVM; the guard
    converts that into a measured refusal). Exercised by dropping the
    cap below the fixture's frequent-item count rather than building
    a 500k-item corpus in a unit test."""
    import pytest

    from the_hive_spark.operators import analytics
    from the_hive_spark.operators.analytics import q_frequent_itemsets

    li = pd.DataFrame(
        {
            # 3 parts, each in 15 baskets >= the support threshold 12
            "l_orderkey": [b for b in range(15) for _ in range(3)],
            "l_partkey": [p for _ in range(15) for p in (1, 2, 3)],
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    old = analytics._FREQ_ITEMSET_MAX_ITEMS
    analytics._FREQ_ITEMSET_MAX_ITEMS = 2
    try:
        with pytest.raises(ValueError, match="frequent items"):
            q_frequent_itemsets(spark, str(tmp_path))
    finally:
        analytics._FREQ_ITEMSET_MAX_ITEMS = old
    # under the real cap the same corpus mines fine
    got = {r["itemset"]: r["freq"] for r in q_frequent_itemsets(
        spark, str(tmp_path)).collect()}
    assert got["1"] == 15 and got["1|2"] == 15 and "1|2|3" not in got
