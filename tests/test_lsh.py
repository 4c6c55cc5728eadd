"""ANN scale-path tests: LSH and IVF recall against the exact
brute-force oracle, and bandedness of the near-dup candidate pruning."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from the_hive_spark.functions.lsh import (
    ann_topk_lsh,
    hyperplanes,
    ivf_build,
    ivf_topk,
    lsh_near_dup_candidates,
    near_dup_pairs_lsh,
    signature_bits,
    simhash_signature_udf,
)
from the_hive_spark.operators.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(spark):
    from the_hive_spark.tables import table

    return table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def query_vec(embeddings):
    row = embeddings.filter(F.col("vec_id") == 0).collect()[0]
    return [float(x) for x in row["embedding"]]


def test_signature_deterministic_and_distributed(spark, embeddings):
    """UDF signatures equal the local numpy computation."""
    rows = embeddings.limit(50).collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    planes = hyperplanes(mat.shape[1])
    expected = dict(zip((r["vec_id"] for r in rows),
                        signature_bits(mat, planes)))
    sig_udf = simhash_signature_udf()
    got = {
        r["vec_id"]: r["sig"]
        for r in embeddings.limit(50)
        .select("vec_id", sig_udf("embedding").alias("sig"))
        .collect()
    }
    assert got == expected


def test_ann_lsh_close_neighbor_multiprobe(embeddings, query_vec):
    """The multiprobe design point: a query *close* to its target
    (cos ≈ 0.99, the semantic-search regime) is found at rank 1 while
    scanning a tiny candidate fraction."""
    rng = np.random.default_rng(7)
    perturbed = [
        float(x + 0.02 * e)
        for x, e in zip(query_vec, rng.standard_normal(len(query_vec)))
    ]
    hits = ann_topk_lsh(embeddings, perturbed, k=1).collect()
    assert hits and hits[0]["vec_id"] == 0


def test_ann_lsh_multitable_mid_similarity(embeddings, query_vec):
    """Mid-similarity regime: L=16 tables × 6 bits, OR-matched.
    Calibrated on this corpus to ~0.9 recall@10 (floor 0.5 for seed
    robustness) at well under half the candidate space."""
    others = embeddings.filter(F.col("vec_id") != 0)
    exact = {
        r["vec_id"] for r in cosine_topk(others, query_vec, k=10).collect()
    }
    approx_rows = ann_topk_lsh(
        others, query_vec, k=10, n_planes=6, n_tables=16
    ).collect()
    approx = {r["vec_id"] for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"multi-table LSH recall {recall} below floor"


def test_ann_lsh_scores_are_exact_cosine(embeddings, query_vec):
    """Approximation affects recall only — returned scores are exact."""
    others = embeddings.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"]: r["score"]
             for r in cosine_topk(others, query_vec, k=500).collect()}
    for r in ann_topk_lsh(
        others, query_vec, k=10, n_planes=6, n_tables=16
    ).collect():
        assert abs(r["score"] - exact[r["vec_id"]]) < 1e-9


def test_lsh_near_dup_candidates_prune(embeddings):
    n = embeddings.count()
    cand = lsh_near_dup_candidates(embeddings).count()
    assert cand < n * (n - 1) / 2 * 0.5, "banding should prune most pairs"


def test_near_dup_lsh_finds_planted_pairs(spark, embeddings):
    """The test corpus has no true near-dups (max pairwise cos ≈ 0.5),
    so plant some: vec_id 10000+i is a lightly-perturbed copy of vec i
    (cos ≈ 0.998). LSH banding must recover every planted pair and
    nothing else at the 0.95 threshold."""
    rng = np.random.default_rng(42)
    base = embeddings.filter(F.col("vec_id") < 20).collect()
    planted = [
        (
            int(r["vec_id"]) + 10000,
            [float(x + 0.01 * e) for x, e in
             zip(r["embedding"], rng.standard_normal(len(r["embedding"])))],
            int(r["label"]),
        )
        for r in base
    ]
    extra = spark.createDataFrame(
        planted, "vec_id long, embedding array<float>, label int"
    )
    corpus = embeddings.select("vec_id", "embedding", "label").unionByName(extra)
    got = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs_lsh(
            corpus, threshold=0.95, n_planes=48, n_bands=12
        ).collect()
    }
    expected = {(int(r["vec_id"]), int(r["vec_id"]) + 10000) for r in base}
    assert got == expected, f"missed={expected - got} spurious={got - expected}"


def test_ivf_close_neighbor(embeddings, query_vec):
    """IVF design point: a close query finds its target probing 2/8
    inverted lists (target's cluster is the query's nearest centroid)."""
    rng = np.random.default_rng(11)
    perturbed = [
        float(x + 0.02 * e)
        for x, e in zip(query_vec, rng.standard_normal(len(query_vec)))
    ]
    assigned, centroids = ivf_build(embeddings, n_clusters=8)
    hits = ivf_topk(assigned, centroids, perturbed, k=1, n_probe=2).collect()
    assert hits and hits[0]["vec_id"] == 0


def test_ivf_prunes_scan(embeddings, query_vec):
    assigned, centroids = ivf_build(embeddings, n_clusters=8)
    n = embeddings.count()
    probed, total = 0, 0
    import numpy as _np
    counts = {r["_cluster"]: r["n"] for r in
              assigned.groupBy("_cluster").agg(F.count(F.lit(1)).alias("n")).collect()}
    q = _np.array(query_vec)
    qn = q / _np.linalg.norm(q)
    sims = sorted(
        ((float(_np.dot(c, qn) / (_np.linalg.norm(c) or 1)), i)
         for i, c in enumerate(map(_np.array, centroids))),
        reverse=True,
    )
    probe = [i for _, i in sims[:2]]
    probed = sum(counts.get(i, 0) for i in probe)
    assert probed < n, "probing 2/8 lists must scan a strict subset"


def test_ann_auto_params_toy_and_scale():
    """The auto-sizers must reproduce BOTH attested points exactly:
    the toy configs at ≤10k vectors (what the rows-only driver checks
    pin at sf0.001-0.1) and the 1M-eval winning configs at 1e6
    (ANN_SCALE_EVAL.json: recall 1.0 at 0.71% / 3.1% scanned)."""
    from the_hive_spark.functions.lsh import ivf_auto_params, lsh_auto_params

    # toy regime: unchanged registered behavior
    assert lsh_auto_params(200) == {
        "n_tables": 16, "n_planes": 6, "probe_distance": 0}
    assert lsh_auto_params(10_000) == {
        "n_tables": 16, "n_planes": 6, "probe_distance": 0}
    assert ivf_auto_params(200) == {"n_clusters": 16, "n_probe": 3}
    assert ivf_auto_params(10_000) == {"n_clusters": 16, "n_probe": 3}
    # 1M: exactly the eval-attested winners
    assert lsh_auto_params(1_000_000) == {
        "n_tables": 1, "n_planes": 16, "probe_distance": 2}
    assert ivf_auto_params(1_000_000) == {"n_clusters": 256, "n_probe": 8}
    # mid-scale (20k): bucket space grows, bounds hold
    mid = lsh_auto_params(20_000)
    assert mid["n_tables"] == 1 and 12 <= mid["n_planes"] <= 24
    imid = ivf_auto_params(20_000)
    assert imid == {"n_clusters": 32, "n_probe": 3}
    # monotone, clamped at the ceiling
    big = lsh_auto_params(10_000_000_000)
    assert big["n_planes"] == 24
    assert ivf_auto_params(10_000_000_000)["n_clusters"] == 1024
