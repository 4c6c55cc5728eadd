"""Direct attestation for the registry-level rows-only queries that
were previously pinned only through their library internals.

The driver cannot hash-check un-oracled queries (``err: no_oracle``),
so these tests — together with test_lsh/test_pq/test_bpe_train/
test_multimodal/test_similarity_* — are the correctness record for the
non-SQL surface. ROWS_ONLY.md indexes the full mapping.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from the_hive_spark.registry import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.01"


def _exact_topk_ids(spark, sf_dir: str, k: int) -> tuple[set, dict]:
    """Brute-force ground truth for the standard query (vec_id 0)."""
    from the_hive_spark.operators.similarity import cosine_topk
    from the_hive_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    full = {
        r["vec_id"]: r["score"]
        for r in cosine_topk(corpus, qv, k=500).collect()
    }
    topk = {i for i, _ in sorted(full.items(), key=lambda t: -t[1])[:k]}
    return topk, full


def test_emb_ann_lsh_topk_exact_scores_and_recall(spark):
    """Wrapper-level check (the registered query itself, not just the
    library): k rows, scores are EXACT cosine (approximation affects
    recall only), recall@10 ≥ 0.5 vs brute force (observed 0.8)."""
    truth, full = _exact_topk_ids(spark, SF, 10)
    rows = QUERIES["emb_ann_lsh_topk"](spark, SF).collect()
    assert len(rows) == 10
    got = {r["vec_id"] for r in rows}
    for r in rows:
        assert abs(r["score"] - full[r["vec_id"]]) < 1e-9
    assert len(got & truth) / 10 >= 0.5


def test_emb_ann_ivf_topk_exact_scores_and_recall(spark):
    """Same contract for the IVF family (observed recall 0.6 at 3/16
    probes; floor 0.3 for seed robustness)."""
    truth, full = _exact_topk_ids(spark, SF, 10)
    rows = QUERIES["emb_ann_ivf_topk"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(r["score"] - full[r["vec_id"]]) < 1e-9
    got = {r["vec_id"] for r in rows}
    assert len(got & truth) / 10 >= 0.3


def test_emb_ann_recall_is_true_recall(spark):
    """emb_ann_recall's reported figures must EQUAL the recall an
    independent recomputation gets from the same seed-deterministic
    paths — the self-eval is only evidence if it tells the truth."""
    truth, _ = _exact_topk_ids(spark, SF, 10)
    reported = {
        r["method"]: r for r in QUERIES["emb_ann_recall"](spark, SF).collect()
    }
    assert set(reported) == {"srp_lsh", "ivf"}
    lsh_ids = {r["vec_id"] for r in QUERIES["emb_ann_lsh_topk"](spark, SF).collect()}
    n_hits = len(lsh_ids & truth)
    assert reported["srp_lsh"]["n_hits"] == n_hits
    assert reported["srp_lsh"]["recall_ppm"] == 1_000_000 * n_hits // 10
    assert reported["ivf"]["recall_ppm"] >= 300_000
    assert reported["srp_lsh"]["recall_ppm"] >= 500_000


def test_events_approx_percentiles_within_bound(spark):
    """The GK sketch self-check must hold: every event type's p50/p90/
    p99 within 1% of the exact percentile (observed max 0.7%)."""
    rows = QUERIES["events_approx_value_percentiles"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["within_1pct"], (r["event_type"], r["max_err_ppm"])
        # self-check integrity: the flag derives from the same row
        assert (r["max_err_ppm"] <= 10_000) == r["within_1pct"]


def test_events_approx_user_count_within_bound(spark):
    """HLL++ rsd=2% self-check: observed exact at this cardinality
    (150 users/type); bound asserts ≤5%."""
    rows = QUERIES["events_approx_user_count"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["within_5pct"], (r["event_type"], r["abs_err_ppm"])
        assert r["exact_users"] > 0


def test_emb_spectrum_matches_local_eigendecomposition(spark):
    """The distributed moment accumulation must reproduce a single-
    machine numpy covariance eigendecomposition of the same corpus
    (±2 ppm for float merge-order differences), with descending
    shares and anisotropy ≡ the top component's share."""
    from the_hive_spark.tables import table

    rows = QUERIES["emb_spectrum_diagnostics"](spark, SF).collect()
    shares = {
        r["component"]: r["variance_share_ppm"]
        for r in rows
        if r["metric"] == "eigval_share"
    }
    aniso = [r for r in rows if r["metric"] == "anisotropy"][0]
    assert aniso["variance_share_ppm"] == shares[1]
    ordered = [shares[i] for i in sorted(shares)]
    assert ordered == sorted(ordered, reverse=True)

    mat = np.array(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in table(spark, SF, "embeddings").select("embedding").collect()
        ]
    )
    cov = np.cov(mat, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = evals.sum()
    for i in sorted(shares):
        want = int(1_000_000 * evals[i - 1] / total + 0.5)
        assert abs(shares[i] - want) <= 2, (i, shares[i], want)
