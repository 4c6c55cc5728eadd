"""Approximate nearest-neighbor acceleration for cosine top-k (T1 at
the 100 TB scale; SURVEY.md §4.2.1).

The reference delegates ANN to Qdrant's HNSW (internal/vectordb/
vectordb.go:94-111, cosine distance). A Spark-native engine can't hold
a pointer-chasing graph index, so the scale paths here are the two
partition-friendly families:

- **Sign-random-projection LSH** (SimHash for cosine): n deterministic
  hyperplanes → n-bit signature; close-in-cosine vectors agree on most
  bits. Search probes the query's bucket plus all buckets within
  Hamming distance ``probe_distance``; near-dup mining bands the
  signature and equi-joins on band values. At cluster scale the bucket
  id is the table's partition key, so a probe is partition pruning —
  the scan touches only candidate partitions.
- **IVF** (inverted-file via KMeans): cluster centroids from
  pyspark.ml, rows partitioned by nearest centroid; a query scans the
  ``n_probe`` nearest inverted lists only.

Both paths end with the *exact* cosine re-rank over candidates, so
precision of returned scores equals the brute-force path; only recall
is approximate. Recall is tested against the exact oracle in
tests/test_lsh.py.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType

from the_hive_spark.operators.similarity import cosine

DEFAULT_N_PLANES = 16
DEFAULT_SEED = 0x48495645  # "HIVE"

# Below this cardinality the auto-sizers keep the original toy configs
# (L=16 × 6-bit OR-matched tables; IVF 16 lists / 3 probed): at a few
# thousand vectors a 16-bit bucket space is mostly empty and KMeans
# with 256 lists is over-fragmented, and the toy configs are what the
# rows-only attests pin at sf0.001-0.1 (≤2 k distinct vectors).
ANN_AUTO_TOY_MAX = 10_000


def lsh_auto_params(n: int) -> dict:
    """Size the SRP-LSH search index from the MEASURED corpus
    cardinality — the same adaptive-plan pattern as the dense/sparse
    dedup probe (operators/dedup.py).

    Round 8's 1M-distinct-vector eval (ANN_SCALE_EVAL.json) proved the
    fixed toy config (L=16 tables × 6 bits) over-scans 30× at real
    cardinality: 6-bit tables have 64 buckets, so each table matches
    ~n/64 of the corpus regardless of n — 23.8 % scanned at 1 M, vs
    0.71 % for a single 16-bit table with Hamming-≤2 multiprobe at the
    same recall 1.0. The bucket space must GROW with the corpus:
    n_planes ≈ log₂(n) − 4 keeps the expected bucket occupancy near
    2⁴ = 16 vectors, so the ~137 probed buckets (1 + 16 + C(16,2))
    scan a bounded candidate set at any n. At n = 1e6 this yields
    exactly the attested 16-bit/probe-2 winner.
    """
    if n <= ANN_AUTO_TOY_MAX:
        return {"n_tables": 16, "n_planes": 6, "probe_distance": 0}
    n_planes = min(24, max(12, round(np.log2(max(n, 2))) - 4))
    return {"n_tables": 1, "n_planes": n_planes, "probe_distance": 2}


def ivf_auto_params(n: int) -> dict:
    """Size the IVF index from the measured corpus cardinality.

    n_lists grows as ~√n/4 (snapped to a power of two, 16..1024) so
    the per-list length grows as ~4√n and probing a fixed handful of
    lists scans a shrinking fraction; n_probe = max(3, n_lists/32)
    keeps the probed fraction ≈ 3 % past the toy regime. At n = 1e6
    this yields 256 lists / 8 probed — the config the 1M eval attested
    at recall 1.0 and 3.1 % scanned (vs 31.2 % for the fixed 16/3 toy
    config); at toy sizes it stays 16/3, the rows-only attested
    behavior.
    """
    if n <= ANN_AUTO_TOY_MAX:
        return {"n_clusters": 16, "n_probe": 3}
    n_lists = 2 ** int(round(np.log2(max(np.sqrt(n) / 4.0, 16.0))))
    n_lists = min(1024, max(16, n_lists))
    return {"n_clusters": n_lists, "n_probe": max(3, n_lists // 32)}


def hyperplanes(dim: int, n_planes: int = DEFAULT_N_PLANES,
                seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic Gaussian hyperplanes, shape (n_planes, dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def signature_bits(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) float → (n,) int64 sign-bit signatures."""
    bits = (vecs @ planes.T) > 0  # (n, n_planes) bool
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


def simhash_signature_udf(n_planes: int = DEFAULT_N_PLANES,
                          seed: int = DEFAULT_SEED):
    """Pandas UDF: float-array column → int64 LSH signature.

    The hyperplane matrix is rebuilt per executor from (dim, seed) —
    cheap, deterministic, and avoids shipping state.
    """

    @F.pandas_udf(LongType())
    def sig(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        mat = np.array(col.tolist(), dtype=np.float64)
        planes = hyperplanes(mat.shape[1], n_planes, seed)
        return pd.Series(signature_bits(mat, planes))

    return sig


def multitable_signature_udf(n_tables: int, bits_per_table: int,
                             seed: int = DEFAULT_SEED):
    """Pandas UDF: float-array column → array of n_tables int64
    signatures (table t uses hyperplane seed ``seed + t``)."""

    @F.pandas_udf("array<long>")
    def sigs(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        mat = np.array(col.tolist(), dtype=np.float64)
        per_table = [
            signature_bits(mat, hyperplanes(mat.shape[1], bits_per_table, seed + t))
            for t in range(n_tables)
        ]
        stacked = np.stack(per_table, axis=1)  # (n, n_tables)
        return pd.Series([row.tolist() for row in stacked])

    return sigs


def _probe_buckets(sig: int, n_planes: int, probe_distance: int) -> list[int]:
    """The query bucket plus all buckets within Hamming distance d."""
    out = [sig]
    for d in range(1, probe_distance + 1):
        for idxs in combinations(range(n_planes), d):
            flipped = sig
            for i in idxs:
                flipped ^= 1 << i
            out.append(flipped)
    return out


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    n_planes: int = DEFAULT_N_PLANES,
    probe_distance: int = 2,
    n_tables: int = 1,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Approximate top-k cosine: LSH bucket probe → exact re-rank.

    Two regimes (sign-random-projection collision p = 1 - θ/π):

    - ``n_tables=1`` (default): single table of ``n_planes`` bits with
      Hamming-≤``probe_distance`` multiprobe. Right when relevant
      vectors are *close* (cos ≥ ~0.9 — semantic search over embedded
      chunks, near-dup lookup): a cos-0.98 neighbor lands within ~1
      bit of the query w.h.p., so probing ≤2 flips finds it while
      scanning ~0.2% of a uniform corpus.
    - ``n_tables=L`` > 1: L independent tables of ``n_planes`` bits
      OR-matched (classic AND-OR). Use for mid-similarity regimes;
      measured on the 64-dim test corpus, L=16 × 6 bits reaches ~0.9
      recall@10 at ~29% candidate fraction. On near-uniform data no
      sublinear index beats that honestly — brute force stays the
      fallback (SURVEY.md §7.3).

    Plan shape: scan + signature project + bucket filter + exact
    cosine + TakeOrdered(k). No shuffle. With the table pre-bucketed
    by signature (the cluster layout), the filter is partition pruning
    and scan cost drops to the probed fraction.
    """
    q = np.array(query_vec, dtype=np.float64)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])

    if n_tables == 1:
        planes = hyperplanes(len(q), n_planes, seed)
        q_sig = int(signature_bits(q[None, :], planes)[0])
        probes = _probe_buckets(q_sig, n_planes, probe_distance)
        sig_udf = simhash_signature_udf(n_planes, seed)
        matched = embeddings.withColumn(
            "_bucket", sig_udf(F.col(vec_col))
        ).filter(F.col("_bucket").isin(probes)).drop("_bucket")
    else:
        q_sigs = [
            int(signature_bits(q[None, :], hyperplanes(len(q), n_planes, seed + t))[0])
            for t in range(n_tables)
        ]
        sigs_udf = multitable_signature_udf(n_tables, n_planes, seed)
        q_arr = F.array(*[F.lit(s) for s in q_sigs])
        matched = (
            embeddings.withColumn("_sigs", sigs_udf(F.col(vec_col)))
            .withColumn("_qsigs", q_arr)
            .filter(F.expr("exists(zip_with(_sigs, _qsigs, (a, b) -> a = b), x -> x)"))
            .drop("_sigs", "_qsigs")
        )

    return (
        matched.withColumn("_q", qcol)
        .withColumn("score", cosine(vec_col, "_q"))
        .drop("_q")
        .orderBy(F.desc("score"))
        .limit(k)
    )


# Cap on the banded self-join's exact output volume (Σ C(bucket, 2),
# measured with one aggregate BEFORE the join runs) — the embedding
# counterpart of operators/dedup.py::_PAIR_GUARD_CANDIDATES. Bracketed
# by round-11 measurements: the sf10 clone corpus meters 2.78e8 under
# 16×12 and COMPLETES in ~170 s on local[32] (EMB_DUP_DECOMP.json —
# clone-family collisions, join-back ~70 GB), while the 500k graded
# corpus meters 7.47e8 of pure background collisions whose vector
# join-back alone is a ~390 GB shuffle — the melt regime. The cap sits
# between the measured-completing and the refused points.
BAND_GUARD_CANDIDATES = 400_000_000

# The analytic sizer targets a TIGHTER budget than the guard refuses
# at: srp_banding_for_threshold picks the banding whose EXPECTED
# background mass stays under half of this, leaving the other half for
# true-dup collision mass the analytic form can't know. 2.5e8 is the
# value whose choices were ground-truth-measured in
# EMB_DEDUP_SCALE_GRADED.json (21 bands × 15 bits at (0.95, 500k):
# recall 0.9976; 36×11 at (0.8, 100k): recall 0.9905) — changing it
# silently invalidates that linkage, so it is pinned by
# tests/test_round11_ops.py.
SRP_SIZER_MASS_BUDGET = 250_000_000


def srp_collision_prob(cos_sim: float, bits_per_band: int, n_bands: int) -> float:
    """P(candidate) for a pair at the given cosine under banded
    sign-random-projection LSH: per-bit agreement p = 1 − θ/π
    (Goemans–Williamson), per-band match p^bits, OR over bands."""
    p_bit = 1.0 - np.arccos(max(-1.0, min(1.0, cos_sim))) / np.pi
    p_band = p_bit ** bits_per_band
    return 1.0 - (1.0 - p_band) ** n_bands


def srp_banding_for_threshold(
    threshold: float,
    n: int,
    recall_floor: float = 0.99,
    mass_cap: int = SRP_SIZER_MASS_BUDGET,
    max_bands: int = 64,
) -> dict:
    """Size (n_planes, n_bands) for ``lsh_near_dup_candidates`` from
    the cosine threshold and the MEASURED corpus cardinality — the
    near-dup counterpart of ``lsh_auto_params``, and the remediation
    the band-mass guard names when a fixed banding under-prunes.

    Solved analytically from the SRP collision curve: for each band
    width b, the band count meeting the recall floor at the threshold
    is L(b) = ⌈ln(1−floor)/ln(1−p(τ)^b)⌉, and the expected background
    (cos ≈ 0 ⇒ per-band 2⁻ᵇ) candidate mass is L·2⁻ᵇ·C(n,2). Wider
    bands prune harder but need more of them; the smallest b whose
    background mass fits under half the sizer budget wins (half: true
    near-dup collisions, which the analytic form can't know, get the
    other half before the run-time guard would complain). The
    registered emb_near_dup_lsh keeps its attested 16×12 shape at
    driver scale and hands off to this sizer past 250k vectors
    (similarity.EMB_LSH_AUTO_MAX); it also serves users running at a
    lower threshold (e.g. SemDeDup at τ=0.8). Per-cosine-bucket recall
    of the sizer's choices is ground-truth-measured in
    EMB_DEDUP_SCALE_GRADED.json (21×15 bits at (0.95, 500k): 0.9976;
    36×11 at (0.8, 100k): 0.9905), which is why the budget constant is
    pinned.
    """
    p_bit = 1.0 - np.arccos(max(-1.0, min(1.0, threshold))) / np.pi
    pairs = n * (n - 1) / 2.0
    best = None
    for bits in range(8, 25):
        p_band = p_bit ** bits
        if p_band >= 1.0:
            continue
        n_bands = int(np.ceil(np.log(1.0 - recall_floor) / np.log(1.0 - p_band)))
        if n_bands > max_bands:
            continue
        bg_mass = n_bands * (2.0 ** -bits) * pairs
        if bg_mass <= mass_cap / 2.0:
            best = {"n_planes": bits * n_bands, "n_bands": n_bands}
            break
    if best is None:
        raise ValueError(
            f"no SRP banding with ≤{max_bands} bands reaches recall "
            f"{recall_floor} at cos {threshold} within the {mass_cap:.0e} "
            "candidate budget at this cardinality — lower the floor, "
            "raise the cap, or pre-partition the corpus (per-source "
            "shards dedup independently)"
        )
    return best


def lsh_near_dup_candidates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    n_bands: int = 8,
    seed: int = DEFAULT_SEED,
    with_vectors: bool = True,
    mass_guard: bool = True,
) -> DataFrame:
    """Banded-signature candidate pairs for near-duplicate mining.

    The n-bit signature splits into ``n_bands`` bands; a pair becomes a
    candidate when any band matches exactly (the classic LSH AND-OR
    construction, here over sign bits ⇒ calibrated for cosine). The
    pair space shrinks from O(n²) to the within-bucket pairs of each
    band — the only shuffle is the band-value equi-join, which is how
    this survives a 100× scale-up where the cross join cannot.

    ``mass_guard`` meters the join's exact output volume (Σ C(bucket,2)
    over the persisted banded table — one linear aggregate) BEFORE the
    join runs and refuses past ``BAND_GUARD_CANDIDATES``, naming
    ``srp_banding_for_threshold`` as the remediation — the same
    measure-then-refuse contract as the text family's
    ``_guard_band_buckets`` (operators/dedup.py), added in round 11
    after the graded-corpus eval metered a 7.47e8-candidate join at
    500k vectors under the fixed 16×12 banding (a ~390 GB vector
    join-back).

    ``with_vectors=False`` skips the vector join-back and returns bare
    (id_a, id_b) — for recall evals and mass studies that only need
    the candidate id set.

    Returns distinct (id_a < id_b) candidate pairs; callers re-check
    with the exact cosine (see near_dup_pairs_lsh).
    """
    assert n_planes % n_bands == 0
    bits_per_band = n_planes // n_bands

    # Bands are n_bands INDEPENDENT bits_per_band-bit tables (seed+band)
    # — same AND-OR statistics as slicing one n_planes-bit signature,
    # but with no 64-bit signature-width ceiling, so wide high-
    # selectivity bands (e.g. 16×12 bits) are available.
    sig_udf = multitable_signature_udf(n_bands, bits_per_band, seed)
    banded = (
        embeddings.select(
            F.col(id_col), sig_udf(F.col(vec_col)).alias("_sigs")
        )
        .select(id_col, F.posexplode("_sigs"))
        .withColumnsRenamed({"pos": "band", "col": "val"})
    )

    if mass_guard:
        # Persist once: the guard aggregate and both join sides read
        # the same banded table, and signatures are the expensive part.
        banded = banded.persist()
        est = (
            banded.groupBy("band", "val")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
            .collect()[0]["cand"]
            or 0
        )
        if est > BAND_GUARD_CANDIDATES:
            banded.unpersist()
            raise ValueError(
                f"SRP band buckets hold {est:.2e} candidate pairs (cap "
                f"{BAND_GUARD_CANDIDATES:.2e}) — the {n_bands}×"
                f"{bits_per_band}-bit banding under-prunes at this "
                "cardinality; re-size with srp_banding_for_threshold"
                "(threshold, n) (wider bands, more of them), or dedup "
                "per-source shards independently"
            )

    # The band equi-join carries ONLY (id, band, val) — never the
    # vectors: shipping d-dim arrays through an exploded ×n_bands
    # shuffle is what breaks at scale. Vectors join back afterward,
    # keyed by id, sized by the (pruned) candidate count.
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if not with_vectors:
        return pairs
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    return (
        pairs.join(
            vecs.select(
                F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
            ),
            "id_b",
        )
        .select("id_a", "id_b", "vec_a", "vec_b")
    )


def near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    **kwargs,
) -> DataFrame:
    """LSH-pruned near-duplicate pairs with exact cosine verification."""
    cand = lsh_near_dup_candidates(embeddings, **kwargs)
    return (
        cand.withColumn("score", cosine("vec_a", "vec_b"))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


# ------------------------------------------------------------------- IVF


def ivf_build(
    embeddings: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
):
    """KMeans inverted-file index: returns (assigned_df, centroids).

    assigned_df carries a ``_cluster`` column — at cluster scale this
    is the table's partition key (`.write.partitionBy("_cluster")`),
    so a probe reads only the chosen inverted lists.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = embeddings.withColumn("_features", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_clusters, seed=seed & 0x7FFFFFFF, featuresCol="_features",
                predictionCol="_cluster")
    model = km.fit(with_vec)
    assigned = model.transform(with_vec).drop("_features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """Search the n_probe nearest inverted lists, exact re-rank."""
    q = np.array(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    sims = []
    for i, c in enumerate(centroids):
        cv = np.array(c, dtype=np.float64)
        nrm = np.linalg.norm(cv)
        sims.append((float(cv @ qn / nrm) if nrm else -1.0, i))
    probe = [i for _, i in sorted(sims, reverse=True)[:n_probe]]

    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("_cluster").isin(probe))
        .withColumn("_q", qcol)
        .withColumn("score", cosine(vec_col, "_q"))
        .drop("_q")
        .orderBy(F.desc("score"))
        .limit(k)
    )
