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


def lsh_near_dup_candidates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    n_bands: int = 8,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Banded-signature candidate pairs for near-duplicate mining.

    The n-bit signature splits into ``n_bands`` bands; a pair becomes a
    candidate when any band matches exactly (the classic LSH AND-OR
    construction, here over sign bits ⇒ calibrated for cosine). The
    pair space shrinks from O(n²) to the within-bucket pairs of each
    band — the only shuffle is the band-value equi-join, which is how
    this survives a 100× scale-up where the cross join cannot.

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
