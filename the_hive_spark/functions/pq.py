"""Product quantization (PQ) for embedding columns.

The third ANN family next to SRP-LSH and IVF (functions/lsh.py), and
the one that makes billion-vector search feasible at all: PQ (Jégou,
Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) splits each d-dim vector into M subvectors and replaces
every subvector with the id of its nearest per-subspace centroid — a
d-float vector becomes M small integers (here M bytes), a 32×-512×
compression that keeps the whole index in executor memory. Queries
score compressed codes WITHOUT decompressing via asymmetric distance
computation (ADC): one M×K lookup table of query-subvector ·
centroid dot products per query, then each candidate costs M table
lookups instead of d multiplications.

At 100 TB the composition is IVF-PQ: coarse IVF clusters prune the
corpus to a few inverted lists (partition pruning — ivf_build's
``_cluster`` is the partition key), then ADC over the lists' PQ codes
produces a shortlist that full-precision vectors re-rank. Every piece
here is that architecture in miniature, seed-deterministic end to end
(KMeans with pinned seeds, numpy argmin with ties broken by lowest
index).

Codebooks train the way production PQ systems train them (FAISS,
ScaNN): on a BOUNDED sample pulled to one machine — codebook quality
saturates at ~100k-1M training points regardless of corpus size, so
the train step is O(sample), never O(corpus), and only the encode /
score passes (Arrow-batched pandas UDFs with the tiny codebooks
broadcast) touch the full distributed data.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_SEED = 0x5EED
PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_TRAIN_SAMPLE = 65_536  # training points; FAISS-style bounded sample
PQ_TRAIN_ITERS = 20


def _lloyd(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd k-means: seeded init from distinct rows,
    first-index argmin ties, empty clusters keep their centroid."""
    rng = np.random.default_rng(seed)
    uniq = np.unique(x, axis=0)
    if len(uniq) <= k:
        pad = np.zeros((k - len(uniq), x.shape[1]))
        return np.concatenate([uniq, pad])
    cent = uniq[rng.choice(len(uniq), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(axis=0)
    return cent


def pq_train(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = DEFAULT_SEED,
    sample: int = PQ_TRAIN_SAMPLE,
) -> np.ndarray:
    """Train per-subspace codebooks; returns (m, k, d//m) float64.

    The training set is a deterministic bounded sample (lowest ids —
    rerun-stable, one LIMIT-capped collect like the dedup vocab
    probe); all M codebooks train locally on it with seeded Lloyd
    iterations. The artifacts are O(m·k·d/m) driver-side state like
    IVF's centroid list, shipped by broadcast to the encode/score
    passes — which are the only stages that scan the corpus.
    """
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    x = np.array([list(map(float, r[vec_col])) for r in rows])
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    books = [
        _lloyd(x[:, j * sub : (j + 1) * sub], k, PQ_TRAIN_ITERS, seed + j)
        for j in range(m)
    ]
    return np.stack(books)  # (m, k, sub)


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — each vector's per-subspace nearest
    centroid ids, one Arrow pass, codebooks broadcast."""
    import pandas as pd

    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def encode(batches):
        cb = bc.value  # (m, k, sub)
        m, _, sub = cb.shape
        for pdf in batches:
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            codes = np.empty((len(mat), m), dtype=np.int64)
            for j in range(m):
                x = mat[:, j * sub : (j + 1) * sub]  # (n, sub)
                # ||x - c||² = ||x||² - 2x·c + ||c||²; argmin over k
                # (numpy argmin: first index on ties — deterministic)
                d2 = (
                    -2.0 * x @ cb[j].T
                    + (cb[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, codes array<long>"
    )


def pq_decode_matrix(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) codes → (n, d) reconstructed vectors (numpy, test/eval)."""
    m, _, sub = codebooks.shape
    return np.concatenate(
        [codebooks[j][codes[:, j]] for j in range(m)], axis=1
    )


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: score every code row
    with M lookups into the per-query table, TakeOrdered for the top-k.
    The corpus side never touches floats wider than the M-byte codes —
    THE property that lets the index live in memory at 100 TB."""
    import pandas as pd

    m, kk, sub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    # LUT[j][c] = q_j · centroid_jc  (inner-product ADC; cosine rank
    # for unit-normalized corpora, dot-product rank otherwise)
    lut = np.stack(
        [codebooks[j] @ q[j * sub : (j + 1) * sub] for j in range(m)]
    )  # (m, k)
    spark = codes_df.sparkSession
    bc = spark.sparkContext.broadcast(lut)

    def score(batches):
        t = bc.value
        for pdf in batches:
            codes = np.array([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            s = np.zeros(len(codes))
            for j in range(t.shape[0]):
                s += t[j][codes[:, j]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "adc_score_micro": np.floor(s * 1_000_000 + 0.5).astype(
                        np.int64
                    ),
                }
            )

    return (
        codes_df.mapInPandas(score, f"{id_col} long, adc_score_micro long")
        .orderBy(F.desc("adc_score_micro"), F.asc(id_col))
        .limit(k)
    )


def pq_adc_rerank_topk(
    codes_df: DataFrame,
    embeddings: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production serving shape: ADC over compressed codes prunes
    the corpus to a `shortlist`, full-precision vectors re-rank only
    those — the join touches `shortlist` rows, not the corpus, so the
    float vectors can live in slow/cold storage at 100 TB while the
    M-byte codes stay hot.

    ``shortlist`` defaults to 1000·k: the round-8 1M-distinct-vector
    evaluation (ANN_SCALE_EVAL.json) measured recall@10 collapsing
    1.0 → 0.07 with a 10·k shortlist — ADC's quantized ranking cannot
    separate the true top-10 from their ~thousands of near-ties at
    real cardinality, and raising n_probe does not help (the true
    neighbors are already in the probed lists). At 1000·k the measured
    recall is 1.0 (min 1.0 over 20 queries) and per-query latency is
    LOWER than the collapsed config — the re-rank join is trivial next
    to the ADC pass — so a deep shortlist is pure win."""
    from the_hive_spark.operators.similarity import cosine_topk

    if shortlist is None:
        shortlist = 1000 * k
    short = pq_adc_topk(
        codes_df, codebooks, query_vec, k=shortlist, id_col=id_col
    ).select(id_col)
    pruned = embeddings.join(F.broadcast(short), id_col, "left_semi")
    return cosine_topk(pruned, query_vec, k=k)
