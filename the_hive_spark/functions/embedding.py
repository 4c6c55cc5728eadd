"""Embedding providers (U1, SURVEY.md §2.9).

The reference's factory (internal/embeddings/embeddings.go:11-57)
selects mock / OpenAI / Ollama by env; only the mock is deterministic
and is what all correctness tests bind to. Formula
(internal/embeddings/mock.go:28-58):

    seed  = FNV-32a(text)                  # 32-bit unsigned
    v[i]  = sin(seed * (i+1) * 0.1)        # i in [0, dim)
    v     = v / ||v||2                     # L2-normalize

Implemented as an Arrow-batched pandas UDF: the per-text seed is a
cheap byte loop, the dim-384 sin/normalize is vectorized numpy over
the whole batch — no per-row Python in the vector math.

Real providers would be drop-in pandas UDFs with the same signature
(text batch in → float32[dim] batch out); they are network-bound and
deliberately not implemented here (no external services in scope).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

from the_hive_spark.schemas import EMBEDDING_DIM

FNV_OFFSET = 2166136261
FNV_PRIME = 16777619
_MASK32 = 0xFFFFFFFF


def fnv32a(text: str) -> int:
    """FNV-1a 32-bit hash of the UTF-8 bytes (matches Go's hash/fnv)."""
    h = FNV_OFFSET
    for b in text.encode("utf-8"):
        h ^= b
        h = (h * FNV_PRIME) & _MASK32
    return h


def mock_embedding_np(text: str, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Single-text reference implementation (the test oracle)."""
    seed = fnv32a(text)
    i = np.arange(1, dim + 1, dtype=np.float64)
    v = np.sin(seed * i * 0.1)
    n = np.linalg.norm(v)
    if n > 0:
        v = v / n
    return v.astype(np.float32)


def make_mock_embedder(dim: int = EMBEDDING_DIM):
    """Vectorized pandas UDF: text column → array<float> embedding."""

    @pandas_udf(ArrayType(FloatType()))
    def mock_embed(texts: pd.Series) -> pd.Series:
        seeds = np.fromiter(
            (fnv32a(t) if t is not None else 0 for t in texts),
            dtype=np.float64,
            count=len(texts),
        )
        i = np.arange(1, dim + 1, dtype=np.float64)
        # outer product: every row's full vector in one vectorized op
        m = np.sin(seeds[:, None] * i[None, :] * 0.1)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        np.divide(m, norms, out=m, where=norms > 0)
        m32 = m.astype(np.float32)
        return pd.Series(list(m32))

    return mock_embed


_TOKEN_RE = None  # lazily-compiled


def _tokens(text: str) -> list[str]:
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[a-z0-9]+")
    return _TOKEN_RE.findall(text.lower())


def bow_embedding_np(text: str, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Deterministic bag-of-words hash embedding (single-text oracle).

    Each token contributes sin(fnv32a(token) * i * 0.1); the sum is
    L2-normalized. Unlike the reference's whole-text mock (F5), shared
    tokens ⇒ correlated vectors, so top-k search is semantically
    meaningful while staying fully deterministic — a documented
    deviation (the reference's golden search relies on a real provider;
    its mock is only reproducible, not meaningful).
    """
    i = np.arange(1, dim + 1, dtype=np.float64)
    v = np.zeros(dim, dtype=np.float64)
    for t in _tokens(text or ""):
        v += np.sin(fnv32a(t) * i * 0.1)
    n = np.linalg.norm(v)
    if n > 0:
        v = v / n
    return v.astype(np.float32)


def make_bow_embedder(dim: int = EMBEDDING_DIM):
    """Vectorized pandas UDF for the bag-of-words hash embedding.

    Token seed-vectors are memoized per batch (Zipf reuse) and the
    sin() matrix math is numpy over the whole batch vocabulary."""

    @pandas_udf(ArrayType(FloatType()))
    def bow_embed(texts: pd.Series) -> pd.Series:
        i = np.arange(1, dim + 1, dtype=np.float64)
        cache: dict[str, np.ndarray] = {}
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float64)
            for tok in _tokens(t or ""):
                tv = cache.get(tok)
                if tv is None:
                    tv = np.sin(fnv32a(tok) * i * 0.1)
                    cache[tok] = tv
                v += tv
            n = np.linalg.norm(v)
            if n > 0:
                v = v / n
            out.append(v.astype(np.float32))
        return pd.Series(out)

    return bow_embed


PROVIDERS = {"mock": make_mock_embedder, "bow": make_bow_embedder}


def make_embedder(provider: str = "bow", dim: int = EMBEDDING_DIM):
    """U1 provider factory (embeddings.go:11-57 analog): deterministic
    providers only; network providers would slot in here behind config."""
    return PROVIDERS[provider](dim)


def zero_vector(dim: int = 1536) -> Column:
    """F6 no-API-key fallback: 1536-dim zeros (ai/openai.go:17-23)."""
    import pyspark.sql.functions as F

    return F.array_repeat(F.lit(0.0).cast("float"), dim)
