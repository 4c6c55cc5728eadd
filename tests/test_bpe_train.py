"""doc_bpe_train vs a pure-Python reference BPE trainer (rows-only
registry query: an iterative argmax loop has no SQL oracle, so the
merge list is pinned against the textbook algorithm here)."""

from __future__ import annotations

import os
from collections import Counter

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich-style BPE with (count DESC, left ASC, right ASC) ties
    and greedy left-to-right merge application."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pair_counts: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, left + right, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark):
    if not os.path.isdir(SF):
        pytest.skip(f"no testdata at {SF}")
    from the_hive_spark.operators.corpus_quality import (
        BPE_TRAIN_MERGES,
        doc_bpe_train,
    )

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in doc_bpe_train(spark, SF).orderBy("rank").collect()
    ]

    con = duckdb.connect()
    rows = con.execute(
        "SELECT w, COUNT(*) FROM ("
        "  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w"
        f"  FROM read_parquet('{SF}/documents.parquet')"
        ") WHERE length(w) > 0 GROUP BY w"
    ).fetchall()
    expected = _reference_bpe(dict(rows), BPE_TRAIN_MERGES)

    assert got == expected, f"\ngot:      {got}\nexpected: {expected}"
    assert len(got) == BPE_TRAIN_MERGES
    # counts must be non-increasing across ranks (greedy argmax)
    counts = [g[4] for g in got]
    assert counts == sorted(counts, reverse=True)


def test_bpe_encode_matches_reference(spark):
    """doc_bpe_encode fertility vs encoding every doc with the pure-
    Python reference merge application (same merge list, same greedy
    left-to-right replay in rank order)."""
    if not os.path.isdir(SF):
        pytest.skip(f"no testdata at {SF}")
    from the_hive_spark.operators.corpus_quality import (
        doc_bpe_encode,
        doc_bpe_train,
    )

    merges = [
        (r["left"], r["right"])
        for r in doc_bpe_train(spark, SF).orderBy("rank").collect()
    ]

    def ref_encode(word: str) -> int:
        syms = list(word)
        for left, right in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return len(syms)

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
        " WHERE length(text) > 0"
    ).fetchall()
    expected = {}
    for doc_id, text in docs:
        words = [w for w in text.lower().split() if w]
        n_tok = sum(ref_encode(w) for w in words)
        tpw = (
            None if not words
            else int(1000.0 * n_tok / len(words) + 0.5)
        )
        expected[doc_id] = (len(words), n_tok, tpw)

    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["tokens_per_word_milli"])
        for r in doc_bpe_encode(spark, SF).collect()
    }
    assert got == expected
