"""Round-8 operator property tests."""

from __future__ import annotations

import pandas as pd


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_tokenizer_fertility_counts_runs_not_chars(spark, tmp_path):
    """Fertility counts BPE-ish pre-tokens (letter runs, digit runs,
    single symbols), not characters: a language written in long words
    must come out cheaper per character than one written in short
    words, and the totals must equal hand-counted run arithmetic."""
    from the_hive_spark.operators.text_analysis import (
        doc_tokenizer_fertility,
    )

    sf = _write_docs(
        tmp_path,
        [
            # "aaaa bbbb" -> 2 letter runs = 2 tokens / 9 chars
            {"doc_id": 1, "text": "aaaa bbbb", "lang": "long", "source": "s"},
            # "a b c d!" -> 4 letter runs + 1 symbol = 5 tokens / 8 chars
            {"doc_id": 2, "text": "a b c d!", "lang": "short", "source": "s"},
            # digits collapse per run: "12 34x" -> 2 digit runs + 1 letter
            {"doc_id": 3, "text": "12 34x", "lang": "short", "source": "s"},
        ],
    )
    got = {
        r["lang"]: r for r in doc_tokenizer_fertility(spark, sf).collect()
    }
    assert got["long"]["n_docs"] == 1
    assert got["long"]["n_bpe_tokens_total"] == 2
    assert got["long"]["n_chars_total"] == 9
    assert got["long"]["tokens_per_mchar"] == round(1e6 * 2 / 9)
    assert got["short"]["n_docs"] == 2
    assert got["short"]["n_bpe_tokens_total"] == 5 + 3
    assert got["short"]["n_chars_total"] == 8 + 6
    # long words are cheaper per character
    assert got["long"]["tokens_per_mchar"] < got["short"]["tokens_per_mchar"]


def test_vocab_growth_half_prefix_is_by_doc_id(spark, tmp_path):
    """The half-corpus prefix is the first half of each source's docs
    in doc_id order — so vocabulary planted only in late doc_ids must
    show up in vocab_full but not vocab_half, and the marginal rate
    reflects exactly the second half's new terms."""
    from the_hive_spark.operators.text_analysis import (
        doc_vocab_growth_heaps,
    )

    sf = _write_docs(
        tmp_path,
        [
            # first half (doc_id 1-2): vocabulary {old1, old2}, 4 tokens
            {"doc_id": 1, "text": "old1 old2", "lang": "x", "source": "s"},
            {"doc_id": 2, "text": "old1 old2", "lang": "x", "source": "s"},
            # second half (doc_id 3-4): 2 new terms over 4 tokens
            {"doc_id": 3, "text": "old1 new1", "lang": "x", "source": "s"},
            {"doc_id": 4, "text": "old2 new2", "lang": "x", "source": "s"},
        ],
    )
    row = doc_vocab_growth_heaps(spark, sf).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_tokens_half"] == 4 and r["n_tokens_full"] == 8
    assert r["vocab_half"] == 2 and r["vocab_full"] == 4
    # 2 new terms / 4 second-half tokens = 500000 ppm
    assert r["marginal_vocab_per_token_ppm"] == 500_000


def test_inter_source_matrix_directions_and_denominators(spark, tmp_path):
    """Source pairs are canonicalized (source_a <= source_b) so the
    matrix is triangular regardless of doc_id order, and the rate
    denominator is n*(n-1)/2 on the diagonal but n_a*n_b off it."""
    from the_hive_spark.operators.dedup import doc_dup_inter_source_matrix

    base = "the quick brown fox jumps over the lazy dog near the river "
    sf = _write_docs(
        tmp_path,
        [
            # near-dup family spanning sources A (2 docs) and B (1 doc)
            {"doc_id": 1, "text": base + "one", "lang": "x", "source": "A"},
            {"doc_id": 2, "text": base + "two", "lang": "x", "source": "A"},
            {"doc_id": 3, "text": base + "ten", "lang": "x", "source": "B"},
            # unrelated B doc: no pairs with anything
            {"doc_id": 4, "text": "completely different content entirely z",
             "lang": "x", "source": "B"},
        ],
    )
    got = {
        (r["source_a"], r["source_b"]): r
        for r in doc_dup_inter_source_matrix(spark, sf).collect()
    }
    # canonical orientation only
    assert all(a <= b for a, b in got)
    # diagonal A: 1 pair of C(2,2)=1 possible -> 1e6 ppm
    assert got[("A", "A")]["n_pairs"] == 1
    assert got[("A", "A")]["pair_rate_ppm"] == 1_000_000
    # off-diagonal A-B: 2 pairs (docs 1,2 x doc 3) of 2*2=4 possible
    assert got[("A", "B")]["n_pairs"] == 2
    assert got[("A", "B")]["pair_rate_ppm"] == 500_000
    # doc 4 pairs with nothing: no B-B cell
    assert ("B", "B") not in got


def test_ngram_pair_guard_trips_on_candidate_dense_corpus(
    spark, tmp_path, monkeypatch
):
    """Both pair-enumeration regimes must fail fast (with a pointer to
    the banded path) when the measured quadratic term exceeds the
    guard, instead of materializing a quadratic candidate shuffle —
    and the matstore must not cache the failure."""
    import pytest

    from the_hive_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and "
    sf = _write_docs(
        tmp_path,
        [
            {"doc_id": i, "text": base + f"word {i % 3}", "lang": "x",
             "source": "s"}
            for i in range(30)
        ],
    )
    # tiny caps: this 30-doc word-soup corpus is "candidate-dense"
    monkeypatch.setattr(dedup, "_DENSE_GUARD_WORDOPS", 10)
    monkeypatch.setattr(dedup, "_PAIR_GUARD_CANDIDATES", 10)
    with pytest.raises(ValueError, match="banded path"):
        dedup._ngram_jaccard_pairs_build(spark, sf)
    # sparse regime (vocab probe forced to overflow) trips its own guard
    monkeypatch.setattr(dedup, "_BITSET_MAX_VOCAB", 1)
    with pytest.raises(ValueError, match="banded path"):
        dedup._ngram_jaccard_pairs_build(spark, sf, vocab_key="guardtest")
    # restore caps: the same corpus builds fine below the guard
    monkeypatch.setattr(dedup, "_DENSE_GUARD_WORDOPS", 200_000_000_000)
    monkeypatch.setattr(dedup, "_PAIR_GUARD_CANDIDATES", 200_000_000)
    got = dedup._ngram_jaccard_pairs_build(
        spark, sf, vocab_key="guardtest2"
    ).count()
    assert got > 0


def test_band_bucket_guard_trips_on_colliding_signatures(
    spark, tmp_path, monkeypatch
):
    """The band self-join guard fires when bucket sizes make the join
    quadratic (degenerate corpora where signatures collide en masse)
    and stays silent on the same corpus under the normal cap. The
    returned DataFrame's plan is unchanged by the guard — it is a
    separate pre-join measurement job."""
    import pytest

    from the_hive_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and "
    sf = _write_docs(
        tmp_path,
        [
            {"doc_id": i, "text": base + f"w{i % 2}", "lang": "x",
             "source": "s"}
            for i in range(20)
        ],
    )
    sig = dedup.minhash_signatures(spark, sf)
    monkeypatch.setattr(dedup, "_PAIR_GUARD_CANDIDATES", 5)
    with pytest.raises(ValueError, match="candidate-dense"):
        dedup._lsh_band_pairs(sig).count()
    monkeypatch.setattr(dedup, "_PAIR_GUARD_CANDIDATES", 200_000_000)
    assert dedup._lsh_band_pairs(sig).count() > 0
