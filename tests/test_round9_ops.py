"""Round-9 operator property tests: prune-then-dedup funnel,
exact-dup family histogram, candidate-mass meter — hand-counted on
corpora built to exercise each column."""

from __future__ import annotations

import pandas as pd


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len()
    if "lang" not in df:
        df["lang"] = "en"
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


GOOD = "the cat sat on the mat and it is that for sure"  # stopword-rich
SOUP = "zx qv wk jn px lm rt uv wx yz"  # zero stopwords → pruned


def test_prune_then_dedup_funnel_hand_counted(spark, tmp_path):
    """Gate prunes word-soup; survivors dedup by exact text: 3 copies
    of GOOD in source a → kept 3, unique 1, dup 2; the soup doc is
    pruned, not deduped."""
    from the_hive_spark.operators.dedup import doc_prune_then_dedup

    sf = _write_docs(
        tmp_path,
        [
            {"doc_id": 1, "text": GOOD, "source": "a"},
            {"doc_id": 2, "text": GOOD, "source": "a"},
            {"doc_id": 3, "text": GOOD, "source": "a"},
            {"doc_id": 4, "text": SOUP, "source": "a"},
            {"doc_id": 5, "text": GOOD + " extra", "source": "b"},
            {"doc_id": 6, "text": SOUP, "source": "b"},
            {"doc_id": 7, "text": SOUP + " more", "source": "b"},
        ],
    )
    got = {r["source"]: r for r in doc_prune_then_dedup(spark, sf).collect()}
    a = got["a"]
    assert (a["n_docs"], a["n_pruned"], a["n_kept"]) == (4, 1, 3)
    assert (a["n_unique_texts"], a["n_dup_docs"]) == (1, 2)
    b = got["b"]
    assert (b["n_docs"], b["n_pruned"], b["n_kept"]) == (3, 2, 1)
    assert (b["n_unique_texts"], b["n_dup_docs"]) == (1, 0)


def test_prune_gate_short_docs(spark, tmp_path):
    """The token floor prunes stopword-rich but tiny docs too."""
    from the_hive_spark.operators.dedup import doc_prune_then_dedup

    sf = _write_docs(
        tmp_path,
        [
            {"doc_id": 1, "text": "the it", "source": "a"},  # 2 tokens
            {"doc_id": 2, "text": GOOD, "source": "a"},
        ],
    )
    row = doc_prune_then_dedup(spark, sf).collect()[0]
    assert (row["n_pruned"], row["n_kept"]) == (1, 1)


def test_dup_family_stats_histogram(spark, tmp_path):
    """2 singletons + one family of 3 → rows (1,2,2,0) and (3,1,3,2)."""
    from the_hive_spark.operators.dedup import doc_dup_family_stats

    sf = _write_docs(
        tmp_path,
        [
            {"doc_id": 1, "text": "alpha", "source": "a"},
            {"doc_id": 2, "text": "beta", "source": "a"},
            {"doc_id": 3, "text": "gamma gamma", "source": "a"},
            {"doc_id": 4, "text": "gamma gamma", "source": "b"},
            {"doc_id": 5, "text": "gamma gamma", "source": "b"},
        ],
    )
    got = {
        r["family_size"]: r for r in doc_dup_family_stats(spark, sf).collect()
    }
    assert got[1]["n_families"] == 2
    assert got[1]["n_docs"] == 2 and got[1]["n_redundant_docs"] == 0
    assert got[3]["n_families"] == 1
    assert got[3]["n_docs"] == 3 and got[3]["n_redundant_docs"] == 2


def test_candidate_mass_is_sum_of_binomials(spark, tmp_path):
    """df counted within source: 'abcdef' yields shingles {abcde,
    bcdef}; two copies in source a → each shingle df=2 → mass
    2·C(2,2)=2; source b holds one doc → mass 0 (no row has df>1)."""
    from the_hive_spark.operators.dedup import doc_dedup_candidate_mass

    sf = _write_docs(
        tmp_path,
        [
            {"doc_id": 1, "text": "abcdef", "source": "a"},
            {"doc_id": 2, "text": "abcdef", "source": "a"},
            {"doc_id": 3, "text": "abcdef", "source": "b"},
        ],
    )
    got = {
        r["source"]: r
        for r in doc_dedup_candidate_mass(spark, sf).collect()
    }
    a = got["a"]
    assert a["n_docs"] == 2 and a["n_postings"] == 4
    assert a["candidate_mass"] == 2 and a["mass_per_doc"] == 1
    b = got["b"]
    assert b["n_docs"] == 1 and b["candidate_mass"] == 0


def test_candidate_mass_meters_density_divergence(spark, tmp_path):
    """The meter's purpose: a clone-heavy source must report a much
    larger mass_per_doc than a diverse source of the same size."""
    from the_hive_spark.operators.dedup import doc_dedup_candidate_mass

    rows = []
    for i in range(20):  # dense: same text 20x
        rows.append({"doc_id": i, "text": "same same same", "source": "dense"})
    for i in range(20):  # diverse: per-doc disjoint 5-letter vocab
        word = "".join(chr(97 + (i * 5 + j) % 26) for j in range(5))
        rows.append(
            {"doc_id": 100 + i, "text": f"{word} {word} {word}", "source": "div"}
        )
    sf = _write_docs(tmp_path, rows)
    got = {
        r["source"]: r
        for r in doc_dedup_candidate_mass(spark, sf).collect()
    }
    assert got["dense"]["mass_per_doc"] > 5 * max(
        got["div"]["mass_per_doc"], 1
    )
