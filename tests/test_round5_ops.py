"""Semantic edge tests for the round-5 operators (exactness vs the
DuckDB oracles is covered by tests/test_oracle_parity.py's sweep;
these pin the invariants the oracle comparison can't see)."""

from __future__ import annotations

import pyspark.sql.functions as F

from the_hive_spark.registry import QUERIES, load_all
from the_hive_spark.tables import table

load_all()

SF = "/root/testdata/sf0.001"


def test_ngram_novelty_counts_each_gram_once(spark):
    """Every distinct corpus gram has exactly ONE first occurrence, so
    the per-source novel counts must sum to the corpus's distinct-gram
    count — double-counting or missing a first would break this."""
    from the_hive_spark.operators.corpus_quality import NOVELTY_N, _WORDS

    rows = QUERIES["doc_ngram_novelty"](spark, SF).collect()
    total_novel = sum(r["n_novel"] for r in rows)
    base = (
        table(spark, SF, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", F.expr(_WORDS).alias("words"))
        .filter(F.size("words") >= NOVELTY_N)
    )
    n_distinct = (
        base.select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(words) - {NOVELTY_N - 1}),"
                    f" i -> concat_ws(' ', slice(words, i, {NOVELTY_N})))"
                )
            ).alias("gram")
        )
        .distinct()
        .count()
    )
    assert total_novel == n_distinct
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert 0 <= r["novelty_ppm"] <= 1_000_000


def test_split_leakage_invariants(spark):
    leak = {
        r["doc_id"]: r
        for r in QUERIES["doc_split_leakage"](spark, SF).collect()
    }
    assert leak, "no val/test docs at this sf?"
    for r in leak.values():
        assert r["split"] in ("val", "test")
        assert 0 <= r["n_in_train"] <= r["n_grams"]
        assert r["leaked"] == (r["coverage_ppm"] >= 500_000)


def test_split_leakage_planted_cross_split_dup(spark, tmp_path):
    """Planted-defect check on a synthetic corpus (the driver fixture
    has no exact dups): a train doc and an eval doc with IDENTICAL
    text must show the eval copy at coverage 1.0 / leaked, while an
    eval doc with unique words shows coverage 0."""
    import hashlib

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    train_ids = [i for i in range(200) if bucket(i) < 80]
    eval_ids = [i for i in range(200) if bucket(i) >= 80]
    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (train_ids[0], dup_text, "en", "srcA", len(dup_text)),
        (eval_ids[0], dup_text, "en", "srcB", len(dup_text)),
        (
            eval_ids[1],
            "iota kappa lambda mu nu xi omicron pi",
            "en",
            "srcB",
            38,
        ),
        (
            train_ids[1],
            "rho sigma tau upsilon phi chi psi omega",
            "en",
            "srcA",
            39,
        ),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in QUERIES["doc_split_leakage"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {eval_ids[0], eval_ids[1]}
    assert got[eval_ids[0]]["coverage_ppm"] == 1_000_000
    assert got[eval_ids[0]]["leaked"]
    assert got[eval_ids[1]]["coverage_ppm"] == 0
    assert not got[eval_ids[1]]["leaked"]


def test_dedup_canonical_census_consistent(spark):
    rows = QUERIES["doc_dedup_canonical"](spark, SF).collect()
    docs = table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    n_groups = docs.select(F.md5("text")).distinct().count()
    assert sum(r["n_kept"] for r in rows) == n_groups
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert (r["n_dropped"] == 0) == (r["chars_dropped"] == 0)


def test_quality_prune_sweep_monotone(spark):
    rows = sorted(
        QUERIES["doc_quality_prune_sweep"](spark, SF).collect(),
        key=lambda r: r["threshold_ppm"],
    )
    assert [r["threshold_ppm"] for r in rows] == [
        i * 100_000 for i in range(10)
    ]
    total = table(spark, SF, "documents").filter(F.length("text") > 0).count()
    assert rows[0]["n_docs_kept"] == total  # threshold 0 keeps all
    assert rows[0]["docs_share_ppm"] == 1_000_000
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs_kept"] >= b["n_docs_kept"]
        assert a["n_tokens_kept"] >= b["n_tokens_kept"]


def test_jaccard_neighbors_bounds_and_order(spark):
    rows = QUERIES["graph_jaccard_neighbors"](spark, SF).collect()
    assert 0 < len(rows) <= 30
    ppms = [r["jaccard_ppm"] for r in rows]
    assert ppms == sorted(ppms, reverse=True)
    for r in rows:
        assert r["u"] < r["v"]  # canonical orientation
        assert 0 <= r["n_common"] < r["n_union"]
        # the edge itself guarantees deg ≥ 1 on both sides
        assert 0 <= r["jaccard_ppm"] < 1_000_000


def test_winsorized_means_bounded_by_clamp(spark):
    """Winsorized mean must lie within the clamp bounds; trimmed mean
    within the trim band; both differ from the plain mean only toward
    the center (no new extremes)."""
    rows = QUERIES["events_value_winsorized"](spark, SF).collect()
    assert len(rows) == 5
    vmin, vmax = (
        table(spark, SF, "events")
        .agg(
            F.floor(F.min("value") * 1000000 + F.lit(0.5)),
            F.floor(F.max("value") * 1000000 + F.lit(0.5)),
        )
        .first()
    )
    for r in rows:
        assert r["n_events"] > 0
        for c in ("mean_micros", "winsorized_mean_micros",
                  "trimmed_mean_micros"):
            assert vmin <= r[c] <= vmax, (r["event_type"], c, r[c])
