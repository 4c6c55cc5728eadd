"""Edge-case tests for the round-4 operators on synthetic tables:
degenerate inputs (no duplicates, single user/source, empty strata)
that the oracle-parity sweep's organic testdata cannot guarantee to
exercise."""

from __future__ import annotations

import datetime

import pytest


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    """A minimal sf_dir with crafted documents/events/customer."""
    root = tmp_path_factory.mktemp("tiny_sf")
    docs = spark.createDataFrame(
        [
            # 0/1 share an 8-word run (two 4-gram runs is not enough
            # for a span at MIN_RUN=3; give them 6 shared grams)
            (0, "alpha beta gamma delta epsilon zeta eta theta iota xx",
             "en", "srcA", 50),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota yy",
             "en", "srcA", 50),
            # 2 shares nothing
            (2, "one two three four five six seven eight nine ten",
             "en", "srcB", 40),
            # 3: too short for any gram
            (3, "just two", "en", "srcB", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(root / "documents.parquet"))
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    events = spark.createDataFrame(
        [
            # one user, one burst of 2 events 10s apart → ONE session
            (1, t0, 7, "view", 1.0, "{}"),
            (2, t0 + datetime.timedelta(seconds=10), 7, "view", 1.0, "{}"),
            # second user: single event, zero-duration session, same day
            (3, t0 + datetime.timedelta(seconds=5), 8, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    events.write.parquet(str(root / "events.parquet"))
    cust = spark.createDataFrame(
        [(i, f"Name {i}", i % 2, 10.0, "SEG") for i in range(6)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    )
    cust.write.parquet(str(root / "customer.parquet"))
    return str(root)


def test_dup_spans_finds_the_planted_run_only(spark, tiny_sf):
    from the_hive_spark.operators.corpus_quality import doc_dup_spans

    rows = doc_dup_spans(spark, tiny_sf).collect()
    by_doc = {(r["doc_id"], r["span_start"]): r for r in rows}
    # docs 0 and 1 share words 1..9 → gram positions 1..6 (6 grams ≥ 3)
    assert (0, 1) in by_doc and (1, 1) in by_doc
    assert by_doc[(0, 1)]["n_grams"] == 6
    assert by_doc[(0, 1)]["span_words"] == 9
    # doc 2 (unique) and doc 3 (too short) produce no spans
    assert {r["doc_id"] for r in rows} == {0, 1}


def test_dup_span_coverage_union(spark, tiny_sf):
    from the_hive_spark.operators.corpus_quality import doc_dup_span_coverage

    rows = {r["doc_id"]: r for r in doc_dup_span_coverage(spark, tiny_sf).collect()}
    assert rows[0]["words_covered"] == 9
    assert rows[0]["n_words"] == 10
    assert rows[0]["coverage_ppm"] == 900000
    assert 2 not in rows and 3 not in rows


def test_source_overlap_excludes_self_and_disjoint(spark, tiny_sf):
    from the_hive_spark.operators.corpus_quality import doc_source_overlap

    rows = doc_source_overlap(spark, tiny_sf).collect()
    # srcA and srcB share no gram → no row at all (inner semantics)
    assert rows == []


def test_peak_concurrency_overlap_and_zero_duration(spark, tiny_sf):
    from the_hive_spark.operators.warehouse import events_peak_concurrency

    rows = events_peak_concurrency(spark, tiny_sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["day"] == "2024-03-01"
    # user 8's zero-duration session overlaps user 7's open session
    assert r["peak_concurrent"] == 2
    assert r["sessions_started"] == 2


def test_dau_wau_mau_single_day(spark, tiny_sf):
    from the_hive_spark.operators.warehouse import events_dau_wau_mau

    rows = {r["day"]: r for r in events_dau_wau_mau(spark, tiny_sf).collect()}
    r = rows["2024-03-01"]
    assert (r["dau"], r["wau"], r["mau"]) == (2, 2, 2)
    assert r["stickiness_ppm"] == 1000000


def test_kanonymity_flags_small_classes(spark, tiny_sf):
    from the_hive_spark.operators.analytics import q_kanonymity_audit

    r = q_kanonymity_audit(spark, tiny_sf).collect()[0]
    # 6 rows over 2 nation classes (3 each) < k=5 → everything at risk
    assert r["n_classes"] == 2
    assert r["min_class_size"] == 3
    assert r["n_classes_at_risk"] == 2
    assert r["n_rows_at_risk"] == 6
    assert r["is_k_anonymous"] is False


def test_fs_scores_identical_attrs_get_max_weight(spark, tiny_sf):
    from the_hive_spark.operators.entity_resolution import (
        cust_linkage_fs_scores,
    )

    rows = cust_linkage_fs_scores(spark, tiny_sf).collect()
    # "Name 0".."Name 5" differ in one char at equal length → all pairs
    # are candidates; same-parity keys share nationkey (agree) and all
    # share the segment
    assert rows
    for r in rows:
        same_nation = (r["custkey_a"] % 2) == (r["custkey_b"] % 2)
        assert r["agree_nation"] == same_nation
        assert r["agree_segment"] is True
    agree_w = {r["weight_ppm"] for r in rows if r["agree_nation"]}
    disagree_w = {r["weight_ppm"] for r in rows if not r["agree_nation"]}
    assert len(agree_w) == 1 and len(disagree_w) == 1
    assert max(agree_w) > max(disagree_w)


def test_temperature_mix_upsamples_small_sources(spark, tiny_sf):
    from the_hive_spark.operators.text_analysis import doc_temperature_mix

    rows = {r["source"]: r for r in doc_temperature_mix(spark, tiny_sf).collect()}
    assert set(rows) == {"srcA", "srcB"}
    small = min(rows.values(), key=lambda r: r["n_tokens"])
    large = max(rows.values(), key=lambda r: r["n_tokens"])
    # temperature flattens: small source's share rises, large falls
    assert small["temp_share_ppm"] > small["share_ppm"]
    assert large["temp_share_ppm"] < large["share_ppm"]
    assert small["boost_ppm"] > 1000000 > large["boost_ppm"]


def test_struct_distinct_counts_null_bearing_keys(spark):
    """The constraint audit's dup-key form must use struct-distinct:
    multi-arg count_distinct SKIPS rows with any NULL component, while
    DuckDB's COUNT(DISTINCT (a, b)) counts NULL-bearing ROW values —
    and null keys are exactly what the audit flags."""
    import pyspark.sql.functions as F
    import duckdb

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (None, 2), (None, 2), (3, None)],
        "a int, b int",
    )
    got = df.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.struct("a", "b")))
        .alias("dups")
    ).collect()[0]["dups"]
    want = duckdb.connect().execute(
        "SELECT COUNT(*) - COUNT(DISTINCT (a, b)) FROM (VALUES "
        "(1,1),(1,1),(NULL,2),(NULL,2),(3,NULL)) t(a,b)"
    ).fetchone()[0]
    assert got == want == 2
    # the buggy multi-arg form drops ALL 3 null-bearing rows from the
    # distinct (only (1,1) survives) and would report 5 - 1 = 4
    buggy = df.agg(
        (F.count(F.lit(1)) - F.count_distinct("a", "b")).alias("d")
    ).collect()[0]["d"]
    assert buggy == 4


def test_duplicate_payment_audit_catches_planted_pair(spark, tmp_path):
    """The testdata is clean (audit returns empty, both engines agree)
    so the detection logic is proven here on planted duplicates."""
    import datetime

    from the_hive_spark.operators.analytics import q_duplicate_payment_audit

    d = datetime.datetime(2024, 1, 10)
    rows = [
        # same customer, same cents, 3 days apart → flagged
        (1, 100, "O", 250.10, d, "1-URGENT"),
        (2, 100, "O", 250.10, d + datetime.timedelta(days=3), "1-URGENT"),
        # same cents, 30 days apart → outside the window
        (3, 100, "O", 250.10, d + datetime.timedelta(days=33), "1-URGENT"),
        # same customer, different cents → clean
        (4, 100, "O", 250.11, d, "1-URGENT"),
        # different customer, same cents → clean
        (5, 200, "O", 250.10, d, "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        (r["order_a"], r["order_b"], r["days_apart"])
        for r in q_duplicate_payment_audit(spark, str(tmp_path)).collect()
    }
    assert got == {(1, 2, 3)}


def test_compressibility_matches_direct_zlib(spark):
    """doc_compressibility vs direct Python zlib on the same docs,
    plus a planted highly-repetitive doc that must flag."""
    import zlib

    from the_hive_spark.operators.corpus_quality import (
        COMPRESS_REPETITIVE_PPM,
        doc_compressibility,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio_ppm"],
                      r["flagged_repetitive"])
        for r in doc_compressibility(spark, sf).collect()
    }
    import duckdb

    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
        " WHERE length(text) > 0"
    ).fetchall()
    assert len(got) == len(docs)
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        ratio = int(1000000.0 * comp / len(raw) + 0.5)
        assert got[doc_id] == (
            len(raw), comp, ratio, ratio < COMPRESS_REPETITIVE_PPM
        ), doc_id
    # planted: 'ab' * 5000 compresses to well under 30%
    rep = ("ab" * 5000).encode()
    assert len(zlib.compress(rep, 6)) * 1000000 // len(rep) < 300000
