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


def test_trade_flow_matrix_shape(spark):
    rows = QUERIES["q_trade_flow_matrix"](spark, SF).collect()
    assert 0 < len(rows) <= 625
    assert len({(r["supplier_nation"], r["customer_nation"]) for r in rows}) \
        == len(rows)
    for r in rows:
        assert r["n_lineitems"] > 0 and r["revenue_cents"] > 0


def test_part_substitution_equals_brute_force(spark):
    """The banded range join must return EXACTLY what the naive
    all-pairs predicate returns (this is the test that catches a
    band-orientation bug: a pair whose lower-priced part has the
    larger key must still be generated)."""
    rows = QUERIES["q_part_substitution_candidates"](spark, SF).collect()
    parts = table(spark, SF, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    ).collect()
    import math

    by_brand: dict[str, list] = {}
    for p in parts:
        by_brand.setdefault(p["p_brand"], []).append(
            (p["p_partkey"], math.floor(p["p_retailprice"] * 100 + 0.5))
        )
    want = []
    for brand, ps in by_brand.items():
        for i, (ka, ca) in enumerate(ps):
            for kb, cb in ps[i + 1:]:
                d, lo = abs(ca - cb), min(ca, cb)
                if d * 500 <= lo:
                    a, b = sorted((ka, kb))
                    want.append(
                        (math.floor(1e6 * d / lo + 0.5), a, b, brand, d)
                    )
    want.sort()
    got = [
        (r["rel_diff_ppm"], r["part_a"], r["part_b"], r["p_brand"],
         r["price_diff_cents"])
        for r in rows
    ]
    assert got == [(p, a, b, br, d) for (p, a, b, br, d) in want[:50]]


def test_funnel_latency_consistent_with_funnel(spark):
    lat = {
        r["step"]: r for r in QUERIES["events_funnel_latency"](spark, SF).collect()
    }
    fun = QUERIES["events_funnel"](spark, SF).collect()[0]
    assert lat["view_to_click"]["n_users"] == fun["n_click_after_view"]
    assert lat["click_to_purchase"]["n_users"] == fun["n_full_funnel"]
    for r in lat.values():
        assert 0 <= r["p50_us"] <= r["p90_us"]
        assert r["mean_us"] >= 0


def test_label_propagation_matches_python_reference(spark):
    """3 synchronous min-label rounds recomputed in pure Python on the
    collected edge list must give the identical top-30 census."""
    from the_hive_spark.operators.analytics import copurchase_edges_min2

    e = copurchase_edges_min2(spark, SF).collect()
    nbrs: dict[int, set] = {}
    for r in e:
        nbrs.setdefault(r["u"], set()).add(r["v"])
        nbrs.setdefault(r["v"], set()).add(r["u"])
    lbl = {n: n for n in nbrs}
    for _ in range(3):
        lbl = {
            n: min([lbl[n]] + [lbl[m] for m in nbrs[n]]) for n in nbrs
        }
    census: dict[int, int] = {}
    for v in lbl.values():
        census[v] = census.get(v, 0) + 1
    want = sorted(census.items(), key=lambda t: (-t[1], t[0]))[:30]
    got = [
        (r["community"], r["n_nodes"])
        for r in QUERIES["graph_label_propagation3"](spark, SF).collect()
    ]
    assert got == want


def test_er_clusters_census_matches_python_closure(spark):
    """Transitive closure of the fuzzy-match pairs recomputed with a
    pure-Python union-find must give the identical size census (typo
    clusters are tiny, so 3 LP rounds == full closure here)."""
    from the_hive_spark.operators.entity_resolution import (
        cust_fuzzy_match_pairs,
    )

    pairs = cust_fuzzy_match_pairs(spark, SF).collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = r["custkey_a"], r["custkey_b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes: dict[int, int] = {}
    for n in parent:
        root = find(n)
        sizes[root] = sizes.get(root, 0) + 1
    census: dict[int, list] = {}
    for s in sizes.values():
        census[s] = census.get(s, 0) + 1
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_records"])
        for r in QUERIES["cust_er_clusters3"](spark, SF).collect()
    }
    want = {s: (c, s * c) for s, c in census.items()}
    assert got == want


def test_nation_yoy_growth_internally_consistent(spark):
    """Within each nation the rows chain: this year's revenue minus
    the delta must equal the previous returned year's revenue, and
    growth_ppm must be floor(1e6*delta/prev + 0.5) of those integers."""
    import math

    rows = QUERIES["q_nation_yoy_growth"](spark, SF).collect()
    assert rows
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r["nation"], []).append(r)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r["year"])
        for prev, cur in zip(rs, rs[1:]):
            if cur["year"] == prev["year"] + 1:
                assert cur["revenue_cents"] - cur["delta_cents"] \
                    == prev["revenue_cents"], (nation, cur["year"])
        for r in rs:
            prev_rev = r["revenue_cents"] - r["delta_cents"]
            assert r["growth_ppm"] == math.floor(
                1e6 * r["delta_cents"] / prev_rev + 0.5
            )


def test_fulfillment_latency_covers_all_shipped_orders(spark):
    rows = QUERIES["q_order_fulfillment_latency"](spark, SF).collect()
    assert len(rows) == 5  # the five TPC-H priorities
    li = table(spark, SF, "lineitem").select("l_orderkey").distinct()
    n_shipped = li.count()
    assert sum(r["n_orders"] for r in rows) == n_shipped
    for r in rows:
        assert r["p50_days"] <= r["p90_days"]


def test_weighted_median_matches_python_brute_force(spark):
    """Exact weighted-median recomputation from the raw rows: smallest
    unit price whose cumulative quantity reaches half the brand
    total."""
    import math

    li = table(spark, SF, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).collect()
    parts = {
        r["p_partkey"]: r["p_brand"]
        for r in table(spark, SF, "part").select(
            "p_partkey", "p_brand"
        ).collect()
    }
    acc: dict[str, dict[int, int]] = {}
    for r in li:
        brand = parts[r["l_partkey"]]
        cents = math.floor(
            r["l_extendedprice"] / r["l_quantity"] * 100 + 0.5
        )
        acc.setdefault(brand, {})
        acc[brand][cents] = acc[brand].get(cents, 0) + int(r["l_quantity"])
    want = {}
    for brand, prices in acc.items():
        tw = sum(prices.values())
        cw = 0
        for cents in sorted(prices):
            cw += prices[cents]
            if 2 * cw >= tw:
                want[brand] = (tw, cents)
                break
    got = {
        r["p_brand"]: (r["total_weight"], r["weighted_median_cents"])
        for r in QUERIES["q_weighted_median_price"](spark, SF).collect()
    }
    assert got == want


def test_clustering_coefficient_matches_python(spark):
    """Per-node triangle/degree recomputation on the collected edge
    list must reproduce the top-30 exactly."""
    import math

    from the_hive_spark.operators.analytics import copurchase_edges_min2

    e = copurchase_edges_min2(spark, SF).collect()
    nbrs: dict[int, set] = {}
    edges = set()
    for r in e:
        nbrs.setdefault(r["u"], set()).add(r["v"])
        nbrs.setdefault(r["v"], set()).add(r["u"])
        edges.add((r["u"], r["v"]))
    want = []
    for n, ns in nbrs.items():
        d = len(ns)
        if d < 2:
            continue
        sorted_ns = sorted(ns)
        t = sum(
            1
            for i, a in enumerate(sorted_ns)
            for b in sorted_ns[i + 1:]
            if (min(a, b), max(a, b)) in edges
        )
        want.append(
            (n, d, t, math.floor(1e6 * 2 * t / (d * (d - 1)) + 0.5))
        )
    want.sort(key=lambda r: (-r[3], -r[1], r[0]))
    got = [
        (r["node"], r["degree"], r["n_triangles"], r["clustering_ppm"])
        for r in QUERIES["graph_clustering_coefficient"](spark, SF).collect()
    ]
    assert got == want[:30]


def test_survival_curve_monotone_and_anchored(spark):
    rows = sorted(
        QUERIES["events_survival_curve"](spark, SF).collect(),
        key=lambda r: r["day"],
    )
    n_users_total = (
        table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert rows[0]["day"] == 0
    assert rows[0]["n_users"] == n_users_total
    assert rows[0]["survival_ppm"] == 1000000
    for a, b in zip(rows, rows[1:]):
        assert b["day"] == a["day"] + 1
        assert b["n_users"] <= a["n_users"]


def test_time_weighted_value_matches_python(spark):
    """Exact recomputation: per user sort by (ts, event_id), each
    value holds until the next event; per-type Σv·Δt / ΣΔt."""
    import math

    ev = sorted(
        table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    acc: dict[str, list] = {}
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] != b["user_id"]:
            continue
        d = b["ts"] - a["ts"]
        dt = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
        if dt <= 0:
            continue
        v = math.floor(a["value"] * 1_000_000 + 0.5)
        s = acc.setdefault(a["event_type"], [0, 0, 0])
        s[0] += 1
        s[1] += dt
        s[2] += v * dt
    want = {
        t: (n, held, math.floor(float(vdt) / float(held)))
        for t, (n, held, vdt) in acc.items()
    }
    got = {
        r["event_type"]: (r["n_intervals"], r["held_us"], r["twap_micros"])
        for r in QUERIES["events_time_weighted_value"](spark, SF).collect()
    }
    assert got == want


def test_equidepth_histogram_is_equidepth_and_ordered(spark):
    rows = sorted(
        QUERIES["q_equidepth_histogram"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in rows] == list(range(1, 11))
    n_total = table(spark, SF, "lineitem").count()
    assert sum(r["n_rows"] for r in rows) == n_total
    # equal heights within 1 row (NTILE remainder rule)
    heights = [r["n_rows"] for r in rows]
    assert max(heights) - min(heights) <= 1
    # boundaries are ordered and non-overlapping (ties may touch)
    for a, b in zip(rows, rows[1:]):
        assert a["lo_cents"] <= a["hi_cents"]
        assert a["hi_cents"] <= b["lo_cents"]
