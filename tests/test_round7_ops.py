"""Round-7 operator property tests."""

from __future__ import annotations

import pandas as pd


def test_fuzzy_match_hot_block_bounded_and_exact(spark, tmp_path):
    """Skew-safety property of the record-linkage blocker: a planted
    hot block (hundreds of IDENTICAL copies of one popular name, plus
    a one-typo variant group) must (a) keep the masked-block join
    bounded by DISTINCT-NAME multiplicity — the name-level stage emits
    exactly one verified pair for the two variants, regardless of how
    many records carry them — and (b) still produce the exact
    brute-force answer set after group expansion (no recall tradeoff:
    within-group distance-0 pairs, cross-group distance-1 pairs,
    nothing else)."""
    from the_hive_spark.operators.entity_resolution import (
        cust_fuzzy_match_pairs,
        distinct_name_match_pairs,
    )

    hot_a, hot_b = "John Smithe", "Jahn Smithe"  # hamming distance 1
    rows = []
    for k in range(1, 301):
        rows.append({"c_custkey": k, "c_name": hot_a})
    for k in range(301, 501):
        rows.append({"c_custkey": k, "c_name": hot_b})
    # unrelated names: pairwise distance >= 2 (digits doubled, so two
    # distinct k's always differ in at least two positions)
    for k in range(501, 601):
        rows.append({"c_custkey": k, "c_name": f"Zed {k:03d}{k:03d}"})
    df = pd.DataFrame(rows)
    df["c_nationkey"] = (df["c_custkey"] % 7).astype("int32")
    df["c_acctbal"] = 0.0
    df["c_mktsegment"] = "SEG"
    df.to_parquet(tmp_path / "customer.parquet")

    # (a) the name-level stage is bounded by variant multiplicity:
    # 102 distinct names -> exactly ONE verified name pair
    names = (
        spark.read.parquet(str(tmp_path / "customer.parquet"))
        .select("c_name")
        .distinct()
    )
    name_pairs = distinct_name_match_pairs(spark, names).collect()
    assert len(name_pairs) == 1
    assert {name_pairs[0]["name_a"], name_pairs[0]["name_b"]} == {
        hot_a, hot_b
    }

    # (b) record-level output equals the O(n^2) brute force
    got = {
        (r["custkey_a"], r["custkey_b"]): r["edit_distance"]
        for r in cust_fuzzy_match_pairs(spark, str(tmp_path)).collect()
    }

    def ham(x: str, y: str) -> int:
        return sum(1 for cx, cy in zip(x, y) if cx != cy)

    recs = list(zip(df["c_custkey"], df["c_name"]))
    want = {}
    for i, (ka, na) in enumerate(recs):
        for kb, nb in recs[i + 1:]:
            if len(na) == len(nb) and ham(na, nb) <= 1:
                lo, hi = min(ka, kb), max(ka, kb)
                want[(lo, hi)] = ham(na, nb)
    # sanity on the fixture itself: the hot block IS quadratic output
    assert len(want) == 300 * 299 // 2 + 200 * 199 // 2 + 300 * 200
    assert got == want

    # plan hygiene: the expansion is equi-joins, never a cartesian
    plan = (
        cust_fuzzy_match_pairs(spark, str(tmp_path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
