"""Hypothesis property tests for round-4 machinery.

Spark-driven properties run ONE job over a batch of generated cases
(case_id = group key) instead of a session round-trip per example —
hypothesis drives the pure-Python reference, the batch DataFrame
carries every case at once.
"""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from the_hive_spark.operators.multimodal import (
    _ahash_from_pixels,
    _ahash_numpy,
)


@given(
    w=st.integers(min_value=8, max_value=64),
    h=st.integers(min_value=8, max_value=48),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_ahash_numpy_matches_scalar_reference(w, h, seed):
    rng = random.Random(seed)
    pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert _ahash_numpy(pixels, w, h) == _ahash_from_pixels(pixels, w, h)


def _brute_union(intervals):
    covered = set()
    for s, e in intervals:
        covered.update(range(s, e + 1))
    return len(covered)


def test_interval_union_matches_brute_force(spark):
    """One Spark job over 80 random interval sets vs the set-based
    brute force — overlap, containment, touching, and disjoint cases
    all drawn from a deliberately collision-heavy domain."""
    from the_hive_spark.functions.intervals import interval_union_length

    rng = random.Random(20260814)
    rows, expected = [], {}
    for case in range(80):
        n = rng.randint(1, 12)
        intervals = []
        for _ in range(n):
            s = rng.randint(1, 30)  # small domain → dense collisions
            e = s + rng.randint(0, 10)
            intervals.append((s, e))
            rows.append((case, s, e))
        expected[case] = _brute_union(intervals)
    df = spark.createDataFrame(rows, "gid long, s long, e long")
    got = {
        r["gid"]: r["covered"]
        for r in interval_union_length(df, "gid").collect()
    }
    assert got == expected


def test_sweepline_peak_matches_brute_force(spark, tmp_path):
    """events_peak_concurrency on random single-day session layouts vs
    a brute-force per-microsecond concurrency max. Sessions are built
    so the 30-minute sessionizer keeps each user's bursts separate."""
    import datetime

    from the_hive_spark.operators.warehouse import events_peak_concurrency

    rng = random.Random(42)
    rows = []
    eid = 0
    sessions = []  # (start_us, end_us)
    base = datetime.datetime(2024, 5, 5, 6, 0, 0)
    for user in range(25):
        # one session per user: two events [start, start+dur]
        start_s = rng.randint(0, 3600)
        dur_s = rng.randint(0, 900)
        t0 = base + datetime.timedelta(seconds=start_s)
        t1 = t0 + datetime.timedelta(seconds=dur_s)
        rows.append((eid, t0, user, "view", 1.0, "{}")); eid += 1
        if dur_s:
            rows.append((eid, t1, user, "view", 1.0, "{}")); eid += 1
        sessions.append((start_s, start_s + dur_s))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    # brute force: evaluate concurrency at every boundary instant
    # (closed intervals: touching sessions count as concurrent)
    points = sorted({s for s, _ in sessions} | {e for _, e in sessions})
    want = max(
        sum(1 for s, e in sessions if s <= p <= e) for p in points
    )
    got = events_peak_concurrency(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["peak_concurrent"] == want
    assert got[0]["sessions_started"] == 25


def test_banded_substitution_complete_at_any_price_scale(spark):
    """Property: the banded range join returns EXACTLY the brute-force
    qualifying set even when prices exceed the 200-cent band floor's
    completeness envelope ($1000) — the derived band width must keep
    cross-band pairs (the sf1-hardening regression)."""
    import random

    from the_hive_spark.operators.analytics import banded_substitution_pairs

    rng = random.Random(11)
    rows = []
    k = 0
    for brand in ["B1", "B2", "B3"]:
        # clusters around $45, $999, $4990 — the last far past the
        # fixed-width envelope, with gaps that straddle band edges
        for center in (4500, 99900, 499000):
            for _ in range(40):
                k += 1
                rows.append(
                    (k, brand, center + rng.randrange(-1200, 1201))
                )
    df = spark.createDataFrame(rows, "p_partkey long, p_brand string, cents long")
    got = sorted(
        (r["part_a"], r["part_b"], r["price_diff_cents"], r["rel_diff_ppm"])
        for r in banded_substitution_pairs(df).collect()
    )
    want = []
    by_brand: dict[str, list] = {}
    for pk, brand, cents in rows:
        by_brand.setdefault(brand, []).append((pk, cents))
    import math

    for brand, ps in by_brand.items():
        for i, (ka, ca) in enumerate(ps):
            for kb, cb in ps[i + 1:]:
                d, lo = abs(ca - cb), min(ca, cb)
                if d * 500 <= lo:
                    want.append(
                        (min(ka, kb), max(ka, kb), d,
                         math.floor(1e6 * d / lo + 0.5))
                    )
    assert got == sorted(want)
    # the adversarial premise actually holds: some qualifying pair
    # spans non-adjacent 200-cent bands
    assert any(
        abs(ca // 200 - cb // 200) > 1
        for brand, ps in by_brand.items()
        for i, (ka, ca) in enumerate(ps)
        for kb, cb in ps[i + 1:]
        if abs(ca - cb) * 500 <= min(ca, cb)
    )
