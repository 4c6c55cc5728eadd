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
    """Property: the geometric-banded range join returns EXACTLY the
    brute-force qualifying set across five decades of price — clusters
    dense enough that matches straddle log-band edges, plus the ≤ 1
    cent corner where the log argument is clamped (zero can only match
    zero; all clamped rows share a band)."""
    import random

    from the_hive_spark.operators.analytics import banded_substitution_pairs

    rng = random.Random(11)
    rows = []
    k = 0
    for brand in ["B1", "B2", "B3"]:
        # clusters spanning $0.45 to ~$500k — geometric bands must hold
        # completeness at every magnitude, not just the TPC-H envelope
        for center, spread in (
            (45, 2),
            (4500, 1200),
            (99900, 1200),
            (499000, 2500),
            (49900000, 150000),
        ):
            for _ in range(40):
                k += 1
                rows.append(
                    (k, brand, center + rng.randrange(-spread, spread + 1))
                )
        # degenerate corner: zero/one-cent prices (log clamp path)
        for cents in (0, 0, 1, 1, 2):
            k += 1
            rows.append((k, brand, cents))
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
                         0 if d == 0 else math.floor(1e6 * d / lo + 0.5))
                    )
    assert got == sorted(want)
    # the adversarial premises actually hold: some qualifying pair
    # crosses a log-band boundary (right-neighbor probe is load-
    # bearing), and the zero-price corner produced a pair
    band = lambda c: math.floor(math.log(max(c, 1)) / math.log(1.003))
    crossers = [
        (ca, cb)
        for brand, ps in by_brand.items()
        for i, (ka, ca) in enumerate(ps)
        for kb, cb in ps[i + 1:]
        if abs(ca - cb) * 500 <= min(ca, cb)
    ]
    assert any(band(ca) != band(cb) for ca, cb in crossers)
    assert any(ca == 0 and cb == 0 for ca, cb in crossers)
