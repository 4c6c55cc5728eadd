"""Round-6 operator property tests: each new query checked against a
brute-force / from-scratch reimplementation on adversarial synthetic
data (the oracle sweep checks parquet corpora; these pin the corner
cases the corpora don't contain)."""

from __future__ import annotations

import hashlib
import math
import random

import pandas as pd
import pyspark.sql.functions as F


def _write_parts(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "p_partkey long, p_size int, p_retailprice double"
    ).withColumn("p_brand", F.lit("B")).write.parquet(
        str(tmp_path / "part.parquet")
    )


def test_skyline_matches_bruteforce_with_ties(spark, tmp_path):
    """Property: the domain-factorized skyline equals the O(n²)
    dominance scan — including full (size, price) ties, which do NOT
    dominate each other and must all stay in."""
    from the_hive_spark.operators.analytics import q_part_skyline

    rng = random.Random(7)
    rows = []
    for k in range(1, 401):
        rows.append((k, rng.randrange(1, 16), float(rng.randrange(50, 400))))
    # planted exact ties on the frontier: two parts, same size, same
    # minimal price
    rows.append((900, 20, 10.0))
    rows.append((901, 20, 10.0))
    # planted dominated twin: same size as frontier tie, higher price
    rows.append((902, 20, 11.0))
    _write_parts(spark, tmp_path, rows)

    got = sorted(
        (r["p_partkey"], r["size"], r["cents"])
        for r in q_part_skyline(spark, str(tmp_path)).collect()
    )

    pts = [(k, s, int(math.floor(p * 100 + 0.5))) for k, s, p in rows]
    want = sorted(
        (k, s, c)
        for k, s, c in pts
        if not any(
            cq <= c and sq >= s and (cq < c or sq > s)
            for kq, sq, cq in pts
            if kq != k
        )
    )
    assert got == want
    assert (900, 20, 1000) in want and (901, 20, 1000) in want
    assert (902, 20, 1100) not in want


def test_minhash_calibration_matches_python_md5(spark, tmp_path):
    """Property: minhash_est_ppm equals a from-scratch python md5
    recomputation (same one-permutation 4-hex-chunk minima), and
    jaccard_ppm stays the exact set Jaccard, on a corpus with planted
    near-dups."""
    from the_hive_spark.operators.dedup import (
        N_MINHASH,
        SHINGLE_W,
        doc_minhash_calibration,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the "
        "cat watches from the warm windowsill in the afternoon sun"
    )
    docs = [
        (1, base, "s1"),
        (2, base + " extra tail words here", "s1"),  # near-dup of 1
        (3, base.replace("quick", "rapid"), "s1"),  # near-dup of 1
        (4, "completely different text about spark physical plans "
            "and shuffle boundaries at scale", "s1"),
    ]
    pd.DataFrame(
        [{"doc_id": d, "text": t, "source": s, "n_chars": len(t)}
         for d, t, s in docs]
    ).to_parquet(tmp_path / "documents.parquet")

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["jaccard_ppm"], r["minhash_est_ppm"], r["abs_err_ppm"]
        )
        for r in doc_minhash_calibration(spark, str(tmp_path)).collect()
    }
    assert got, "no qualifying pairs — fixture broken"

    def shingles(t):
        return {t[i:i + SHINGLE_W] for i in range(len(t) - SHINGLE_W + 1)}

    def sig(t):
        def mh(s, c):
            d = c // 8
            data = s if d == 0 else f"{s}{d}"
            off = 4 * (c % 8)
            return hashlib.md5(data.encode()).hexdigest()[off:off + 4]
        return [min(mh(s, c) for s in shingles(t))
                for c in range(N_MINHASH)]

    texts = {d: t for d, t, _ in docs}
    for (a, b), (jac, est, err) in got.items():
        sa, sb = shingles(texts[a]), shingles(texts[b])
        want_jac = math.floor(
            1e6 * len(sa & sb) / len(sa | sb) + 0.5
        )
        assert jac == want_jac, (a, b)
        matches = sum(
            1 for x, y in zip(sig(texts[a]), sig(texts[b])) if x == y
        )
        assert est == matches * (1_000_000 // N_MINHASH), (a, b)
        assert err == abs(jac - est)


def test_lateness_profile_matches_bruteforce(spark, tmp_path):
    """Property: bucketed lateness equals a python replay of each
    user's stream in event_id order, on data with exact ties, sub-ms
    lateness, and multi-decade lateness."""
    from the_hive_spark.operators.timeline import events_lateness_profile

    rows = []
    base = pd.Timestamp("2024-01-01", tz="UTC")
    seqs = {
        # (user, [(event_id, offset_us)]) — in-order, ties, late
        1: [(1, 0), (2, 10), (3, 10), (4, 5), (5, 10_000_000)],
        2: [(10, 1_000_000), (11, 500), (12, 999_000_000),
            (13, 2_000_000)],
        3: [(20, 0), (21, 0)],
    }
    for uid, evs in seqs.items():
        for eid, off in evs:
            rows.append(
                {"event_id": eid, "ts": base + pd.Timedelta(microseconds=off),
                 "user_id": uid, "event_type": "x", "value": 1.0,
                 "props": ""}
            )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us, UTC]")
    df.to_parquet(tmp_path / "events.parquet")

    got = {
        r["bucket"]: (r["n_events"], r["n_users"], r["max_late_us"])
        for r in events_lateness_profile(spark, str(tmp_path)).collect()
    }

    agg: dict[int, list] = {}
    for uid, evs in seqs.items():
        cummax = None
        for eid, off in sorted(evs):
            cummax = off if cummax is None else max(cummax, off)
            late = cummax - off
            bucket = 0 if late == 0 else len(str(late // 1000))
            a = agg.setdefault(bucket, [0, set(), 0])
            a[0] += 1
            a[1].add(uid)
            a[2] = max(a[2], late)
    want = {b: (n, len(users), mx) for b, (n, users, mx) in agg.items()}
    assert got == want
    # adversarial premises hold: an in-order bucket, a sub-ms-late
    # bucket (late>0 but late//1000==0 → one digit), and a multi-
    # decade-late bucket all exist
    assert 0 in want and 1 in want and max(want) >= 6


def test_order_backlog_matches_bruteforce(spark, tmp_path):
    """Property: delta-day backlog equals a per-day brute-force count
    of open intervals — including orders with no lineitems (open
    forever), same-day open-and-close, and multiple orders sharing
    delta days."""
    import datetime as dt

    from the_hive_spark.operators.analytics import q_order_backlog_daily

    d0 = dt.date(2023, 1, 1)
    rng = random.Random(13)
    orders, lines = [], []
    for k in range(1, 101):
        open_off = rng.randrange(0, 60)
        orders.append((k, d0 + dt.timedelta(days=open_off)))
        if k % 10 == 0:
            continue  # every 10th order has NO lineitems: never closes
        for ln in range(1, rng.randrange(2, 5)):
            ship_off = open_off + rng.randrange(0, 30)  # 0 ⇒ same-day
            lines.append((k, ln, d0 + dt.timedelta(days=ship_off)))
    pd.DataFrame(
        [{"o_orderkey": k, "o_orderdate": d} for k, d in orders]
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        [{"l_orderkey": k, "l_linenumber": ln, "l_shipdate": d}
         for k, ln, d in lines]
    ).to_parquet(tmp_path / "lineitem.parquet")

    got = [
        (r["day"], r["n_opened"], r["n_closed"], r["backlog"])
        for r in q_order_backlog_daily(spark, str(tmp_path)).collect()
    ]

    last_ship = {}
    for k, _, d in lines:
        last_ship[k] = max(last_ship.get(k, d), d)
    opens: dict = {}
    closes: dict = {}
    for k, d in orders:
        opens[d] = opens.get(d, 0) + 1
        if k in last_ship:
            c = last_ship[k]
            closes[c] = closes.get(c, 0) + 1
    days = sorted(set(opens) | set(closes))
    want, run = [], 0
    for d in days:
        o, c = opens.get(d, 0), closes.get(d, 0)
        run += o - c
        want.append((d.isoformat(), o, c, run))
    assert got == want
    # premises hold: a never-closing order exists, and total closes <
    # total opens so the final backlog is positive
    assert want[-1][3] > 0
    assert sum(c for _, _, c, _ in want) < sum(o for _, o, _, _ in want)


def test_minhash_calibration_bounded_sample(spark, tmp_path):
    """Property (round-7 sampled path): above CALIB_MAX_DOCS eligible
    docs the audit runs over the deterministic hex16·n < 65536·C doc
    subsample — a planted near-dup pair INSIDE the sample is audited
    with exact python-recomputed values, a near-dup pair with one doc
    OUTSIDE the sample never appears, and every emitted doc passes the
    sample predicate."""
    from the_hive_spark.operators.dedup import (
        CALIB_MAX_DOCS,
        N_MINHASH,
        SHINGLE_W,
        doc_minhash_calibration,
    )

    n_eligible = CALIB_MAX_DOCS + 500

    def in_sample(doc_id: int) -> bool:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        return h * n_eligible < 65536 * CALIB_MAX_DOCS

    base = (
        "the quick brown fox jumps over the lazy dog while the "
        "cat watches from the warm windowsill in the afternoon sun"
    )
    # scan ids deterministically for two in-sample and one out-of-sample
    ins = [i for i in range(1, 10000) if in_sample(i)][:2]
    outs = [i for i in range(1, 10000) if not in_sample(i)][0]
    assert len(ins) == 2
    texts = {
        ins[0]: base,
        ins[1]: base + " extra tail words here",        # in-sample pair
        outs: base.replace("quick", "rapid"),           # near-dup of
        # ins[0] but OUT of the sample: must never be audited
    }
    rows = [
        {"doc_id": d, "text": t, "source": "s1", "n_chars": len(t)}
        for d, t in texts.items()
    ]
    # unique filler docs to push the eligible count past the cap
    filler_ids = iter(
        i for i in range(20000, 100000) if i not in texts
    )
    while len(rows) < n_eligible:
        i = next(filler_ids)
        rows.append(
            {
                "doc_id": i,
                "text": f"unique filler document number {i} "
                f"with no shared shingles x{i}y",
                "source": "s1",
                "n_chars": 10,
            }
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["jaccard_ppm"], r["minhash_est_ppm"], r["abs_err_ppm"]
        )
        for r in doc_minhash_calibration(spark, str(tmp_path)).collect()
    }
    assert (ins[0], ins[1]) in got or (ins[1], ins[0]) in got
    for a, b in got:
        assert in_sample(a) and in_sample(b), (a, b)
    assert not any(outs in p for p in got)

    def shingles(t):
        return {t[i:i + SHINGLE_W] for i in range(len(t) - SHINGLE_W + 1)}

    def sig(t):
        def mh(s, c):
            d = c // 8
            data = s if d == 0 else f"{s}{d}"
            off = 4 * (c % 8)
            return hashlib.md5(data.encode()).hexdigest()[off:off + 4]
        return [min(mh(s, c) for s in shingles(t))
                for c in range(N_MINHASH)]

    for (a, b), (jac, est, err) in got.items():
        if a not in texts or b not in texts:
            continue  # filler-filler pairs shouldn't exist anyway
        sa, sb = shingles(texts[a]), shingles(texts[b])
        assert jac == math.floor(1e6 * len(sa & sb) / len(sa | sb) + 0.5)
        matches = sum(
            1 for x, y in zip(sig(texts[a]), sig(texts[b])) if x == y
        )
        assert est == matches * (1_000_000 // N_MINHASH)
        assert err == abs(jac - est)
