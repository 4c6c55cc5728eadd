"""Property-based tests (hypothesis) for the cross-engine helper
contracts — the invariants the oracle gate depends on but only ever
samples at fixed scale factors:

- Python helpers used by the dense-regime dedup plans must agree with
  the SQL expressions the oracles run (shingling, hash31, minhash
  chunking, quantization) on ARBITRARY inputs, not just the testdata;
- the hybrid connected-components paths must agree with a reference
  union-find on arbitrary edge lists.

DuckDB evaluates the SQL side (no JVM startup), so hundreds of
examples run in seconds; the one Spark-backed property keeps its
example count small.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from the_hive_spark.operators.dedup import (
    N_MINHASH,
    SHINGLE_W,
    _HASH31_DUCK,
    _py_shingle_set,
)

# printable-ish text incl. unicode, but no surrogates
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    min_size=0,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_py_shingle_set_matches_sql_semantics(text):
    """_py_shingle_set == array_distinct(transform(sequence(...)))
    as run by the sparse-plan SQL (same w, same substring windows)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT DISTINCT unnest(list_distinct(
          list_transform(range(1, greatest(length(t) - {SHINGLE_W - 1}, 1) + 1),
                         i -> substring(t, i, {SHINGLE_W}))))
        FROM (SELECT ? AS t) WHERE length(t) >= {SHINGLE_W}
        """,
        [text],
    ).fetchall()
    sql_set = {r[0] for r in rows}
    py_set = _py_shingle_set(text) if len(text) >= SHINGLE_W else set()
    assert py_set == sql_set


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127),
               min_size=1, max_size=30))
def test_hash31_duck_matches_python(token):
    """The portable 31-polynomial hash the simhash oracle runs must
    equal the obvious Python fold (mod 1e9+7, ascii codepoints)."""
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_HASH31_DUCK.format(t='t')} FROM (SELECT ? AS t)", [token]
    ).fetchone()[0]
    acc = 0
    for ch in token:
        acc = (acc * 31 + ord(ch)) % 1000000007
    assert got == acc


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=SHINGLE_W, max_size=60))
def test_dense_minhash_chunks_match_sql(text):
    """The dense plan's driver-side salted-md5-chunk minima == the
    sparse oracle's MIN(_mh_sql_expr(c)) per chunk."""
    from the_hive_spark.operators.dedup import (
        _MH_CHUNKS_PER_DIGEST,
        _mh_sql_expr,
    )

    shingles = _py_shingle_set(text)

    def py_mh(s: str, c: int) -> str:
        d = c // _MH_CHUNKS_PER_DIGEST
        data = s if d == 0 else f"{s}{d}"
        off = 4 * (c % _MH_CHUNKS_PER_DIGEST)
        return hashlib.md5(data.encode()).hexdigest()[off : off + 4]

    py_sig = [
        min(py_mh(s, c) for s in shingles) for c in range(N_MINHASH)
    ]
    con = duckdb.connect()
    sql_sig = list(
        con.execute(
            "SELECT "
            + ", ".join(
                f"MIN({_mh_sql_expr(c, 's')})" for c in range(N_MINHASH)
            )
            + " FROM (SELECT unnest(?) AS s)",
            [sorted(shingles)],
        ).fetchone()
    )
    assert py_sig == sql_sig


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False),
             min_size=1, max_size=16)
)
def test_quantization_matches_sql(vec):
    """numpy milli-unit quantization == FLOOR(x*1000 + 0.5) in SQL
    (the arithmetic every vectorized similarity scorer relies on)."""
    import numpy as np
    import pandas as pd

    from the_hive_spark.operators.similarity import _quantize_block

    got = _quantize_block(pd.Series([vec]))[0].tolist()
    con = duckdb.connect()
    want = con.execute(
        "SELECT list_transform(?::DOUBLE[], "
        "x -> CAST(FLOOR(x * 1000 + 0.5) AS BIGINT))",
        [vec],
    ).fetchone()[0]
    assert got == want


def _reference_components(edges):
    """Plain-python union-find with min-id labels."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    return {n: find(n) for n in parent if any(n in e for e in edges)}


@pytest.mark.parametrize("threshold", [1_000_000, 0])
@settings(max_examples=15, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_cc_matches_reference_unionfind(spark, threshold, edges):
    """Both CC paths (driver union-find / distributed star-contraction)
    label arbitrary graphs exactly like a reference union-find
    (self-loops dropped, min-id labels, isolated nodes absent)."""
    from the_hive_spark.operators.graph import connected_components

    real = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(
        edges, "src bigint, dst bigint"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, local_threshold=threshold).collect()
    }
    want = _reference_components(real)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    ),
    n_salts=st.sampled_from([2, 5, 16]),
)
def test_salted_join_equals_plain_join(spark, rows, n_salts):
    """salted_join must be row-identical to the plain equi-join for
    arbitrary fact/dim data and salt counts — including duplicate fact
    keys, dim keys with no fact rows, and vice versa."""
    from the_hive_spark.functions.skew import salted_join

    fact = spark.createDataFrame(rows, "k bigint, v bigint")
    # dim: one row per even key in range (some fact keys unmatched)
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 6, 2)], "k bigint, label string"
    )
    got = sorted(
        tuple(r) for r in salted_join(fact, dim, on="k").collect()
    )
    want = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet="abcdef gh",
            min_size=5,
            max_size=120,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_per_row_minhash_equals_explode_form(spark, texts):
    """The per-row MinHash (with_minhash_cols — map-only, streaming-
    safe) must be value-identical to the explode + groupBy(min) form
    for arbitrary text, including texts shorter than the shingle
    width after filtering and repeated shingles."""
    import pyspark.sql.functions as F

    from the_hive_spark.operators.dedup import (
        N_MINHASH,
        SHINGLE_W,
        _minhash_signatures_from,
        shingles_expr,
        with_minhash_cols,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).filter(F.length("text") >= SHINGLE_W)
    cols = ["doc_id"] + [f"mh{s}" for s in range(N_MINHASH)]
    per_row = sorted(
        tuple(r) for r in with_minhash_cols(docs).select(*cols).collect()
    )
    sh = docs.select("doc_id", F.explode(shingles_expr()).alias("shingle"))
    agg = sorted(
        tuple(r) for r in _minhash_signatures_from(sh).select(*cols).collect()
    )
    assert per_row == agg


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # user
            st.integers(min_value=0, max_value=5000),   # offset seconds ×10
        ),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_debounce_invariants(spark, raw):
    """events_debounced structural invariants against a pure-Python
    burst model: one emitted row per burst, each emitted event is the
    burst's last, and burst_len values partition the key's events."""
    import pandas as pd

    from the_hive_spark.operators.timeline import (
        DEBOUNCE_GAP_US,
        events_debounced,
    )

    base = pd.Timestamp("2024-01-01", tz="UTC")
    rows = [
        {
            "event_id": i,
            "ts": base + pd.Timedelta(seconds=10 * off),
            "user_id": user,
            "event_type": "view",
            "value": 0.0,
            "props": "{}",
        }
        for i, (user, off) in enumerate(raw)
    ]
    pdf = pd.DataFrame(rows).astype({"ts": "datetime64[us, UTC]"})

    # python oracle: sort per user, split on gap > DEBOUNCE_GAP_US
    expected = {}
    for user, grp in pdf.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        bursts, cur = [], []
        last_us = None
        for _, r in grp.iterrows():
            us = int(r.ts.value // 1000)
            if last_us is not None and us - last_us > DEBOUNCE_GAP_US:
                bursts.append(cur)
                cur = []
            cur.append((int(r.event_id), us))
            last_us = us
        bursts.append(cur)
        for b in bursts:
            eid, us = b[-1]
            expected[eid] = (len(b), us)

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "events.parquet"))
        got = {
            int(r.event_id): (int(r.burst_len), int(r.ts_us))
            for r in events_debounced(spark, d).collect()
        }
    assert got == expected


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=50),
)
def test_ntile_from_rank_property(n, k):
    """ids.ntile_from_rank must satisfy the SQL NTILE contract for
    ARBITRARY (n, k): bucket sizes differ by at most 1, the first
    n % k buckets are the larger ones, buckets are non-decreasing in
    rank, and every bucket id is in [1, min(n, k)]. Evaluated via the
    same closed form the Column expression encodes (no JVM needed)."""
    q, rem = divmod(n, k)

    def tile(r: int) -> int:
        if q == 0:
            return r
        big = rem * (q + 1)
        if r <= big:
            return (r - 1) // (q + 1) + 1
        return rem + (r - big - 1) // q + 1

    tiles = [tile(r) for r in range(1, n + 1)]
    if not tiles:
        return
    assert tiles == sorted(tiles)
    assert tiles[0] == 1 and tiles[-1] == min(n, k)
    from collections import Counter

    sizes = Counter(tiles)
    assert set(sizes) == set(range(1, min(n, k) + 1))
    counts = [sizes[b] for b in sorted(sizes)]
    assert max(counts) - min(counts) <= 1
    # the larger buckets come first, and exactly n % k of them
    if q > 0 and rem > 0:
        assert all(c == q + 1 for c in counts[:rem])
        assert all(c == q for c in counts[rem:])


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1)),
        min_size=1, max_size=80,
    )
)
def test_zorder2_order_matches_reference(pairs):
    """Sorting by zorder2 must equal sorting by the reference Python
    Morton interleave — pure bit-twiddling parity on arbitrary
    coordinates (evaluated through the same mask pipeline the Column
    expression encodes)."""
    STEPS = [(16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
             (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
             (1, 0x5555555555555555)]

    def spread(x: int) -> int:
        x &= (1 << 31) - 1
        for shift, mask in STEPS:
            x = (x | (x << shift)) & mask
        return x

    def z_mask(a: int, b: int) -> int:
        return spread(a) | (spread(b) << 1)

    def z_ref(a: int, b: int) -> int:
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for a, b in pairs:
        assert z_mask(a, b) == z_ref(a, b), (a, b)
    assert sorted(pairs, key=lambda p: z_mask(*p)) == sorted(
        pairs, key=lambda p: z_ref(*p)
    )
