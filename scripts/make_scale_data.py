#!/usr/bin/env python
"""Generate a 10×-scale (sf1-equivalent) copy of the driver's sf0.1
testdata for scale-stress sweeps, WITHOUT touching /root/testdata.

Method: replicate each fact/dim table K times with deterministic key
offsets chosen per-table so every foreign key stays consistent inside
its replica (replica i's lineitem rows reference replica i's orders/
part/supplier, etc.). Fixed-cardinality dims (region, nation) are NOT
replicated — exactly how a real corpus scales.

Two payload modes:

- default (verbatim): text/embedding payloads repeat verbatim — every
  doc gains K−1 exact duplicates with distinct doc_ids. Stress-tests
  exact dedup, but makes every pair-family query's OUTPUT quadratic
  in K (a K-clone family is C(K,2) near-dup pairs), so at sf10 those
  queries measure the data artifact, not the plan.

- --perturb: replica i>0 payloads get deterministic, progressively
  stronger edits so duplication is BOUNDED like a real corpus —
  each base doc keeps a small near-dup family (replicas 1-3 stay
  above the 0.4-Jaccard threshold at decreasing similarity, replicas
  ≥4 fall below it), each base customer keeps exactly one fuzzy-match
  alias, each base part keeps ~one same-price-band twin, and each
  base embedding keeps two near-neighbours. Near-dup pair counts then
  scale LINEARLY in K, so a sweep at K=10/100 measures plan scaling,
  not clone-count combinatorics. All edits are pure functions of
  (key, replica, position) — regeneration is byte-identical.

Correctness at the new scale is still checked the usual way — Spark
vs DuckDB on the SAME generated parquet — so replica artifacts cannot
bias the comparison.

Usage: python scripts/make_scale_data.py [K] [SRC] [DST] [--perturb]
Defaults: K=10, SRC=/root/testdata/sf0.1, DST=/tmp/spark_graft_sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

# key columns to offset, per table; offset unit = 10^12 per replica
# (far above any real key, so replicas can never collide)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]
UNIT = 1_000_000_000_000


# --perturb payload rewrites, per table. Edit strength grows with the
# replica index i (i=0 is always verbatim). Every quadratic-output
# trap of verbatim cloning is addressed on the column that drives the
# pair family's join key:
# - documents.text: replace every STEP(i)-th whitespace token with a
#   hash-derived synthetic token (hash-mixed so no two replicas' noise
#   vocabularies overlap — a position-linear token id would leave
#   heavy replicas of one doc sharing most noise tokens and recreate
#   the quadratic family). STEP 12/6/4 keeps replicas 1-3 in the
#   near-dup range at decreasing similarity; i≥4 rewrites EVERY token
#   (unrelated filler mass, like real corpus growth).
# - customer.c_name: i=1 substitutes the LAST character through a
#   digit→letter bijection — equal length at Hamming distance 1, so it
#   really is a fuzzy-match alias (the matcher only pairs equal-length
#   names within levenshtein 1; the old `|| 'x'` append changed the
#   length and never matched). A bijection, not a constant: customers
#   whose names differ only in the last digit must get DISTINCT
#   aliases, else every 10-customer prefix group collapses onto one
#   identical-name hot block. Alias-vs-base and alias-vs-alias matches
#   stay confined to the ≤20-name prefix group (10 digits + 10
#   letters), constant in K → output linear in K. i≥2 rewrites the
#   digit tail with the globally-unique (base key, replica) pair —
#   unique names, so no accidental exact-name pairs.
# - part.p_brand: replicas i>0 get a replica-scoped brand. The
#   substitution family joins on (brand, price band); scoping the
#   brand makes replica markets disjoint, so its output is EXACTLY
#   K · base (a price jitter alone leaves K² cross-replica
#   accidental band matches — the density in log-price space grows
#   K× and pair counts are density-squared).
# - embeddings.embedding: hash-seeded uniform noise per component,
#   magnitude 0.02/0.05 for i=1,2 (near-neighbours) and 0.5 beyond
#   (unrelated), applied before any consumer normalizes.
_DOC_STEP = (
    "CASE WHEN r.i = 1 THEN 12 WHEN r.i = 2 THEN 6 WHEN r.i = 3 THEN 4 "
    "ELSE 1 END"
)
PERTURB = {
    "documents": {
        "text": f"""
CASE WHEN r.i = 0 THEN text ELSE array_to_string(
  list_transform(string_split(text, ' '), (w, ix) ->
    CASE WHEN (ix + doc_id + r.i) % ({_DOC_STEP}) = 0
         THEN concat('q', CAST(hash(doc_id * 131071 + r.i * 8191 + ix)
                               % 99991 AS VARCHAR), 'z')
         ELSE w END), ' ') END""",
        # n_chars tracks the rewritten text (filled in below)
    },
    "customer": {
        "c_name": """
CASE WHEN r.i = 0 THEN c_name
     WHEN r.i = 1 THEN concat(
            substring(c_name, 1, length(c_name) - 1),
            translate(substring(c_name, length(c_name), 1),
                      '0123456789', 'abcdefghij'))
     ELSE concat(substring(c_name, 1, greatest(length(c_name) - 6, 1)),
                 CAST(c_custkey AS VARCHAR), 'r', CAST(r.i AS VARCHAR)) END""",
    },
    "part": {
        "p_brand": """
CASE WHEN r.i = 0 THEN p_brand
     ELSE concat(p_brand, '~', CAST(r.i AS VARCHAR)) END""",
        "p_name": """
CASE WHEN r.i = 0 THEN p_name
     ELSE concat(p_name, ' v', CAST(r.i AS VARCHAR)) END""",
    },
    "embeddings": {
        "embedding": """
CASE WHEN r.i = 0 THEN embedding ELSE
  list_transform(embedding, (x, j) -> CAST(x +
    (CASE WHEN r.i = 1 THEN 0.02 WHEN r.i = 2 THEN 0.05 ELSE 0.5 END)
    * ((CAST(hash(vec_id * 1000003 + j * 131 + r.i) % 20001 AS DOUBLE)
        - 10000.0) / 10000.0) AS FLOAT)) END""",
    },
}


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--perturb"]
    perturb = "--perturb" in sys.argv
    k = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    dst = args[2] if len(args) > 2 else "/tmp/spark_graft_sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keys in OFFSETS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        rewrites = PERTURB.get(t, {}) if perturb else {}
        parts = []
        for c in cols:
            if c in keys:
                parts.append(f"({c} + r.i * {UNIT}) AS {c}")
            elif perturb and t == "documents" and c == "n_chars":
                parts.append(f"length({rewrites['text']}) AS n_chars")
            elif c in rewrites:
                parts.append(f"({rewrites[c]}) AS {c}")
            else:
                parts.append(c)
        proj = ", ".join(parts)
        # one ROW_GROUP per ~122k rows default; write with per-replica
        # parallelism so the big tables don't serialize through one
        # writer thread
        con.execute(
            f"COPY (SELECT {proj}"
            f" FROM read_parquet('{src}/{t}.parquet'),"
            f" (SELECT unnest(range(0, {k})) AS i) r)"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")


if __name__ == "__main__":
    main()
