#!/usr/bin/env python
"""Generate a 10×-scale (sf1-equivalent) copy of the driver's sf0.1
testdata for scale-stress sweeps, WITHOUT touching /root/testdata.

Method: replicate each fact/dim table K times with deterministic key
offsets chosen per-table so every foreign key stays consistent inside
its replica (replica i's lineitem rows reference replica i's orders/
part/supplier, etc.). Fixed-cardinality dims (region, nation) are NOT
replicated — exactly how a real corpus scales. Text/embedding payloads
repeat verbatim, which deliberately makes the dedup family's job
non-trivial at scale (each doc gains K−1 exact duplicates with
distinct doc_ids).

Correctness at the new scale is still checked the usual way — Spark
vs DuckDB on the SAME generated parquet — so replica artifacts cannot
bias the comparison.

Usage: python scripts/make_scale_data.py [K] [SRC] [DST]
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


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_sf1"
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
        proj = ", ".join(
            f"({c} + r.i * {UNIT}) AS {c}" if c in keys else c for c in cols
        )
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
