#!/usr/bin/env python
"""Completing ≥10× datapoint for q_part_substitution_candidates on a
REALISTIC price distribution (r10 VERDICT ask #5).

The sf10 clone corpus gives every part 9 same-price clones, so the
qualifying pair set itself is C(10,2)-quadratic BY DATA (~4e8 pairs at
sf1 already) and the 900 s cancellation measures answer volume, not
the plan. Real catalogs don't price 10 SKUs identically per part: this
script generates 2M parts (10× the sf1 part table) with cents drawn
log-uniformly over a wide catalog envelope ($1–$10,000), the shape
where geometric log-price banding is designed to be output-
proportional, and runs the registered query to completion.

Verification is INDEPENDENT of the banding: at this density the top-50
by rel_diff_ppm are all exact-equal-cents pairs (rel_diff 0 ⇔ equal
cents under the integer ppm quantization), so a pandas
groupby(brand, cents) enumerates the zero tier exactly and replays the
query's deterministic tie-break (part_a, part_b ascending). The script
asserts the zero tier holds ≥50 pairs before trusting that shortcut.

Writes PART_SUBST_SCALE.json.
Usage: python scripts/part_subst_scale.py [--n 2000000] [--out FILE]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEED = 0x9A27
CENTS_LO, CENTS_HI = 100, 1_000_000  # $1 .. $10,000, log-uniform


def _load() -> dict:
    la = os.getloadavg()
    return {"load1": round(la[0], 2), "load5": round(la[1], 2)}


def make_parts(n: int, out_dir: str):
    """2M-part catalog: 25 TPC-H-style brands, log-uniform cent
    prices. Returns (partkey, brand_idx, cents) arrays."""
    rng = np.random.default_rng(SEED)
    partkey = np.arange(1, n + 1, dtype=np.int64)
    brand_idx = rng.integers(0, 25, size=n)
    cents = np.exp(
        rng.uniform(np.log(CENTS_LO), np.log(CENTS_HI), size=n)
    ).astype(np.int64)

    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdir = os.path.join(out_dir, "part.parquet")
        os.makedirs(pdir, exist_ok=True)
        brands = np.array(
            [f"Brand#{i // 5 + 1}{i % 5 + 1}" for i in range(25)])
        n_files = 32
        bounds = np.linspace(0, n, n_files + 1).astype(int)
        for f in range(n_files):
            s = slice(bounds[f], bounds[f + 1])
            tbl = pa.table({
                "p_partkey": pa.array(partkey[s], type=pa.int64()),
                "p_brand": pa.array(brands[brand_idx[s]]),
                "p_retailprice": pa.array(cents[s] / 100.0,
                                          type=pa.float64()),
            })
            pq.write_table(tbl, os.path.join(pdir, f"part-{f:05d}.parquet"))
        with open(marker, "w") as fh:
            fh.write("ok")
    return partkey, brand_idx, cents


def oracle_top50(partkey, brand_idx, cents):
    """Banding-independent top-50: enumerate the rel_diff=0 tier
    (equal brand+cents groups) and replay the tie-break."""
    import pandas as pd

    df = pd.DataFrame({"k": partkey, "b": brand_idx, "c": cents})
    # exact-cents duplicates round-trip through float64 dollars
    # losslessly (cents ≤ 1e6 ≪ 2^53)
    sizes = df.groupby(["b", "c"])["k"].apply(list)
    pairs = []
    for ks in sizes:
        if len(ks) > 1:
            ks = sorted(ks)
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    pairs.append((ks[i], ks[j]))
    assert len(pairs) >= 50, (
        f"zero tier has only {len(pairs)} pairs — the shortcut oracle "
        "does not apply at this density; use the exact sweep")
    pairs.sort()
    out = pairs[:50]
    brands = [f"Brand#{i // 5 + 1}{i % 5 + 1}" for i in range(25)]
    kmap_b = dict(zip(partkey.tolist(), brand_idx.tolist()))
    kmap_c = dict(zip(partkey.tolist(), cents.tolist()))
    return [
        (a, b, brands[kmap_b[a]], 0, 0) for a, b in out
    ], len(pairs)


def row_hash(rows) -> str:
    return hashlib.sha256(
        "\n".join(sorted(",".join(map(str, r)) for r in rows)).encode()
    ).hexdigest()[:16]


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag, default):
        return type(default)(argv[argv.index(flag) + 1]) if flag in argv else default

    n = opt("--n", 2_000_000)
    out_path = opt("--out", "PART_SUBST_SCALE.json")
    corpus_dir = opt("--corpus", f"/tmp/part_subst_{n // 1_000_000}m")

    report: dict = {
        "n_parts": n, "seed": SEED,
        "price_model": f"log-uniform cents [{CENTS_LO}, {CENTS_HI}]",
        "load_start": _load(),
    }
    t0 = time.perf_counter()
    partkey, brand_idx, cents = make_parts(n, corpus_dir)
    report["sec_corpus"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    oracle_rows, zero_tier = oracle_top50(partkey, brand_idx, cents)
    report["sec_oracle"] = round(time.perf_counter() - t0, 2)
    report["zero_tier_pairs"] = zero_tier
    report["oracle_hash"] = row_hash(oracle_rows)

    from the_hive_spark import registry
    from the_hive_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="part-subst-scale")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    got = (
        registry.QUERIES["q_part_substitution_candidates"](spark, corpus_dir)
        .select("part_a", "part_b", "p_brand",
                "price_diff_cents", "rel_diff_ppm")
        .collect()
    )
    report["sec_query"] = round(time.perf_counter() - t0, 2)
    got_rows = [tuple(r) for r in got]
    report["rows"] = len(got_rows)
    report["spark_hash"] = row_hash(got_rows)
    report["hash_match"] = report["spark_hash"] == report["oracle_hash"]
    print(json.dumps({"rows": len(got_rows),
                      "hash_match": report["hash_match"],
                      "sec_query": report["sec_query"]}), flush=True)

    # the intrinsic answer volume: full qualifying pair count (what the
    # clone corpus inflated to ~4e8 at sf1; realistic prices keep it
    # output-proportional at 10× the rows)
    import pyspark.sql.functions as F

    from the_hive_spark.operators.analytics import banded_substitution_pairs
    from the_hive_spark.tables import table

    p = table(spark, corpus_dir, "part").select(
        "p_partkey", "p_brand",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("bigint").alias("cents"),
    )
    t0 = time.perf_counter()
    report["qualifying_pairs_total"] = banded_substitution_pairs(p).count()
    report["sec_qualifying_count"] = round(time.perf_counter() - t0, 2)

    report["load_end"] = _load()
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
