#!/usr/bin/env python
"""Realistic-corpus scale datapoint for the fuzzy-ER family
(r10 VERDICT ask #3 — the ER replay of the sf10r treatment).

The sf10 clone corpus (100 identical copies of every customer name)
cancels the ER chain at 900 s by DATA-quadratics: a million-copy name
really does own C(K,2) true pairs, and no algorithm emits fewer rows
than its answer. What that cancellation could NOT show is whether the
masked-position blocking prunes on a corpus shaped like real feeds —
typo families over a large distinct-name space. This script builds
one, enumerates the exact ground truth with an independent pure-Python
reference of the standard algorithm, and runs the full chain
(cust_fuzzy_match_pairs → cust_linkage_fs_scores → cust_er_clusters3
→ cust_golden_record) to completion at 500k records.

Corpus (pure function of the seed):
- E entities with UNIQUE base names "first last" drawn index-wise from
  letters-only word pools (2,000 × 10,000 — no two entities share a
  base name by construction; near-miss names across entities arise
  naturally from pool collisions at Hamming 1, and the truth counts
  them).
- Each entity emits 1 + extra records; extras are graded by edit
  type, only some of which are inside the matcher's contract
  (equal-length Hamming ≤ 1):
    exact copy        → in contract (distance 0)
    substitution      → in contract (Hamming 1)
    transposition     → OUT (Levenshtein 2 / Damerau 1)
    deletion          → OUT (length changes)
  The out-of-contract share is the point: the artifact reports recall
  per edit type, so "blocking recall 1.0" is explicitly a statement
  about the contract, and the transposition/deletion miss rate is a
  measured property, not a surprise.

Ground truth: an independent dict-based implementation of
masked-position blocking over distinct names (the textbook algorithm
the DuckDB oracle also runs, here in pure Python so it scales past
what DuckDB finishes at sf0.01) + expansion through name→record
groups. The Spark pair set must equal it EXACTLY (missing = extra =
0): the blocking is output-optimal, not approximate.

Writes ER_SCALE_REALISTIC.json.
Usage: python scripts/er_scale_eval.py [--n 500000] [--out FILE]
"""

from __future__ import annotations

import json
import os
import string
import sys
import time
from collections import defaultdict
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEED = 0xE8C0DE
LETTERS = string.ascii_lowercase
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
# per-extra edit-type mix: the in-contract share is what the matcher
# is specified to find; the rest measures the contract boundary
EDIT_TYPES = ["exact", "sub", "sub", "transpose", "delete"]


def _load() -> dict:
    la = os.getloadavg()
    return {"load1": round(la[0], 2), "load5": round(la[1], 2)}


def _word(rng, lo, hi) -> str:
    return "".join(rng.choice(list(LETTERS), size=rng.integers(lo, hi + 1)))


def make_corpus(n: int, out_dir: str):
    """Deterministic 500k-record customer table with typo families.
    Returns (records list of dicts, truth metadata)."""
    rng = np.random.default_rng(SEED)
    first = ["".join(w) for w in
             (_word(rng, 4, 7) for _ in range(2000))]
    last = ["".join(w) for w in
            (_word(rng, 5, 9) for _ in range(10000))]

    records = []  # (custkey, name, nationkey, acctbal_cents, segment)
    rec_entity = []  # entity id per record
    rec_edit = []  # edit type per record ("base" for the seed record)
    e = 0
    while len(records) < n:
        base = f"{first[e % 2000]} {last[(e // 2000) % 10000]}"
        # family size: 60% singleton, 30% small, 10% larger
        u = rng.random()
        fam = 1 if u < 0.6 else int(rng.integers(2, 5)) if u < 0.9 \
            else int(rng.integers(5, 9))
        nat = int(rng.integers(0, 25))
        seg = SEGMENTS[int(rng.integers(0, 5))]
        for k in range(min(fam, n - len(records))):
            name = base
            etype = "base"
            if k > 0:
                etype = EDIT_TYPES[int(rng.integers(0, len(EDIT_TYPES)))]
                chars = list(base)
                if etype == "sub":
                    p = int(rng.integers(0, len(chars)))
                    old = chars[p]
                    repl = LETTERS[int(rng.integers(0, 26))]
                    while repl == old:
                        repl = LETTERS[int(rng.integers(0, 26))]
                    chars[p] = repl
                elif etype == "transpose":
                    ps = [i for i in range(len(chars) - 1)
                          if chars[i] != chars[i + 1]]
                    if ps:
                        p = ps[int(rng.integers(0, len(ps)))]
                        chars[p], chars[p + 1] = chars[p + 1], chars[p]
                    else:
                        etype = "exact"
                elif etype == "delete":
                    p = int(rng.integers(0, len(chars)))
                    del chars[p]
                name = "".join(chars)
            # attributes: families mostly agree (FS scoring substrate)
            r_nat = nat if rng.random() < 0.9 else int(rng.integers(0, 25))
            r_seg = seg if rng.random() < 0.85 else \
                SEGMENTS[int(rng.integers(0, 5))]
            bal = int(rng.integers(-99999, 999999))  # cents
            records.append((len(records) + 1, name, r_nat, bal, r_seg))
            rec_entity.append(e)
            rec_edit.append(etype)
        e += 1

    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdir = os.path.join(out_dir, "customer.parquet")
        os.makedirs(pdir, exist_ok=True)
        perm = np.random.default_rng(SEED + 1).permutation(len(records))
        n_files = 32
        bounds = np.linspace(0, len(records), n_files + 1).astype(int)
        for f in range(n_files):
            sel = perm[bounds[f]:bounds[f + 1]]
            tbl = pa.table({
                "c_custkey": pa.array(
                    [records[i][0] for i in sel], type=pa.int64()),
                "c_name": pa.array([records[i][1] for i in sel]),
                "c_nationkey": pa.array(
                    [records[i][2] for i in sel], type=pa.int32()),
                "c_acctbal": pa.array(
                    [records[i][3] / 100.0 for i in sel], type=pa.float64()),
                "c_mktsegment": pa.array([records[i][4] for i in sel]),
            })
            pq.write_table(tbl, os.path.join(pdir, f"part-{f:05d}.parquet"))
        with open(marker, "w") as fh:
            fh.write("ok")
    return records, rec_entity, rec_edit


def reference_pairs(records):
    """Independent pure-Python masked-position blocking over distinct
    names (the textbook algorithm, same as the DuckDB oracle's CTE):
    all equal-length name pairs at Hamming ≤ 1, expanded to record
    pairs + within-identical-name pairs. Returns a set of (a, b)."""
    by_name = defaultdict(list)
    for ck, name, *_ in records:
        by_name[name].append(ck)
    names = list(by_name)

    buckets = defaultdict(list)
    for idx, name in enumerate(names):
        for i in range(len(name)):
            buckets[(len(name), i, name[:i] + "\x01" + name[i + 1:])].append(idx)
    name_pairs = set()
    for members in buckets.values():
        if len(members) > 1:
            for x, y in combinations(members, 2):
                name_pairs.add((x, y) if names[x] < names[y] else (y, x))

    out = set()
    for x, y in name_pairs:
        # masked-form sharing at equal length IS Hamming ≤ 1; verify
        # anyway (the reference must not inherit the claim it checks)
        a, b = names[x], names[y]
        if sum(c1 != c2 for c1, c2 in zip(a, b)) > 1:
            continue
        for ca in by_name[a]:
            for cb in by_name[b]:
                out.add((min(ca, cb), max(ca, cb)))
    for name, cks in by_name.items():
        if len(cks) > 1:
            for ca, cb in combinations(sorted(cks), 2):
                out.add((ca, cb))
    return out


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag, default):
        return type(default)(argv[argv.index(flag) + 1]) if flag in argv else default

    n = opt("--n", 500_000)
    out_path = opt("--out", "ER_SCALE_REALISTIC.json")
    corpus_dir = opt("--corpus", f"/tmp/er_realistic_{n // 1000}k")

    report: dict = {"n_records": n, "seed": SEED, "load_start": _load()}

    t0 = time.perf_counter()
    records, rec_entity, rec_edit = make_corpus(n, corpus_dir)
    report["sec_corpus"] = round(time.perf_counter() - t0, 2)
    report["n_entities"] = len(set(rec_entity))
    from collections import Counter

    report["records_by_edit_type"] = dict(Counter(rec_edit))

    # ground truth: independent reference of the blocking contract
    t0 = time.perf_counter()
    truth = reference_pairs(records)
    report["sec_reference"] = round(time.perf_counter() - t0, 2)
    report["n_truth_pairs_contract"] = len(truth)

    # entity-level decomposition: which within-family record pairs are
    # inside/outside the contract (recall per edit type)
    ent_of = {records[i][0]: rec_entity[i] for i in range(len(records))}
    edit_of = {records[i][0]: rec_edit[i] for i in range(len(records))}
    fam_recs = defaultdict(list)
    for i in range(len(records)):
        fam_recs[rec_entity[i]].append(records[i][0])
    fam_pairs = set()
    for cks in fam_recs.values():
        if len(cks) > 1:
            for a, b in combinations(sorted(cks), 2):
                fam_pairs.add((a, b))
    report["n_within_family_pairs"] = len(fam_pairs)
    in_contract = fam_pairs & truth
    report["n_within_family_in_contract"] = len(in_contract)
    report["n_cross_entity_chance_pairs"] = len(truth - fam_pairs)
    by_type: dict = {}
    for a, b in fam_pairs:
        key = tuple(sorted((edit_of[a], edit_of[b])))
        k = "+".join(key)
        d = by_type.setdefault(k, {"total": 0, "in_contract": 0})
        d["total"] += 1
        d["in_contract"] += (a, b) in in_contract
    report["family_pairs_by_edit_type"] = {
        k: {**v, "contract_share": round(v["in_contract"] / v["total"], 4)}
        for k, v in sorted(by_type.items())
    }

    # the Spark chain, to completion, with walls
    from the_hive_spark import registry
    from the_hive_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="er-scale-eval")
    spark.sparkContext.setLogLevel("ERROR")

    report["queries"] = {}
    t0 = time.perf_counter()
    pairs_df = registry.QUERIES["cust_fuzzy_match_pairs"](spark, corpus_dir)
    got = {(r["custkey_a"], r["custkey_b"])
           for r in pairs_df.select("custkey_a", "custkey_b").collect()}
    sec = round(time.perf_counter() - t0, 2)
    report["queries"]["cust_fuzzy_match_pairs"] = {
        "rows": len(got), "sec": sec,
        "missing_vs_reference": len(truth - got),
        "extra_vs_reference": len(got - truth),
        "blocking_recall_contract": round(
            1 - len(truth - got) / max(len(truth), 1), 6),
    }
    print(json.dumps({"q": "pairs", **report["queries"]["cust_fuzzy_match_pairs"]}),
          flush=True)

    for qname in ("cust_linkage_fs_scores", "cust_er_clusters3",
                  "cust_golden_record"):
        t0 = time.perf_counter()
        df = registry.QUERIES[qname](spark, corpus_dir)
        rows = df.count()
        sec = round(time.perf_counter() - t0, 2)
        entry = {"rows": int(rows), "sec": sec}
        if qname == "cust_er_clusters3":
            entry["distribution"] = [
                [int(r["cluster_size"]), int(r["n_clusters"])]
                for r in df.orderBy("cluster_size").collect()
            ]
        report["queries"][qname] = entry
        print(json.dumps({"q": qname, **{k: entry[k] for k in ("rows", "sec")}}),
              flush=True)

    report["load_end"] = _load()
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
