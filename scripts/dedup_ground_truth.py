#!/usr/bin/env python
"""Exact near-dup ground truth for a replica-structured corpus
(make_realistic_corpus.py / make_scale_data.py --perturb layouts).

The corpus construction bounds where true near-dup pairs can live:
replicas of base doc d carry doc_id = d + i*10^12, and only family
members share a text lineage (filler vocabularies are disjoint by
hash; the sampled background Jaccard distribution is recorded
alongside). This verifier therefore computes the EXACT 5-gram Jaccard
for every within-family pair — 5,000 families × C(4,2) pairs at the
sf10r shape, trivially parallel and linear in corpus size — and emits
the ground-truth pair set an engine's output can be compared against,
plus the background-similarity sample that bounds cross-family pairs
away from the threshold.

This is deliberately NOT the engine's code path (no Spark, no MinHash,
no prefix filter): python sets + exact rational arithmetic, the same
role the DuckDB naive oracle plays at small SF where it is affordable.

Usage: python scripts/dedup_ground_truth.py [SF_DIR] [--out FILE]
"""

from __future__ import annotations

import json
import random
import sys

import duckdb

UNIT = 1_000_000_000_000
SHINGLE_W = 5
THRESHOLD_PPM = 400_000
FAMILY_MAX_I = 3  # replicas 0..3 form the near-dup family
BG_SAMPLE_DOCS = 500
BG_SAMPLE_PAIRS = 20_000


def shingles(t: str) -> set[str]:
    if len(t) < SHINGLE_W:
        return set()
    return {t[i : i + SHINGLE_W] for i in range(len(t) - SHINGLE_W + 1)}


def jac_ppm(a: set[str], b: set[str]) -> int:
    inter = len(a & b)
    union = len(a) + len(b) - inter
    if union == 0:
        return 0
    # exact integer image of FLOOR(1e6 * inter/union + 0.5)
    return (2_000_000 * inter + union) // (2 * union)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10r"
    out = (
        sys.argv[sys.argv.index("--out") + 1]
        if "--out" in sys.argv
        else "/tmp/dedup_ground_truth.json"
    )
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    fam_rows = con.execute(
        f"""SELECT doc_id, text
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE doc_id // {UNIT} <= {FAMILY_MAX_I}
        ORDER BY doc_id"""
    ).fetchall()
    fams: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in fam_rows:
        fams.setdefault(doc_id % UNIT, []).append((doc_id, text))

    true_pairs: list[tuple[int, int, int]] = []
    n_checked = 0
    for base, members in fams.items():
        shs = [(i, shingles(t)) for i, t in members]
        for x in range(len(shs)):
            for y in range(x + 1, len(shs)):
                n_checked += 1
                ppm = jac_ppm(shs[x][1], shs[y][1])
                if ppm >= THRESHOLD_PPM:
                    a, b = shs[x][0], shs[y][0]
                    true_pairs.append((min(a, b), max(a, b), ppm))

    # background sample: cross-family / filler pairs must sit far
    # below the threshold for the family restriction to be exhaustive
    bg = con.execute(
        f"""SELECT text FROM read_parquet('{sf_dir}/documents.parquet')
        USING SAMPLE {BG_SAMPLE_DOCS}"""
    ).fetchall()
    sets = [shingles(r[0]) for r in bg]
    rng = random.Random(0)
    mx, above, tot = 0, 0, 0
    for _ in range(BG_SAMPLE_PAIRS):
        i, j = rng.sample(range(len(sets)), 2)
        ppm = jac_ppm(sets[i], sets[j])
        mx = max(mx, ppm)
        tot += 1
        above += ppm >= THRESHOLD_PPM

    result = {
        "sf_dir": sf_dir,
        "n_families": len(fams),
        "n_family_pairs_checked": n_checked,
        "n_true_pairs": len(true_pairs),
        "true_pairs_sha": __import__("hashlib")
        .sha256(
            "\n".join(f"{a},{b},{p}" for a, b, p in sorted(true_pairs)).encode()
        )
        .hexdigest()[:16],
        "bg_sample_pairs": tot,
        "bg_max_jaccard_ppm": mx,
        "bg_pairs_at_threshold": above,
        "threshold_ppm": THRESHOLD_PPM,
    }
    with open(out, "w") as fh:
        json.dump({"summary": result, "true_pairs": true_pairs}, fh)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
