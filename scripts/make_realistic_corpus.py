#!/usr/bin/env python
"""Generate a non-degenerate ~500k-doc text corpus ("sf10r") for the
banded-dedup 100×-scale datapoint, WITHOUT touching /root/testdata.

Why a third corpus shape exists (verbatim → perturbed → realistic):

- sf10 (verbatim clones): every doc gains K−1 exact copies → pair
  output is C(K,2)-quadratic BY DATA; the enumeration guards refuse,
  correctly.
- sf10p (--perturb): family near-dup pair counts are bounded (base +
  replicas 1-3), but the i≥4 "unrelated filler" is hash-noise tokens
  (``q84351z``) whose character-5-gram space is digit patterns — a
  few thousand distinct shingles — so ANY two filler docs share
  shingles and background Jaccard sits at ~0.07 (p99 0.124, measured).
  The driver's base text has the same property for a different
  reason: a ~40-word template vocabulary puts background J at 0.083
  between EVERY base pair. MinHash banding collides a J=0.08 pair per
  band with p = J² ≈ 0.6%, so 4 bands × C(500k,2) pairs ≈ 1.2e9
  band-join rows — the band-bucket guard refuses at 2e8, correctly:
  the corpus is candidate-dense BY SHINGLE-SPACE SHAPE, independent
  of true duplication (DEDUP_SCALE_100X.json carries the numbers).
- sf10r (this script): same bounded families as --perturb (base +
  replicas 1-3 via the identical STEP-12/6/4 token rewrite), but the
  480k filler docs are drawn the way real corpora grow — per-doc
  topical vocabularies over a letters-only word space (26^k shingle
  diversity) plus a tiny shared-stopword mass — so background J
  between unrelated docs is ~0.01 and the SAME 8-hash/4-band code
  path prunes C(500k,2) ≈ 1.25e11 possible pairs to a few tens of
  millions of band candidates. No engine knob changes: this is the
  corpus shape where banding is supposed to work, and the artifact
  shows it completing under the default guards.

Structure (all pure functions of (base doc_id, replica i, position) —
regeneration is byte-identical):

- replicas i=0..3 of each sf0.1 base doc: the --perturb family rule
  (i=0 verbatim; i=1/2/3 replace every 12th/6th/4th token with a
  replica-scoped synthetic token) → ≤ C(4,2) true near-dup pairs per
  family, linear in corpus size.
- replicas i=4..99: filler doc with topic t = hash(d,i) of 3000
  topics; ~48 words/doc, 80% from the topic's 200-word slice of a
  600k-word letters-only vocabulary, 20% from a per-doc 25-word
  subset of a 500-word stopword pool. Two cross-topic docs share
  ~1-2 stopwords → J ≈ 0.01; same-topic docs (~160 per topic) share
  ~12% of words → J ≈ 0.1-0.2, far below the 0.4 threshold, and
  their band-collision mass is bounded by topic size, not corpus
  size.

doc_id = base + i·10^12 (the make_scale_data.py replica convention),
so family membership stays recoverable as doc_id % 10^12 and the
numpy ground-truth verifier can enumerate every candidate family.

Usage: python scripts/make_realistic_corpus.py [K] [SRC] [DST]
Defaults: K=100, SRC=/root/testdata/sf0.1, DST=/tmp/spark_graft_sf10r
"""

from __future__ import annotations

import os
import sys

import duckdb

UNIT = 1_000_000_000_000
N_TOPICS = 3000
TOPIC_WORDS = 200
STOP_POOL = 500
STOP_SUBSET = 25
STOP_FRAC_PCT = 20  # % of filler positions drawn from stopwords

# family rewrite (identical rule to make_scale_data.py --perturb)
_DOC_STEP = (
    "CASE WHEN r.i = 1 THEN 12 WHEN r.i = 2 THEN 6 WHEN r.i = 3 THEN 4 "
    "ELSE 1 END"
)
_FAMILY_TEXT = f"""
CASE WHEN r.i = 0 THEN text ELSE array_to_string(
  list_transform(string_split(text, ' '), (w, ix) ->
    CASE WHEN (ix + doc_id + r.i) % ({_DOC_STEP}) = 0
         THEN concat('q', CAST(hash(doc_id * 131071 + r.i * 8191 + ix)
                               % 99991 AS VARCHAR), 'z')
         ELSE w END), ' ') END"""

# letters-only word rendering: global word id w -> 6-8 lowercase
# letters (content) / 3-5 letters (stopwords). 26^6 ≈ 3e8 shingle
# space, so distinct words almost never share 5-grams by accident.
_CONTENT_WORD = """
array_to_string(list_transform(range(0, 6 + {w} % 3),
  j -> chr(97 + CAST(hash({w} * 31 + j) % 26 AS INT))), '')"""
_STOP_WORD = """
array_to_string(list_transform(range(0, 3 + {s} % 3),
  j -> chr(97 + CAST(hash(900000007 + {s} * 37 + j) % 26 AS INT))), '')"""

_FILLER_TEXT = f"""
array_to_string(list_transform(range(0, 40 + CAST(hash(doc_id * 7 + r.i) % 41 AS INT)),
  p -> CASE WHEN hash(doc_id * 104729 + r.i * 613 + p * 7) % 100 < {STOP_FRAC_PCT}
       THEN ({_STOP_WORD.format(
           s=f"CAST(hash(doc_id * 15485863 + r.i * 97 + (hash(doc_id * 104729 + r.i * 613 + p * 7 + 1) % {STOP_SUBSET})) % {STOP_POOL} AS BIGINT)"
       )})
       ELSE ({_CONTENT_WORD.format(
           w=(
               f"(CAST(hash(doc_id * 96 + r.i) % {N_TOPICS} AS BIGINT) * {TOPIC_WORDS}"
               f" + CAST(hash(doc_id * 2654435761 + r.i * 40503 + p * 2246822519) % {TOPIC_WORDS} AS BIGINT))"
           )
       )}) END), ' ')"""


def main() -> None:
    argv = sys.argv[1:]
    k = int(argv[0]) if len(argv) > 0 else 100
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    dst = argv[2] if len(argv) > 2 else "/tmp/spark_graft_sf10r"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    text_expr = f"""
CASE WHEN r.i <= 3 THEN ({_FAMILY_TEXT}) ELSE ({_FILLER_TEXT}) END"""
    con.execute(
        f"""
COPY (
  SELECT doc_id + i * {UNIT} AS doc_id,
         t AS text, lang, source, length(t) AS n_chars
  FROM (
    SELECT doc_id, r.i AS i, ({text_expr}) AS t, lang, source
    FROM read_parquet('{src}/documents.parquet'),
         (SELECT unnest(range(0, {k})) AS i) r
  )
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    n, fam = con.execute(
        f"""SELECT COUNT(*),
               SUM(CASE WHEN doc_id // {UNIT} <= 3 THEN 1 ELSE 0 END)
        FROM read_parquet('{dst}/documents.parquet')"""
    ).fetchone()
    print(f"documents: {n} rows ({fam} in families of 4, rest filler)")


if __name__ == "__main__":
    main()
