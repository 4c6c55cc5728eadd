"""Entity resolution: blocked fuzzy matching over dimension tables.

Record linkage is the curation-pipeline step the relational surface
needs before any cross-source join: the same real-world entity arrives
spelled slightly differently per feed, and the join that reconciles
them cannot be an all-pairs edit-distance scan. The standard shape
(Fellegi-Sunter linkage; Christen, "Data Matching", ch. 4) is
*blocking* — a cheap exact key that every true match provably shares —
followed by exact verification inside each block.

Here the matcher finds equal-length name pairs at Hamming distance ≤ 1
(single-character typos / OCR substitutions) with masked-position
blocking, the Hamming image of FastSS's deletion neighborhoods
(Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007):
for every position i, emit the name with character i replaced by a
sentinel — two equal-length names at distance ≤ 1 share the masked
form at the differing position (identical names share all of them).

Why masking and not the half-split pigeonhole used for SimHash chunks
(operators/dedup.py): pigeonhole block keys carry only HALF the
string's entropy, so low-entropy regions (a shared "Customer#000…"
prefix — or any fixed schema prefix in real feeds) collapse into one
giant block and the candidate join goes quadratic — measured 689 s at
sf0.1. A masked key carries ALL of the string except one character,
which makes the scheme *output-optimal*: two rows share a block key
only if they are already a genuine distance-≤1 match, so the join
emits true pairs (×len duplicates for identical names, deduped) and
nothing else. The key stream is len(name) rows per name — the same
fan-out class as shingling, repartitioned before the explode.

Scale: the block join is a plain equi-join on (len, position, masked
string); block size equals true-match multiplicity, so there is no
hot-key pathology to salt — skew in this join IS the answer set.
The DuckDB oracle runs the same masked-key generation (it is the
standard algorithm) and the `levenshtein` verification makes any
blocking bug a visible hash mismatch rather than a silent recall loss.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from the_hive_spark.registry import query
from the_hive_spark.tables import table

# \x01 never occurs in the data; masking with it can't create
# accidental equalities with unmasked characters.
_MASKED_ORACLE = """
WITH m AS (
  SELECT c_custkey, c_name, i,
         substring(c_name, 1, i - 1) || chr(1) || substring(c_name, i + 1)
           AS masked,
         length(c_name) AS len
  FROM customer, unnest(range(1, length(c_name) + 1)) AS t(i)
), cand AS (
  SELECT DISTINCT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b
  FROM m a JOIN m b
    ON a.len = b.len AND a.i = b.i AND a.masked = b.masked
   AND a.c_custkey < b.c_custkey
)
SELECT c.custkey_a, c.custkey_b,
       CAST(levenshtein(ca.c_name, cb.c_name) AS BIGINT) AS edit_distance
FROM cand c
JOIN customer ca ON ca.c_custkey = c.custkey_a
JOIN customer cb ON cb.c_custkey = c.custkey_b
WHERE levenshtein(ca.c_name, cb.c_name) <= 1
"""


@query("cust_fuzzy_match_pairs", oracle=_MASKED_ORACLE)
def cust_fuzzy_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-name fuzzy self-match: equal-length pairs at edit
    distance ≤ 1, via masked-position blocking + levenshtein
    verification — the record-linkage candidate join (see module
    docstring for why masking beats half-split pigeonhole blocking).

    Physical plan: one scan fans out to len(name) masked block keys
    per row (in-row transform + posexplode, repartitioned first); the
    self-join on (len, i, masked) only ever pairs rows that already
    match at distance ≤ 1; pair-level dedup + a JVM-side
    `levenshtein` check produce the verified result. No cartesian, no
    full-name cross comparison, no hot-key salting needed — block
    cardinality equals answer multiplicity by construction.
    """
    n = spark.sparkContext.defaultParallelism
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    masked = (
        cust.repartition(n)
        .select(
            "c_custkey",
            "c_name",
            F.length("c_name").alias("len"),
            F.posexplode(
                F.expr(
                    "transform(sequence(1, length(c_name)),"
                    " i -> concat(substring(c_name, 1, i - 1), chr(1),"
                    " substring(c_name, i + 1)))"
                )
            ).alias("i", "masked"),
        )
    )
    a, b = masked.alias("a"), masked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.len") == F.col("b.len"))
            & (F.col("a.i") == F.col("b.i"))
            & (F.col("a.masked") == F.col("b.masked"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "edit_distance",
            F.levenshtein("name_a", "name_b").cast("bigint"),
        )
        .filter(F.col("edit_distance") <= 1)
        .select("custkey_a", "custkey_b", "edit_distance")
    )
