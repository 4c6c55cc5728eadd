"""Entity resolution: blocked fuzzy matching over dimension tables.

Record linkage is the curation-pipeline step the relational surface
needs before any cross-source join: the same real-world entity arrives
spelled slightly differently per feed, and the join that reconciles
them cannot be an all-pairs edit-distance scan. The standard shape
(Fellegi-Sunter linkage; Christen, "Data Matching", ch. 4) is
*blocking* — a cheap exact key that every true match provably shares —
followed by exact verification inside each block.

Here the matcher finds equal-length name pairs at Hamming distance ≤ 1
(single-character typos / OCR substitutions) with the pigeonhole
blocking scheme: split each name into two halves — a pair differing in
at most one position must agree EXACTLY on at least one half, so two
equi-joins on (length, side, half) produce a candidate superset with
zero false negatives, and `levenshtein` verifies. This is the same
pigeonhole-banding family as the SimHash hamming pairs in
operators/dedup.py, applied to dimension-table strings.

Scale: the block join is a plain equi-join on bounded keys (half-name
strings), never all-pairs; block sizes bound the candidate fan-out the
way LSH band buckets do. The DuckDB oracle uses a *different* exact
algorithm (per-position masked keys) so parity is evidence the
blocking loses nothing, not a replay of the same plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from the_hive_spark.registry import query
from the_hive_spark.tables import table

# Oracle-side candidate generation: replace each character position
# with a sentinel (\x01 never occurs in the data); two equal-length
# strings at Hamming distance ≤1 share a masked form at the differing
# position (or at every position when identical).
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
    distance ≤ 1, found by half-name pigeonhole blocking + levenshtein
    verification — the record-linkage candidate join.

    Physical plan: one scan emits two (length, side, half-string)
    block keys per row (in-row explode); the self-join on the block
    key is a plain equi-join whose buckets are real name collisions,
    verified by a JVM-side `levenshtein` before emitting. No
    cartesian, no full-name cross comparison; at 100 TB block-key
    skew (a half shared by millions of names) is handled the same way
    as any hot join key — salting or AQE skew-join — without changing
    the algorithm.
    """
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # two halves per name: side 0 = first ⌈len/2⌉ chars, side 1 = rest
    blocks = cust.select(
        "c_custkey",
        "c_name",
        F.length("c_name").alias("len"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("side"),
                    F.expr(
                        "substring(c_name, 1, (length(c_name) + 1) div 2)"
                    ).alias("half"),
                ),
                F.struct(
                    F.lit(1).alias("side"),
                    F.expr(
                        "substring(c_name, (length(c_name) + 1) div 2 + 1)"
                    ).alias("half"),
                ),
            )
        ).alias("b"),
    ).select("c_custkey", "c_name", "len", "b.side", "b.half")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.len") == F.col("b.len"))
            & (F.col("a.side") == F.col("b.side"))
            & (F.col("a.half") == F.col("b.half"))
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
