"""Vector similarity search over the ``embeddings`` table.

This is the Spark-native form of the reference's headline operator —
top-k cosine ANN against Qdrant (T1, internal/vectordb/vectordb.go:
198-290, cosine distance at :100) — plus the pairwise near-duplicate
variant the training-data pipeline needs.

Two precision modes:
- ``cosine_topk`` (library, full float precision) — the real search
  path; brute-force exact scan + TakeOrdered(k). At 100 TB the scan
  is embarrassingly parallel (no shuffle at all: map + per-partition
  top-k + driver merge of k·partitions rows).
- quantized registry queries — elements scaled to integer
  milli-units so dot products are exact int64 arithmetic and results
  hash identically on any engine/partitioning (the oracle contract).

The LSH-accelerated variant lives in the_hive_spark.functions.lsh
(bucketed random projection; normalize ⇒ euclidean NN ≈ cosine NN).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from the_hive_spark.registry import query
from the_hive_spark.tables import table

KNN_K = 10
NEAR_DUP_PPM = 950_000  # quantized-cosine ≥ 0.95

# --- full-precision primitives (library path) ---


def dot(a: str, b: str) -> Column:
    """Sequential-fold dot product of two float-array columns (JVM-side,
    no UDF): aggregate(zip_with(a,b,*), 0.0, +)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )


def l2_norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = KNN_K
) -> DataFrame:
    """Exact top-k cosine against a literal query vector (T1 parity).

    The plan is scan → project score → TakeOrderedAndProject: linear,
    shuffle-free, and the filter/column pruning reach the parquet scan.
    """
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.withColumn("_q", qcol).withColumn(
        "score", cosine("embedding", "_q")
    ).drop("_q")
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)


# --- quantized (oracle-exact) registry queries ---

# integer milli-unit quantization of a float element
_Q_SPARK = "CAST(FLOOR(CAST({x} AS DOUBLE) * 1000 + 0.5) AS BIGINT)"
_Q_DUCK = "CAST(FLOOR(CAST({x} AS DOUBLE) * 1000 + 0.5) AS BIGINT)"


def _qdot_spark(a: str, b: str) -> str:
    xa = _Q_SPARK.format(x="x")
    xb = _Q_SPARK.format(x="y")
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> {xa} * {xb}), 0L, (acc, v) -> acc + v)"
    )


def _qdot_duck(a: str, b: str) -> str:
    ea = _Q_DUCK.format(x=f"{a}[i]")
    eb = _Q_DUCK.format(x=f"{b}[i]")
    return f"list_sum(list_transform(range(1, len({a}) + 1), i -> {ea} * {eb}))"


@query(
    "emb_knn_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       CAST(FLOOR(1000000.0 * {_qdot_duck("embedding", "qv")}
            / sqrt(CAST({_qdot_duck("embedding", "embedding")} AS DOUBLE)
                   * {_qdot_duck("qv", "qv")}) + 0.5) AS BIGINT) AS cos_ppm
FROM embeddings CROSS JOIN q
WHERE vec_id != 0
ORDER BY cos_ppm DESC, vec_id
LIMIT {KNN_K}
""",
)
def emb_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force k-NN: top-10 quantized-cosine neighbors of vec_id 0.

    Shape matches T1 (scan + score + LIMIT k): Spark executes it as a
    broadcast of the 1-row query side, then TakeOrdered — zero
    shuffles of the big side.
    """
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cos_ppm",
            F.expr(
                f"CAST(FLOOR(1000000.0 * {_qdot_spark('embedding', 'qv')}"
                f" / sqrt(CAST({_qdot_spark('embedding', 'embedding')} AS DOUBLE)"
                f" * {_qdot_spark('qv', 'qv')}) + 0.5) AS BIGINT)"
            ),
        )
    )
    return (
        scored.select("vec_id", "label", "cos_ppm")
        .orderBy(F.desc("cos_ppm"), F.asc("vec_id"))
        .limit(KNN_K)
    )


@query(
    "emb_near_dup_pairs",
    oracle=f"""
WITH qn AS (
  SELECT vec_id, embedding,
         CAST({_qdot_duck("embedding", "embedding")} AS BIGINT) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(FLOOR(1000000.0 * {_qdot_duck("a.embedding", "b.embedding")}
            / sqrt(CAST(a.nrm AS DOUBLE) * b.nrm) + 0.5) AS BIGINT) AS cos_ppm
FROM qn a JOIN qn b ON a.vec_id < b.vec_id
WHERE FLOOR(1000000.0 * {_qdot_duck("a.embedding", "b.embedding")}
      / sqrt(CAST(a.nrm AS DOUBLE) * b.nrm) + 0.5) >= {NEAR_DUP_PPM}
""",
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (quantized cosine ≥ 0.95).

    Brute-force O(n²) is the correctness baseline; the scale path is
    LSH bucketing (functions.lsh) which prunes the pair space before
    this same exact score re-checks candidates.
    """
    emb = table(spark, sf_dir, "embeddings")
    qn = emb.select(
        "vec_id",
        "embedding",
        F.expr(_qdot_spark("embedding", "embedding")).cast("bigint").alias("nrm"),
    )
    a = qn.alias("a")
    b = qn.alias("b")
    cos_ppm = F.expr(
        f"CAST(FLOOR(1000000.0 * {_qdot_spark('a.embedding', 'b.embedding')}"
        f" / sqrt(CAST(a.nrm AS DOUBLE) * b.nrm) + 0.5) AS BIGINT)"
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos_ppm.alias("cos_ppm"),
        )
        .filter(F.col("cos_ppm") >= NEAR_DUP_PPM)
    )


@query(
    "emb_near_dup_lsh",
    oracle=f"""
WITH qn AS (
  SELECT vec_id, embedding,
         CAST({_qdot_duck("embedding", "embedding")} AS BIGINT) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(FLOOR(1000000.0 * {_qdot_duck("a.embedding", "b.embedding")}
            / sqrt(CAST(a.nrm AS DOUBLE) * b.nrm) + 0.5) AS BIGINT) AS cos_ppm
FROM qn a JOIN qn b ON a.vec_id < b.vec_id
WHERE FLOOR(1000000.0 * {_qdot_duck("a.embedding", "b.embedding")}
      / sqrt(CAST(a.nrm AS DOUBLE) * b.nrm) + 0.5) >= {NEAR_DUP_PPM}
""",
)
def emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-pruned near-duplicate pairs, exact-verified — same results
    as the brute-force ``emb_near_dup_pairs`` (hence the identical
    oracle), but the pair space is generated by the banded-signature
    equi-join instead of the O(n²) cross join, which is the shape that
    survives a 100× scale-up (functions/lsh.py).

    Banding 48 planes × 12 bands keeps the per-pair miss probability
    below 3e-6 at the 0.95 threshold; recall on planted duplicates is
    asserted in tests/test_lsh.py.
    """
    from the_hive_spark.functions.lsh import lsh_near_dup_candidates

    emb = table(spark, sf_dir, "embeddings")
    cand = lsh_near_dup_candidates(
        emb, id_col="vec_id", vec_col="embedding", n_planes=48, n_bands=12
    )
    cos_ppm = F.expr(
        f"CAST(FLOOR(1000000.0 * {_qdot_spark('vec_a', 'vec_b')}"
        f" / sqrt(CAST({_qdot_spark('vec_a', 'vec_a')} AS DOUBLE)"
        f" * {_qdot_spark('vec_b', 'vec_b')}) + 0.5) AS BIGINT)"
    )
    return (
        cand.withColumn("cos_ppm", cos_ppm)
        .filter(F.col("cos_ppm") >= NEAR_DUP_PPM)
        .select("id_a", "id_b", "cos_ppm")
        .withColumnRenamed("id_a", "vec_a")
        .withColumnRenamed("id_b", "vec_b")
    )


@query("emb_ann_lsh_topk")  # approximate ⇒ no SQL oracle (rows-only check)
def emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-table sign-random-projection LSH
    (L=16 tables × 6 bits, OR-matched), exact cosine re-rank.

    Deliberately registered without an oracle: recall < 1 by design
    (~0.9 on this corpus), so no SQL can reproduce it exactly. The
    recall floor against the exact path is enforced in
    tests/test_lsh.py instead.
    """
    from the_hive_spark.functions.lsh import ann_topk_lsh

    emb = table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    qv = [float(x) for x in row["embedding"]]
    return (
        ann_topk_lsh(
            emb.filter(F.col("vec_id") != 0),
            qv,
            k=KNN_K,
            n_planes=6,
            n_tables=16,
        )
        .select("vec_id", "label", F.col("score").cast("double").alias("score"))
    )


@query(
    "emb_label_stats",
    oracle=f"""
SELECT label, COUNT(*) AS n_vectors,
       CAST(SUM(CAST({_qdot_duck("embedding", "embedding")} AS BIGINT)) AS BIGINT) AS total_sq_norm_milli,
       CAST(MIN(vec_id) AS BIGINT) AS min_vec_id
FROM embeddings
GROUP BY label
""",
)
def emb_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats (the grouping side of IVF-style indexing)."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.expr(_qdot_spark("embedding", "embedding")))
        .cast("bigint")
        .alias("total_sq_norm_milli"),
        F.min("vec_id").cast("bigint").alias("min_vec_id"),
    )
