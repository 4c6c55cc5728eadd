"""Salting rewrites must be result-identical to the plain plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from the_hive_spark.functions.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """1000 rows for the hot key, a few for the rest."""
    hot = spark.range(1000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).alias("v")
    )
    cold = spark.range(20).select(
        F.concat(F.lit("c"), (F.col("id") % 5).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold).cache()


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed, ["k"],
            {"n": ("v", "count"), "s": ("v", "sum"),
             "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_nondecomposable(skewed):
    with pytest.raises(ValueError, match="unsupported"):
        salted_agg(skewed, ["k"], {"a": ("v", "avg")})


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("c0", "C0"), ("c3", "C3"), ("absent", "A")],
        "k string, label string",
    )
    plain = sorted(
        (r["k"], r["v"], r["label"])
        for r in skewed.join(dim, "k", "inner").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_join(skewed, dim, "k", n_salts=8).collect()
    )
    assert salted == plain
    # left join parity incl. unmatched fact rows
    plain_left = sorted(
        (r["k"], r["v"], r["label"])
        for r in skewed.join(dim, "k", "left").collect()
    )
    salted_left = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_join(skewed, dim, "k", n_salts=8, how="left").collect()
    )
    assert salted_left == plain_left


def test_salted_join_spreads_hot_key(spark, skewed):
    from the_hive_spark.functions.skew import _salt_col

    hot = skewed.filter(F.col("k") == "hot")
    n_buckets = (
        hot.withColumn("_salt", _salt_col(hot, 8))
        .select("_salt").distinct().count()
    )
    assert n_buckets > 1, "hot key must spread across salt buckets"
