"""Property tests for the cross-multiplied integer forms at extreme
magnitudes.

The determinism contract replaces float means/rates with integer
cross-multiplication (a/b < c/d ⇔ a·d < c·b, exact), which trades
float drift for int64 range. These tests sweep the exact expression
forms used by events_cusum_changepoint, doc_drift_ks_by_source,
events_weekday_seasonality and q_basket_affinity_lift at synthetic
magnitudes near their documented bounds:

- WITHIN the documented bound, Spark's bigint arithmetic must equal
  exact Python ints (no silent wrap, no float detour);
- BEYOND 2^63 the engine must fail LOUD (ANSI overflow error), never
  return a wrapped value — a correctness property at sf≥10⁴, where a
  silently wrapped CUSUM would flag the wrong changepoint.

Magnitudes are synthetic (a handful of rows carrying huge counts)
because the bounds sit at billions of input rows; the FORM, not the
data volume, is what's under test.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from py4j.protocol import Py4JJavaError

INT64_MAX = (1 << 63) - 1


def _one_row(spark, **cols):
    return spark.createDataFrame([tuple(cols.values())], list(cols.keys()))


# --- CUSUM form: SUM(n_errors·T − n_events·E) ------------------------

def test_cusum_form_exact_at_bound(spark):
    # documented bound: max_day·T < 2^63. Probe just inside it.
    t_all = 3_000_000_000  # 3e9 events
    e_all = 30_000_000
    days = [
        (1_000_000, 8_000),     # ordinary day
        (3_000_000_000 // 2, 40_000_000 // 2),  # monster day near bound
        (7, 0),
    ]
    df = spark.createDataFrame(days, ["n_events", "n_errors"])
    got = df.agg(
        F.sum(
            F.col("n_errors") * F.lit(t_all) - F.col("n_events") * F.lit(e_all)
        ).alias("cusum")
    ).collect()[0]["cusum"]
    want = sum(e * t_all - n * e_all for n, e in days)
    assert got == want
    assert abs(want) < INT64_MAX


def test_cusum_form_fails_loud_beyond_int64(spark):
    # max_day·T > 2^63 must raise (ANSI), not wrap.
    t_all = 1 << 40
    df = _one_row(spark, n_events=1 << 40, n_errors=0)
    with pytest.raises((Py4JJavaError, Exception), match="(?i)overflow"):
        df.select(
            (F.col("n_events") * F.lit(t_all)).alias("x")
        ).collect()


# --- KS form: |cum_s·n_all − cum_all·n_s| ----------------------------

def test_ks_form_exact_at_bound(spark):
    n_all = 3_000_000_000
    n_s = 2_999_999_999
    rows = [
        (1, 2),
        (n_s - 5, n_all - 17),
        (n_s, n_all),
    ]  # (cum_s, cum_all) ECDF steps
    df = spark.createDataFrame(rows, ["cum_s", "cum_all"])
    got = df.select(
        F.abs(
            F.col("cum_s") * F.lit(n_all) - F.col("cum_all") * F.lit(n_s)
        ).alias("d")
    ).agg(F.max("d").alias("m")).collect()[0]["m"]
    want = max(abs(cs * n_all - ca * n_s) for cs, ca in rows)
    assert got == want
    assert n_s * n_all < INT64_MAX  # the documented precondition


# --- seasonality form: 1e6·Σn·days / (cnt·n_all) ---------------------

def test_seasonality_form_matches_python_float(spark):
    # numerator is float-led (no int overflow); denominator is the
    # only integer product. Probe with day-counts near the bound.
    n_all = 900_000_000_000_000  # 9e14 events (documented headroom)
    n_days_all = 10_000
    rows = [(128_571_428_571_428, 1_400)]  # (sum_n dow, n_days dow)
    df = spark.createDataFrame(rows, ["sum_n", "n_days"])
    got = df.select(
        F.floor(
            1000000.0 * F.col("sum_n") * F.lit(n_days_all)
            / (F.col("n_days") * F.lit(n_all))
            + F.lit(0.5)
        ).cast("bigint").alias("ppm")
    ).collect()[0]["ppm"]
    import math

    sum_n, n_days = rows[0]
    want = math.floor(
        1000000.0 * sum_n * n_days_all / (n_days * n_all) + 0.5
    )
    assert got == want
    assert n_days * n_all < INT64_MAX


# --- lift form: 1000·n_orders·N / (n_a·n_b) --------------------------

def test_lift_form_matches_python_float(spark):
    n_baskets = 3_000_000_000
    rows = [(2_000_000_000, 2_999_999_711, 2_999_999_873)]
    df = spark.createDataFrame(rows, ["n_orders", "n_a", "n_b"])
    got = df.select(
        F.floor(
            1000.0 * F.col("n_orders") * F.lit(n_baskets)
            / (F.col("n_a") * F.col("n_b"))
            + F.lit(0.5)
        ).cast("bigint").alias("lift_milli")
    ).collect()[0]["lift_milli"]
    import math

    n_orders, n_a, n_b = rows[0]
    want = math.floor(1000.0 * n_orders * n_baskets / (n_a * n_b) + 0.5)
    assert got == want
    assert n_a * n_b < INT64_MAX


# --- decimal(38,0) is the escape hatch beyond the bound --------------

def test_decimal_widening_is_value_identical(spark):
    """The documented fix past 2^63 — widen to decimal(38,0) on both
    engines — must produce the same values inside the bound (so the
    switch can be made without re-baselining hashes)."""
    n_all = 3_000_000_000
    n_s = 2_999_999_999
    rows = [(123_456_789, 123_456_790), (n_s, n_all)]
    df = spark.createDataFrame(rows, ["cum_s", "cum_all"])
    as_int = df.select(
        (F.col("cum_s") * F.lit(n_all) - F.col("cum_all") * F.lit(n_s))
        .alias("d")
    ).collect()
    as_dec = df.select(
        (
            F.col("cum_s").cast("decimal(38,0)") * F.lit(n_all)
            - F.col("cum_all").cast("decimal(38,0)") * F.lit(n_s)
        ).alias("d")
    ).collect()
    assert [int(r["d"]) for r in as_int] == [int(r["d"]) for r in as_dec]
    # and decimal keeps going where int64 cannot: a product past 2^63
    big = _one_row(spark, a=1 << 40).select(
        (F.col("a").cast("decimal(38,0)") * F.col("a").cast("decimal(38,0)"))
        .alias("p")
    ).collect()[0]["p"]
    assert int(big) == (1 << 80)
