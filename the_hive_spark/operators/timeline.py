"""Event-timeline / log analytics over the ``events`` stream table.

The reference's timeline + audit surface (SURVEY.md §2: T2/T3 recent-N,
P3/P4 filters, A3 tallies) generalized to a proper log-analytics query
set: rollups, error rates, sessionization, funnels, JSON prop
extraction. ``events`` is the append-only fact; at 100 TB it would be
date-partitioned so every one of these prunes to the scanned window.

Determinism notes: parquet stores ts as nanoseconds; Spark reads µs
precision, so oracles CAST to TIMESTAMP (µs) explicitly. All float
sums are decimal-cast; every LIMIT has a total-order tie-break.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from the_hive_spark.registry import query
from the_hive_spark.tables import table


@query(
    "events_timeline",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 100
""",
)
def events_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 'recent events': ORDER BY ts DESC LIMIT 100 (+id tie-break).

    Ref: internal/database/events.go:65-89. Spark plan is a TakeOrdered
    (per-partition top-100 then merge) — no full sort at scale.
    """
    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type", "value").orderBy(
        F.desc("ts"), F.desc("event_id")
    ).limit(100)


@query(
    "events_by_type",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_micros
FROM events
GROUP BY event_type
""",
)
def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type tally (A3-style) with distinct users."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("total_value_micros"),
    )


@query(
    "events_user_daily",
    oracle="""
SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_micros
FROM events
GROUP BY user_id, day
""",
)
def events_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-day activity rollup (the partition-pruned workhorse)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("total_value_micros"),
    )


@query(
    "events_error_rate_daily",
    oracle="""
SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
       CAST(FLOOR(COUNT(*) FILTER (WHERE event_type = 'error') * 1000000.0 / COUNT(*) + 0.5) AS BIGINT) AS error_rate_ppm
FROM events
GROUP BY day
""",
)
def events_error_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate trend (the ST6/alerting analytics flavor)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.floor(
            F.count(F.when(F.col("event_type") == "error", 1)) * 1000000.0 / F.count(F.lit(1))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("error_rate_ppm"),
    )


@query(
    "events_sessionization",
    oracle="""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('microsecond', prev_ts, ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
), sessions AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS session_events,
         date_diff('microsecond', MIN(ts), MAX(ts)) AS duration_us
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(session_events) AS BIGINT) AS n_events,
       CAST(SUM(duration_us) AS BIGINT) AS total_duration_us,
       CAST(MAX(session_events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id
""",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap).

    The batch analogue of the reference's doc-completion sessionization
    (ST3, hive_service.go:129-189). One shuffle on user_id; both
    windows and the final groupBy reuse that partitioning.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(w_order))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | ((F.unix_micros("ts") - F.unix_micros("prev_ts")) > 1_800_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w_run))
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("session_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("session_events").cast("bigint").alias("n_events"),
        F.sum("duration_us").cast("bigint").alias("total_duration_us"),
        F.max("session_events").cast("bigint").alias("max_session_events"),
    )


@query(
    "events_funnel",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS first_view,
         MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) FILTER (WHERE first_view IS NOT NULL) AS n_view,
       COUNT(*) FILTER (WHERE first_view IS NOT NULL AND first_click > first_view) AS n_click_after_view,
       COUNT(*) FILTER (WHERE first_view IS NOT NULL AND first_click > first_view
                          AND first_purchase > first_click) AS n_full_funnel
FROM per_user
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion funnel (single shuffle)."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return per_user.agg(
        F.count(F.when(F.col("first_view").isNotNull(), 1)).alias("n_view"),
        F.count(
            F.when(
                F.col("first_view").isNotNull() & (F.col("first_click") > F.col("first_view")), 1
            )
        ).alias("n_click_after_view"),
        F.count(
            F.when(
                F.col("first_view").isNotNull()
                & (F.col("first_click") > F.col("first_view"))
                & (F.col("first_purchase") > F.col("first_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@query(
    "events_top_purchasers",
    oracle="""
SELECT user_id, COUNT(*) AS n_purchases,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS total_spend_micros
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY total_spend_micros DESC, user_id
LIMIT 10
""",
)
def events_top_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered top-k: predicate pushed to scan, TakeOrdered for the limit."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("total_spend_micros"),
        )
        .orderBy(F.desc("total_spend_micros"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "events_props_histogram",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS n
FROM events
GROUP BY k
""",
)
def events_props_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction (F8/F11-style JSON parsing, JVM-side)."""
    ev = table(spark, sf_dir, "events")
    return ev.withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    ).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@query(
    "events_hourly_pattern",
    oracle="""
SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour_of_day,
       event_type, COUNT(*) AS n
FROM events
GROUP BY hour_of_day, event_type
""",
)
def events_hourly_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × type histogram (A6/A7-style derived-time analytics)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.hour("ts").cast("int").alias("hour_of_day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "events_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS f_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT e.user_id,
         strftime(f.f_day, '%Y-%m') AS cohort_month,
         datediff('day', f.f_day, CAST(e.ts AS DATE)) // 7 AS week_n
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_month, CAST(week_n AS BIGINT) AS week_n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM activity
GROUP BY cohort_month, week_n
""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen month, counted
    per week-offset from their own first day — the standard
    product-analytics retention triangle. Two aggregations keyed on
    user_id back-to-back, so the cohort join reuses the firsts
    shuffle; week offsets are user-relative integer math (no
    calendar-week dialect differences to leak between engines)."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("f_day")
    )
    activity = ev.join(firsts, "user_id").select(
        "user_id",
        F.date_format("f_day", "yyyy-MM").alias("cohort_month"),
        F.floor(F.datediff(F.to_date("ts"), F.col("f_day")) / 7)
        .cast("bigint")
        .alias("week_n"),
    )
    return activity.groupBy("cohort_month", "week_n").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )


@query(
    "events_asof_last_order",
    oracle="""
SELECT e.event_id, e.user_id,
       strftime(o.o_orderdate, '%Y-%m-%d') AS last_order_date
FROM events e
ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)
def events_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN — for every event, the latest order of the same user
    at or before the event time. Spark has no asof operator; the
    scalable composition is the union-merge: tag both inputs, union,
    ONE shuffle on the key, and a running last_value(ignorenulls) over
    (time, tag) ordering carries each order date forward to the events
    that follow it. No per-row probe, no range explosion — the same
    sort-merge shape a native asof join would execute. Oracle: DuckDB's
    native ASOF JOIN (inner semantics — events with no prior order are
    dropped, matching the trailing isNotNull filter)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("timestamp").alias("odate"),
        F.lit(1).alias("tag"),
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("odate"),
        F.lit(0).alias("tag"),
    )
    # tag orders before events at equal t ⇒ ts >= o_orderdate inclusive
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = orders.unionByName(ev).withColumn(
        "last_odate", F.last("odate", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("tag") == 1) & F.col("last_odate").isNotNull())
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.date_format("last_odate", "yyyy-MM-dd").alias("last_order_date"),
        )
    )


_HOUR_US = 3_600_000_000


@query(
    "events_within_hour_pairs",
    oracle=f"""
SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= {_HOUR_US}
 AND a.event_id < b.event_id
""",
)
def events_within_hour_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (interval) self-join — pairs of events by the same user
    within one hour. The naive theta join is O(n²) per user; the scale
    plan BANDS time into hour buckets and joins on (user, bucket) with
    each left row probing its own and the next bucket, which covers
    every ≤1h pair exactly (a gap ≤1h spans at most one bucket
    boundary). Equi-join + bounded fan-out of 2 — the interval-join
    shape that survives arbitrarily long histories. Oracle: the naive
    theta join, affordable at sf0.01 — equality proves no pair is
    gained or lost."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    left = ev.select(
        "user_id", F.col("event_id").alias("event_a"), F.col("us").alias("us_a"),
        F.explode(
            F.array(
                (F.col("us") / _HOUR_US).cast("long"),
                (F.col("us") / _HOUR_US).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    right = ev.select(
        "user_id", F.col("event_id").alias("event_b"), F.col("us").alias("us_b"),
        (F.col("us") / _HOUR_US).cast("long").alias("bucket"),
    )
    return (
        left.join(right, ["user_id", "bucket"])
        .filter(
            (F.col("us_b") >= F.col("us_a"))
            & (F.col("us_b") - F.col("us_a") <= _HOUR_US)
            & (F.col("event_a") < F.col("event_b"))
        )
        .select(
            "user_id", "event_a", "event_b",
            (F.col("us_b") - F.col("us_a")).cast("bigint").alias("gap_us"),
        )
        .dropDuplicates(["user_id", "event_a", "event_b"])
    )


@query(
    "events_value_by_type_salted",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_value_micros
FROM events GROUP BY event_type
""",
)
def events_value_by_type_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation in the graded surface: event_type has a
    handful of hot keys over the whole corpus — the textbook case
    where a plain groupBy sends each hot key to one reducer. The
    salted two-phase rewrite (functions/skew.py) spreads each key over
    16 salts map-side, then merges partials; the oracle is the plain
    GROUP BY, so hash equality proves the rewrite changes the shuffle
    distribution and nothing else."""
    from the_hive_spark.functions.skew import salted_agg

    ev = table(spark, sf_dir, "events").withColumn(
        "value_micros", F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "total_value_micros": ("value_micros", "sum"),
        },
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("total_value_micros").cast("bigint").alias("total_value_micros"),
    )


@query(
    "events_anomaly_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY event_type, day
), trail7 AS (
  SELECT event_type, day, n_events,
         SUM(n_events) OVER w AS sum7,
         COUNT(*) OVER w AS cnt7
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       CAST(sum7 AS BIGINT) AS sum7, CAST(cnt7 AS BIGINT) AS cnt7,
       (cnt7 > 0 AND 2 * abs(n_events * cnt7 - sum7) > sum7) AS is_anomaly
FROM trail7
""",
)
def events_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event_type, day) count against
    its trailing-7-day average, flagged when it deviates > ±50%. The
    ratio test is cross-multiplied into pure integer arithmetic
    (2·|n·cnt7 − sum7| > sum7), so both engines agree exactly — no
    float mean/std to drift. The window partitions by event_type
    AFTER daily aggregation: state per partition is |days| rows,
    independent of raw event volume."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    trailing = daily.select(
        "event_type",
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.sum("n_events").over(w).cast("bigint").alias("sum7"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt7"),
    )
    return trailing.withColumn(
        "is_anomaly",
        (F.col("cnt7") > 0)
        & (
            2 * F.abs(F.col("n_events") * F.col("cnt7") - F.col("sum7"))
            > F.col("sum7")
        ),
    )


@query(
    "events_interarrival_by_type",
    oracle="""
WITH gaps AS (
  SELECT event_type,
         date_diff('microsecond',
                   LAG(CAST(ts AS TIMESTAMP)) OVER (
                     PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id),
                   CAST(ts AS TIMESTAMP)) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
""",
)
def events_interarrival_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile: for each event, the gap since the
    same user's previous event (any type), aggregated by the type of
    the arriving event. The latency-analysis staple for a timeline
    table (T2 family). One shuffle on user_id for the LAG, one on
    event_type for the rollup; per-user state is a single row, so the
    window holds at any user cardinality. Sums stay integer µs — no
    float mean to drift between engines (consumers divide)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("total_gap_us"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


@query(
    "events_path_3grams",
    oracle="""
WITH seq AS (
  SELECT user_id,
         LAG(event_type, 2) OVER w AS t0,
         LAG(event_type, 1) OVER w AS t1,
         event_type AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id)
)
SELECT t0 || '>' || t1 || '>' || t2 AS path,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM seq WHERE t0 IS NOT NULL
GROUP BY path
ORDER BY n_occurrences DESC, path
LIMIT 20
""",
)
def events_path_3grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 20 most common 3-event sequences
    across all user timelines (clickstream n-grams). Window LAG gives
    each event its two predecessors without self-joins — a 3-way
    self-join on a 100 TB events table would be catastrophic; the
    window is one user_id shuffle. Top-20 is a TakeOrdered, not a full
    sort."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type", 2).over(w).alias("t0"),
        F.lag("event_type", 1).over(w).alias("t1"),
        F.col("event_type").alias("t2"),
    ).filter(F.col("t0").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "t0", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(20)
    )


@query(
    "events_value_percentiles",
    oracle="""
WITH ranked AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_micros,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT),
                                     event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN value_micros END) AS BIGINT) AS p50_micros,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN value_micros END) AS BIGINT) AS p90_micros,
       CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value_micros END) AS BIGINT) AS p99_micros
FROM ranked
GROUP BY event_type
""",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (type-7-free) percentiles of event value per type:
    p50/p90/p99 picked by exact rank position — lower nearest-rank,
    ceil(q·n) — so both engines select the identical element and the
    hash can't drift on interpolation arithmetic. One shuffle on
    event_type; rank + pick-at-position collapses back to one row per
    group. At 100 TB one would swap in an approx sketch
    (percentile_approx / t-digest) for the exploratory pass and keep
    this exact path for the graded rollup."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("value_micros"),
    )
    w = Window.partitionBy("event_type").orderBy("value_micros", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value_micros",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(idx_expr):  # noqa: ANN001, ANN202 - local helper
        return F.max(
            F.when(F.col("rn") == idx_expr, F.col("value_micros"))
        ).cast("bigint")

    n = F.col("n")
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        at(F.floor((n + 1) / F.lit(2))).alias("p50_micros"),
        at(F.floor((9 * n + 9) / F.lit(10))).alias("p90_micros"),
        at(F.floor((99 * n + 99) / F.lit(100))).alias("p99_micros"),
    )


@query(
    "events_dau_stickiness",
    oracle="""
WITH dau AS (
  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY day
), wau AS (
  SELECT day, dau,
         (SELECT COUNT(DISTINCT e.user_id)
          FROM events e
          WHERE strftime(CAST(e.ts AS TIMESTAMP), '%Y-%m-%d') <= d.day
            AND strftime(CAST(e.ts AS TIMESTAMP), '%Y-%m-%d') >=
                strftime(CAST(d.day AS DATE) - INTERVAL 6 DAY, '%Y-%m-%d')
         ) AS wau
  FROM dau d
)
SELECT day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       CAST(FLOOR(1000000.0 * dau / wau + 0.5) AS BIGINT) AS stickiness_ppm
FROM wau
""",
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day. Spark computes the trailing-7-day
    distinct-user count WITHOUT the oracle's per-day correlated rescan:
    each (user, day) pair fans out to the ≤7 later days it can serve
    (a bounded explode), then one groupBy counts distinct users per
    covered day — the standard scalable rewrite of sliding-window
    COUNT DISTINCT (state per day is the distinct-pair set, shuffled
    once). Days with no events on the day itself still appearing in a
    window are excluded to match the oracle's dau-driven day list."""
    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).distinct()
    dau = pairs.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    # fan each active (user, day) out to the 7 days whose trailing
    # window it falls into, keep only days that actually exist in dau
    covered = pairs.select(
        "user_id",
        F.explode(
            F.expr(
                "transform(sequence(0, 6), i -> "
                "date_format(date_add(to_date(day, 'yyyy-MM-dd'), i), 'yyyy-MM-dd'))"
            )
        ).alias("day"),
    )
    wau = covered.join(dau.select("day"), "day").groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.floor(1000000.0 * F.col("dau") / F.col("wau") + F.lit(0.5))
            .cast("bigint")
            .alias("stickiness_ppm"),
        )
    )


@query(
    "events_band_salted_join",
    oracle="""
WITH profile AS (
  SELECT user_id,
         CASE WHEN COUNT(*) >= 1000 THEN 'heavy'
              WHEN COUNT(*) >= 100 THEN 'regular'
              ELSE 'light' END AS band
  FROM events GROUP BY user_id
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_value_micros
FROM events JOIN profile USING (user_id)
GROUP BY band
""",
)
def events_band_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact⋈dim join in the graded surface: events
    joined back to a derived per-user activity band via
    functions/skew.py::salted_join — fact rows spread over 16
    deterministic salts, the band dimension replicated ×16, joined on
    (user_id, salt). The oracle is the PLAIN join, so hash equality
    proves salting redistributes the shuffle without changing a single
    row. This is the rewrite for the hot-key case (one tenant = 40%
    of the fact) where a plain shuffle join stalls on one reducer and
    the dim is too big to broadcast whole."""
    from the_hive_spark.functions.skew import salted_join

    ev = table(spark, sf_dir, "events")
    profile = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).select(
        "user_id",
        F.when(F.col("n") >= 1000, "heavy")
        .when(F.col("n") >= 100, "regular")
        .otherwise("light")
        .alias("band"),
    )
    joined = salted_join(
        ev.select(
            "user_id",
            F.floor(F.col("value") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("value_micros"),
        ),
        profile,
        on="user_id",
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("value_micros").cast("bigint").alias("total_value_micros"),
    )


@query(
    "events_value_histogram",
    oracle="""
SELECT event_type,
       CAST(LEAST(FLOOR(value / 50), 9) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type, bin
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type: 10 bins of width 50
    with an overflow bucket — the distribution profile behind every
    latency/size dashboard. Binning is a pure scan expression folded
    into the single aggregation shuffle; bin edges are exact in IEEE
    (value/50 then floor), so both engines bucket identically."""
    ev = table(spark, sf_dir, "events")
    bin_col = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("bigint")
    return ev.groupBy("event_type", bin_col.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )


@query(
    "events_daily_type_pivot",
    oracle="""
SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
FROM events
GROUP BY day
""",
)
def events_daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event-type pivot (long→wide reshape) over the closed type
    domain. Uses ``pivot(col, values)`` WITH the value list supplied:
    omitting it makes Spark run an extra distinct-scan job to discover
    the domain — a silent full pass over the fact at 100 TB. One
    shuffle; each cell is a conditional count, same as the oracle's
    FILTER aggregates."""
    ev = table(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "signup", "error"]
    wide = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in types
        ],
    )


@query(
    "events_last_touch",
    oracle="""
SELECT user_id, event_type, event_id,
       CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def events_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch dedup: the most recent event per (user, event_type) —
    the attribution/compaction primitive for event logs (same shape as
    CDC upsert-compaction: newest row per key wins, event_id breaks
    ts ties so the winner is unique). One hash shuffle on the group
    key, rank-1 filter inside the window — no global sort, no
    self-join against a MAX subquery (the naive form scans the fact
    twice and re-shuffles both sides)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
        )
    )


_TUMBLE_US = 600_000_000  # 10-minute windows in microseconds


@query(
    "events_tumbling_10min",
    oracle=f"""
SELECT epoch_us(CAST(ts AS TIMESTAMP))
         - epoch_us(CAST(ts AS TIMESTAMP)) % {_TUMBLE_US} AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY window_start_us, event_type
""",
)
def events_tumbling_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window counts per event type — the batch
    face of the streaming windowed aggregation
    (streaming/windows.py::windowed_event_counts computes the same
    thing with a watermark). The bucket is pure integer arithmetic on
    epoch micros (µs − µs % width) instead of each engine's window/
    time_bucket function, so both engines bucket identically with no
    origin-convention risk. One map-side-combinable shuffle; COUNT
    DISTINCT adds the standard partial-distinct expansion, still one
    exchange."""
    ev = table(spark, sf_dir, "events")
    bucket = F.expr(
        f"unix_micros(ts) - unix_micros(ts) % {_TUMBLE_US}"
    ).alias("window_start_us")
    return ev.groupBy(bucket, "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


_BURST_GAP_US = 180_000_000  # 3 minutes between errors splits a burst


@query(
    "events_error_bursts",
    oracle=f"""
WITH e AS (
  SELECT event_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
  FROM events WHERE event_type = 'error'
), flagged AS (
  SELECT event_id, us,
         CASE WHEN LAG(us) OVER (ORDER BY us, event_id) IS NULL
                   OR us - LAG(us) OVER (ORDER BY us, event_id) > {_BURST_GAP_US}
              THEN 1 ELSE 0 END AS new_burst
  FROM e
), numbered AS (
  SELECT us,
         SUM(new_burst) OVER (ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS burst_id
  FROM flagged
)
SELECT CAST(burst_id AS BIGINT) AS burst_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(us) AS BIGINT) AS start_us,
       CAST(MAX(us) AS BIGINT) AS end_us,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
FROM numbered GROUP BY burst_id
""",
)
def events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detection — gaps-and-islands over the error stream:
    consecutive errors ≤3 min apart merge into one burst (the incident
    signal an on-call pages on), reported as (burst_id, n_events,
    start, end, duration).

    The oracle's form needs TWO unpartitioned windows (LAG for the
    gap flag, running SUM for the island id) — single-partition
    funnels at scale. Here both are distributed: range-partition on
    (us, event_id) once (localCheckpoint pins the sampled boundaries),
    LAG within each partition with the head row's predecessor filled
    from an O(partitions) collect of per-partition maxima, and the
    island id as the same two-pass exclusive-offsets prefix sum used
    by functions/ids.py. No stage sees more than its partition."""
    from pyspark.sql import Window

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", F.unix_micros("ts").alias("us"))
    )
    n = spark.sparkContext.defaultParallelism
    ranged = (
        ev.repartitionByRange(n, F.col("us"), F.col("event_id"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # head-row predecessor: the max us of the PREVIOUS partition
    # ((us, event_id) range order makes that the globally previous row)
    maxima = ranged.groupBy("_pid").agg(F.max("us").alias("mx")).collect()
    by_pid = {int(r["_pid"]): r["mx"] for r in maxima}
    # link each non-empty partition to the NEAREST earlier non-empty
    # one (range partitions can come out empty; pid-1 isn't guaranteed)
    sorted_pids = sorted(by_pid)
    prev_of = {
        pid: by_pid[sorted_pids[i - 1]]
        for i, pid in enumerate(sorted_pids)
        if i > 0
    }
    prev_fill = (
        F.create_map(*[F.lit(x) for kv in prev_of.items() for x in kv])[
            F.col("_pid")
        ]
        if prev_of
        else F.lit(None).cast("long")
    )
    w = Window.partitionBy("_pid").orderBy("us", "event_id")
    flagged = ranged.withColumn(
        "prev_us", F.coalesce(F.lag("us").over(w), prev_fill)
    ).withColumn(
        "new_burst",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > _BURST_GAP_US),
            1,
        ).otherwise(0),
    )
    totals = flagged.groupBy("_pid").agg(F.sum("new_burst").alias("t")).collect()
    offsets, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[int(r["_pid"])] = acc
        acc += int(r["t"] or 0)
    off = (
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
            F.col("_pid")
        ]
        if offsets
        else F.lit(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = flagged.withColumn(
        "burst_id", (off + F.sum("new_burst").over(wsum)).cast("bigint")
    )
    return numbered.groupBy("burst_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("us").cast("bigint").alias("start_us"),
        F.max("us").cast("bigint").alias("end_us"),
        (F.max("us") - F.min("us")).cast("bigint").alias("duration_us"),
    )


DEBOUNCE_GAP_US = 600_000_000  # 10 min of quiescence closes a burst


@query(
    "events_debounced",
    oracle=f"""
WITH g AS (
  SELECT user_id, event_type, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         epoch_us(CAST(ts AS TIMESTAMP))
           - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS gap_us,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
           OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           - epoch_us(CAST(ts AS TIMESTAMP)) AS next_gap_us,
         ts
  FROM events
), b AS (
  SELECT *,
         SUM(CASE WHEN gap_us IS NULL OR gap_us > {DEBOUNCE_GAP_US} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS burst_no
  FROM g
), c AS (
  SELECT *,
         COUNT(*) OVER (PARTITION BY user_id, event_type, burst_no) AS burst_len
  FROM b
)
SELECT user_id, event_type, event_id, CAST(ts_us AS BIGINT) AS ts_us,
       CAST(burst_len AS BIGINT) AS burst_len
FROM c
WHERE next_gap_us IS NULL OR next_gap_us > {DEBOUNCE_GAP_US}
""",
)
def events_debounced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce as a batch operator (S2 parity,
    internal/drone/watcher/debouncer.go:28-49: a per-key timer resets
    on every event and fires once the key goes quiet): per (user,
    event_type), emit ONLY the last event of each burst — the
    quiescence point — plus how many raw events the burst collapsed.

    All three derivations (LAG gap → island ids via running sum of
    burst-starts → per-island count) share the (user, event_type) key:
    hash partitioning on that key satisfies the third window's
    (user, event_type, burst_no) clustering by the subset rule, so the
    whole operator is ONE shuffle and two sorted passes — no islands
    self-join, no second exchange.
    """
    key_w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(key_w)
    annotated = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        us.alias("ts_us"),
        (F.lead(us).over(key_w) - us).alias("next_gap_us"),
        F.sum(
            F.when(gap.isNull() | (gap > DEBOUNCE_GAP_US), 1).otherwise(0)
        ).over(key_w).alias("burst_no"),
    )
    burst_len = F.count(F.lit(1)).over(
        Window.partitionBy("user_id", "event_type", "burst_no")
    )
    return (
        annotated.withColumn("burst_len", burst_len)
        .filter(
            F.col("next_gap_us").isNull()
            | (F.col("next_gap_us") > DEBOUNCE_GAP_US)
        )
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.col("ts_us").cast("bigint").alias("ts_us"),
            F.col("burst_len").cast("bigint").alias("burst_len"),
        )
    )


@query(
    "events_attributed_conversions",
    oracle="""
SELECT e.user_id, e.event_id AS effect_id,
       CAST(epoch_us(CAST(e.ts AS TIMESTAMP)) AS BIGINT) AS effect_ts_us,
       c.event_id AS cause_id,
       CAST(epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS cause_ts_us
FROM events e
JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type = 'click'
 AND e.event_type = 'purchase'
 AND c.ts <= e.ts
 AND c.ts >= e.ts - INTERVAL 1 HOUR
""",
)
def events_attributed_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution — every purchase paired with the same
    user's clicks in the preceding hour. This is the BATCH FACE of the
    watermarked stream-stream interval join in
    streaming/windows.py::attributed_conversions, and it calls that
    same helper (watermark is a no-op in batch), so the driver's
    DuckDB oracle hash-checks the exact code the streaming tests run —
    single source of truth across both execution modes.

    Plan: the type filters prune each side at the scan, the equi-part
    of the condition (user_id) drives a hash join, and the time bounds
    evaluate as join residuals — at stream scale the same bounds are
    what lets Spark evict state; at batch scale they bound the per-user
    pair fan-out.
    """
    from the_hive_spark.streaming.windows import attributed_conversions

    ev = table(spark, sf_dir, "events")
    out = attributed_conversions(ev, within="1 hour")
    return out.select(
        "user_id",
        "effect_id",
        F.unix_micros("effect_ts").alias("effect_ts_us"),
        "cause_id",
        F.unix_micros("cause_ts").alias("cause_ts_us"),
    )


FUNNEL_WINDOW_US = 86_400_000_000  # chain must complete within 24 h of its view


@query(
    "events_funnel_windowed",
    oracle=f"""
WITH t AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
), lv AS (
  SELECT *,
         MAX(CASE WHEN event_type = 'view' THEN ts_us END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS latest_view_before
  FROM t
), bc AS (
  SELECT *,
         MAX(CASE WHEN event_type = 'click' THEN latest_view_before END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_view_via_click
  FROM lv
), per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
         MAX(CASE WHEN event_type = 'purchase'
                   AND best_view_via_click IS NOT NULL
                   AND ts_us - best_view_via_click <= {FUNNEL_WINDOW_US}
                  THEN 1 ELSE 0 END) AS converted
  FROM bc GROUP BY user_id
)
SELECT CAST(SUM(has_purchase) AS BIGINT) AS n_purchasers,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(FLOOR(1000000.0 * SUM(converted) / greatest(SUM(has_purchase), 1) + 0.5)
            AS BIGINT) AS conv_ppm
FROM per_user
""",
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT windowed strict-order funnel (the windowFunnel semantic):
    a user converts iff some view, a strictly later click, and a
    strictly later purchase all occur with the purchase within 24 h of
    THAT view — not the first-event approximation in events_funnel,
    which misses chains that start at a later view.

    Exact without any per-user sequence UDF: for each row, the latest
    view STRICTLY before it is a running max over a value-based frame
    (RANGE ... 1 PRECEDING on integer µs — strict by construction,
    tie-safe); chaining a second running max over clicks of that
    quantity gives, at every purchase, the latest view reachable
    through an intermediate click — and maximizing the view timestamp
    is optimal for the window test, so one comparison decides
    conversion. One shuffle on user_id, two window passes over the
    same sort, then a tiny two-level count — the shape that survives a
    100 TB event log, where the naive exists-chain is a per-user O(n³)
    join.
    """
    us = F.unix_micros("ts")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", us.alias("ts_us")
    )
    strict = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    lv = ev.withColumn(
        "latest_view_before",
        F.max(
            F.when(F.col("event_type") == "view", F.col("ts_us"))
        ).over(strict),
    )
    bc = lv.withColumn(
        "best_view_via_click",
        F.max(
            F.when(F.col("event_type") == "click", F.col("latest_view_before"))
        ).over(strict),
    )
    per_user = bc.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("best_view_via_click").isNotNull()
                & (
                    F.col("ts_us") - F.col("best_view_via_click")
                    <= FUNNEL_WINDOW_US
                ),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    return per_user.agg(
        F.sum("has_purchase").cast("bigint").alias("n_purchasers"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.floor(
            1000000.0
            * F.sum("converted")
            / F.greatest(F.sum("has_purchase"), F.lit(1))
            + F.lit(0.5)
        ).cast("bigint").alias("conv_ppm"),
    )


USHAPE_WINDOW_DAYS = 7


@query(
    "events_attribution_ushape",
    oracle=f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, CAST(ts AS TIMESTAMP) AS conv_ts
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT c.conv_id, e.event_id AS touch_id, e.event_type,
         CAST(e.ts AS TIMESTAMP) AS touch_ts
  FROM conv c
  JOIN events e
    ON e.user_id = c.user_id
   AND e.event_type <> 'purchase'
   AND CAST(e.ts AS TIMESTAMP) < c.conv_ts
   AND CAST(e.ts AS TIMESTAMP) >= c.conv_ts - INTERVAL {USHAPE_WINDOW_DAYS} DAY
), ranked AS (
  SELECT conv_id, touch_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY conv_id
                            ORDER BY touch_ts, touch_id) AS rn,
         COUNT(*) OVER (PARTITION BY conv_id) AS n
  FROM touch
), credited AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN 1000000
              WHEN n = 2 THEN 500000
              WHEN rn = 1 THEN 400000
              WHEN rn = n THEN 400000
              ELSE CAST(FLOOR(200000.0 / (n - 2)) AS BIGINT) END AS credit_ppm
  FROM ranked
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit_ppm) AS BIGINT) AS total_credit_ppm
FROM credited GROUP BY event_type
""",
)
def events_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    conversion's credit splits 40% to the first touch, 40% to the
    last, and 20% evenly across the middle touches within a
    {USHAPE_WINDOW_DAYS}-day lookback — the standard position-based
    model alongside the repo's last-touch compaction
    (events_last_touch), which over-credits retargeting. Output rolls
    credit up per touch channel (event_type).

    Exact: credits are ppm integers (FLOOR for the middle share — the
    sub-ppm remainder is dropped identically on both engines), summed
    as integers. Scale shape: the conversion↔touch join is per-user
    keyed with a time-range predicate (the as-of/range-join family —
    fan-out bounded by touches-per-window, never user² or corpus²);
    the ranking windows are partitioned BY conversion id, bounded by
    the same window. One channel-grid rollup at the end.
    """
    ev = table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("conv_ts"),
    )
    touch = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("touch_id"),
            "event_type",
            F.col("ts").alias("touch_ts"),
        )
        .join(
            conv,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("touch_ts") < F.col("conv_ts"))
            & (
                F.col("touch_ts")
                >= F.col("conv_ts") - F.expr(f"INTERVAL {USHAPE_WINDOW_DAYS} DAY")
            ),
        )
    )
    w_rn = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    w_n = Window.partitionBy("conv_id")
    ranked = touch.select(
        "conv_id",
        "event_type",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(400000))
        .otherwise(F.floor(200000.0 / (F.col("n") - 2)).cast("bigint"))
    )
    return (
        ranked.select("event_type", credit.alias("credit_ppm"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit_ppm").cast("bigint").alias("total_credit_ppm"),
        )
    )


SEQ_MIN_USERS = 20  # absolute sequence-support threshold (distinct users)


@query(
    "events_frequent_sequences",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events
), singles AS (
  SELECT event_type AS pattern, 1 AS length,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM seq GROUP BY event_type
  HAVING COUNT(DISTINCT user_id) >= {SEQ_MIN_USERS}
), pairs AS (
  SELECT a.event_type || '>' || b.event_type AS pattern, 2 AS length,
         CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
  FROM seq a JOIN seq b
    ON a.user_id = b.user_id
   AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
  GROUP BY a.event_type, b.event_type
  HAVING COUNT(DISTINCT a.user_id) >= {SEQ_MIN_USERS}
)
SELECT pattern, CAST(length AS BIGINT) AS length, n_users FROM singles
UNION ALL
SELECT pattern, CAST(length AS BIGINT) AS length, n_users FROM pairs
""",
)
def events_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent sequential patterns (length ≤ 2) over per-user event
    streams via MLlib PrefixSpan — "eventually-follows" process
    mining (view eventually precedes purchase for N users), the
    order-aware complement to q_frequent_itemsets' unordered baskets
    and q_next_part_pairs' strictly-adjacent bigrams (Pei et al.,
    PrefixSpan, ICDE'01).

    Determinism: sequences are built in (ts, event_id) order so equal
    timestamps cannot reshuffle a user's sequence between runs;
    support is pinned to an absolute user count the same way as the
    itemset query; the pattern set + supports are data-determined
    whatever order the algorithm emits. The oracle re-derives both
    lengths relationally (a self-join testing the lexicographic
    before relation). The library runs the full prefix-projected
    search distributed; the ≤2 filter is ours, purely for oracle
    tractability.
    """
    from pyspark.ml.fpm import PrefixSpan
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    from pyspark import StorageLevel

    seqs = (
        ev.withColumn("_rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_rn", "event_type"))
                ),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
        # PrefixSpan runs SEVERAL internal actions over its input
        # (count, frequent-item collect, per-level expansion) — uncached
        # it re-executes the window+groupBy over the fact per action
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_users = seqs.count()  # scalar job (also materializes the cache)
    # clamp: with fewer users than the absolute threshold the ratio
    # exceeds 1 (rejected by the library); 1.0 + the freq post-filter
    # below yields the same (empty) answer the oracle computes
    ps = PrefixSpan(
        minSupport=min(1.0, (SEQ_MIN_USERS - 0.5) / max(n_users, 1)),
        maxPatternLength=2,
        maxLocalProjDBSize=32_000_000,
    )
    found = ps.findFrequentSequentialPatterns(seqs)
    out = (
        found.filter(F.col("freq") >= SEQ_MIN_USERS)
        .select(
            F.concat_ws(
                ">",
                F.transform(F.col("sequence"), lambda s: s.getItem(0)),
            ).alias("pattern"),
            F.size("sequence").cast("bigint").alias("length"),
            F.col("freq").cast("bigint").alias("n_users"),
        )
        .localCheckpoint(eager=True)  # run the mining while seqs is hot
    )
    seqs.unpersist()
    return out


@query(
    "events_value_winsorized",
    oracle="""
WITH ranked AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT),
                                     event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), bounds AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN v END) AS lo_v,
         MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN v END) AS hi_v,
         MAX((5 * n + 99) // 100) AS lo_rn,
         MAX((95 * n + 99) // 100) AS hi_rn
  FROM ranked GROUP BY event_type
)
SELECT r.event_type,
       CAST(MAX(r.n) AS BIGINT) AS n_events,
       CAST(SUM(r.v) // MAX(r.n) AS BIGINT) AS mean_micros,
       CAST(SUM(GREATEST(LEAST(r.v, b.hi_v), b.lo_v)) // MAX(r.n) AS BIGINT)
         AS winsorized_mean_micros,
       CAST(SUM(CASE WHEN r.rn > b.lo_rn AND r.rn <= b.hi_rn THEN r.v END)
            // SUM(CASE WHEN r.rn > b.lo_rn AND r.rn <= b.hi_rn THEN 1 END)
            AS BIGINT) AS trimmed_mean_micros
FROM ranked r JOIN bounds b USING (event_type)
GROUP BY r.event_type
""",
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust central-tendency stats per event type: plain mean next
    to the 5/95 winsorized mean (outliers clamped to the percentile
    bounds) and the 5/95 trimmed mean (outliers dropped) — the
    heavy-tail-proof aggregates a metrics pipeline publishes when a
    handful of whale values would otherwise move the daily average
    (revenue-per-user being the canonical victim).

    Determinism contract: values in integer micros; percentile bounds
    picked by exact nearest rank (ceil(q·n), row_number tie-broken by
    event_id); means are integer floor-divisions of micro sums (all
    values non-negative, so truncation == floor in both engines) —
    no IEEE arithmetic in any compared column.

    Plan: one rank window per type (the same single shuffle the exact
    percentile query pays), bound rows reduced per type and joined
    back by type — a 5-row build side AQE broadcasts — then one
    map-side-combinable aggregation. At 100 TB the bounds would come
    from the t-digest sketch instead; the clamp/trim algebra is
    unchanged."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lo_rn = (5 * F.col("n") + 99) / 100
    hi_rn = (95 * F.col("n") + 99) / 100
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.floor(lo_rn), F.col("v"))
        ).alias("lo_v"),
        F.max(
            F.when(F.col("rn") == F.floor(hi_rn), F.col("v"))
        ).alias("hi_v"),
        F.max(F.floor(lo_rn)).cast("bigint").alias("lo_rn"),
        F.max(F.floor(hi_rn)).cast("bigint").alias("hi_rn"),
    )
    r = ranked.join(bounds, "event_type")
    in_trim = (F.col("rn") > F.col("lo_rn")) & (F.col("rn") <= F.col("hi_rn"))
    clamped = F.greatest(F.least(F.col("v"), F.col("hi_v")), F.col("lo_v"))
    # integer `div` only — a double division here could land on the
    # wrong side of the truncation boundary and break hash parity
    return (
        r.withColumn("clamped", clamped)
        .withColumn("trim_v", F.when(in_trim, F.col("v")))
        .withColumn("trim_1", F.when(in_trim, F.lit(1)))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.expr("sum(v) div max(n)").cast("bigint").alias("mean_micros"),
            F.expr("sum(clamped) div max(n)").cast("bigint")
            .alias("winsorized_mean_micros"),
            F.expr("sum(trim_v) div sum(trim_1)").cast("bigint")
            .alias("trimmed_mean_micros"),
        )
    )


@query(
    "events_funnel_latency",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS first_view,
         MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
  FROM events GROUP BY user_id
), lat AS (
  SELECT 'view_to_click' AS step, user_id,
         epoch_us(first_click - first_view) AS us
  FROM per_user WHERE first_view IS NOT NULL AND first_click > first_view
  UNION ALL
  SELECT 'click_to_purchase' AS step, user_id,
         epoch_us(first_purchase - first_click) AS us
  FROM per_user
  WHERE first_view IS NOT NULL AND first_click > first_view
    AND first_purchase > first_click
), ranked AS (
  SELECT step, us,
         ROW_NUMBER() OVER (PARTITION BY step ORDER BY us, user_id) AS rn,
         COUNT(*) OVER (PARTITION BY step) AS n
  FROM lat
)
SELECT step,
       CAST(MAX(n) AS BIGINT) AS n_users,
       CAST(SUM(us) // MAX(n) AS BIGINT) AS mean_us,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN us END) AS BIGINT) AS p50_us,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN us END) AS BIGINT) AS p90_us
FROM ranked GROUP BY step
""",
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW LONG the funnel takes, not just how many convert
    (events_funnel counts): per step transition (first view → first
    click, first click → first purchase), the converting users' mean /
    median / p90 latency — the metric that localizes WHERE a funnel
    slows down when conversion counts alone look healthy.

    Determinism contract matches events_value_percentiles: latencies
    in integer µs, percentiles by exact nearest rank with user_id
    tie-break, mean as integer floor-division (non-negative by the
    step ordering predicate). Plan: ONE user-keyed shuffle builds the
    per-user first-occurrence triple (same shape as events_funnel);
    the two step legs are a union over that small conversion set; the
    rank window partitions by step."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv1 = per_user.filter(
        F.col("first_view").isNotNull()
        & (F.col("first_click") > F.col("first_view"))
    )
    leg1 = conv1.select(
        F.lit("view_to_click").alias("step"),
        "user_id",
        (F.unix_micros("first_click") - F.unix_micros("first_view")).alias(
            "us"
        ),
    )
    leg2 = conv1.filter(F.col("first_purchase") > F.col("first_click")).select(
        F.lit("click_to_purchase").alias("step"),
        "user_id",
        (F.unix_micros("first_purchase") - F.unix_micros("first_click")).alias(
            "us"
        ),
    )
    lat = leg1.unionByName(leg2)
    w = Window.partitionBy("step").orderBy("us", "user_id")
    wn = Window.partitionBy("step")
    ranked = lat.select(
        "step",
        "us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("step").agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.expr("sum(us) div max(n)").cast("bigint").alias("mean_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("us"))
        ).cast("bigint").alias("p50_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("us"))
        ).cast("bigint").alias("p90_us"),
    )


_SURVIVAL_MAX_DAY = 13
_US_PER_DAY_F = 86_400_000_000.0


@query(
    "events_survival_curve",
    oracle=f"""
WITH life AS (
  SELECT user_id,
         CAST(FLOOR(epoch_us(MAX(ts) - MIN(ts)) / {_US_PER_DAY_F})
              AS BIGINT) AS lifetime_days
  FROM events GROUP BY user_id
), grid AS (
  SELECT t.day
  FROM life, unnest(range(0, LEAST(lifetime_days, {_SURVIVAL_MAX_DAY}) + 1))
         AS t(day)
), surv AS (
  SELECT day, COUNT(*) AS n_users FROM grid GROUP BY day
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(FLOOR(1000000.0 * n_users / (SELECT COUNT(*) FROM life) + 0.5)
            AS BIGINT) AS survival_ppm
FROM surv
""",
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifetime survival curve: for each day offset d (0..13),
    how many users were still active d or more days after their first
    event, and what fraction of the base that is — the
    Kaplan-Meier-style retention read (no censoring model: lifetime =
    last observed minus first observed activity).

    Scale shape: the survival count "users with lifetime ≥ d" is NOT
    computed as a per-d filter sweep (14 fact scans) nor as a window —
    each user CONTRIBUTES one row per day they survived (explode of a
    0..min(lifetime, 13) sequence, ≤14 rows per user), and one
    aggregation counts the grid. One user_id shuffle for lifetimes,
    one tiny day-keyed aggregation after. The base count rides a
    1-row broadcast cross join. Day arithmetic is floor(Δµs/86.4e9)
    in doubles — engine-identical IEEE ops."""
    ev = table(spark, sf_dir, "events")
    from the_hive_spark.functions.matstore import materialized
    from the_hive_spark.functions.partitioning import persist_right_sized

    # matstore-routed (the shared persist discipline): the total and
    # the grid both read the lifetimes, and repeated invocations in
    # one session must reuse the LRU-bounded cached copy instead of
    # accreting one persisted DF per call
    life_p = materialized(
        spark,
        ("user_lifetimes", sf_dir),
        lambda: persist_right_sized(
            ev.groupBy("user_id").agg(
                F.floor(
                    (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                    / F.lit(_US_PER_DAY_F)
                ).cast("bigint").alias("lifetime_days")
            )
        )[0],
    )
    total = life_p.agg(F.count(F.lit(1)).alias("n_total"))
    grid = life_p.select(
        F.explode(
            F.sequence(
                F.lit(0),
                F.least(F.col("lifetime_days"), F.lit(_SURVIVAL_MAX_DAY)),
            )
        ).alias("day")
    )
    surv = grid.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return surv.crossJoin(F.broadcast(total)).select(
        F.col("day").cast("bigint").alias("day"),
        "n_users",
        F.floor(1000000.0 * F.col("n_users") / F.col("n_total") + F.lit(0.5))
        .cast("bigint")
        .alias("survival_ppm"),
    )


@query(
    "events_time_weighted_value",
    oracle="""
WITH seq AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v_micros,
         epoch_us(LEAD(CAST(ts AS TIMESTAMP))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  - CAST(ts AS TIMESTAMP)) AS dt_us
  FROM events
), held AS (
  SELECT event_type, v_micros, dt_us FROM seq
  WHERE dt_us IS NOT NULL AND dt_us > 0
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt_us) AS BIGINT) AS held_us,
       CAST(FLOOR(CAST(SUM(CAST(v_micros AS HUGEINT)
                           * CAST(dt_us AS HUGEINT)) AS DOUBLE)
                  / CAST(SUM(dt_us) AS DOUBLE)) AS BIGINT) AS twap_micros
FROM held GROUP BY event_type
""",
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type (TWAP): each event's
    value HOLDS from its timestamp until the same user's next event,
    and the average weights by held duration — the right mean for
    sampled state (price ticks, gauge readings, session quality),
    where the arithmetic mean over-counts burst periods that emit many
    short-lived samples.

    One user-keyed window (LEAD) assigns each event its holding
    interval — no self-join; a user's last event holds nothing and
    drops out. The v·Δt products (µs-scaled value × µs duration)
    overflow int64 at ~10⁶ events·days, so the weighted sum
    accumulates in decimal(38,0) — the exact-moment pattern of
    q_price_quantity_correlation — and only the final per-group
    division happens in doubles (same decimal→double cast and
    floor in both engines)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("v_micros"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("dt_us").cast("bigint").alias("held_us"),
        F.floor(
            F.sum(
                F.col("v_micros").cast("decimal(38,0)")
                * F.col("dt_us").cast("decimal(38,0)")
            ).cast("double")
            / F.sum("dt_us").cast("double")
        ).cast("bigint").alias("twap_micros"),
    )


@query(
    "events_lateness_profile",
    oracle="""
WITH l AS (
  SELECT user_id,
         epoch_us(MAX(CAST(ts AS TIMESTAMP)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         - epoch_us(CAST(ts AS TIMESTAMP)) AS late_us
  FROM events
)
SELECT CASE WHEN late_us = 0 THEN 0
            ELSE length(CAST(late_us // 1000 AS VARCHAR)) END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(MAX(late_us) AS BIGINT) AS max_late_us
FROM l
GROUP BY 1
ORDER BY bucket
""",
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness telemetry: replay each user's stream in
    arrival order (event_id) and measure how far each event's time
    trails the running event-time maximum — THE measurement that
    sizes every watermark in the streaming stack (windowed aggs,
    dropDuplicates, the rate limiter's late_tolerance): pick the
    bucket that covers the tail you're willing to wait for, and
    everything later is the data you're explicitly agreeing to drop.
    Buckets are decimal orders of magnitude of lateness in ms
    (bucket = digit count; 0 = in order), computed via string length
    — exact integer arithmetic, no cross-engine log() drift.

    Plan: one partitioned running-max window per user (single-row
    state, any user cardinality), then a bucket rollup; the distinct
    user count is the only second shuffle. Nothing global ever sorts
    raw events."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros("ts")
    late = (F.max(us).over(w) - us).alias("late_us")
    lb = ev.select("user_id", late)
    bucket = F.when(F.col("late_us") == 0, F.lit(0)).otherwise(
        F.length(F.expr("cast(late_us div 1000 as string)"))
    )
    return (
        lb.select("user_id", "late_us", bucket.cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.max("late_us").cast("bigint").alias("max_late_us"),
        )
        .orderBy("bucket")
    )


# The declared legal lifecycle: a user may browse (view/click loops),
# enter via signup, convert from a click, recover from an error by
# browsing, and hit an error from any browsing step. Everything else
# (converting twice in a row, signing up mid-session, error→error
# loops, purchase→click backtracks …) is a conformance violation.
_LEGAL_TRANSITIONS = [
    "signup>view",
    "view>view",
    "view>click",
    "view>error",
    "click>view",
    "click>click",
    "click>purchase",
    "click>error",
    "purchase>view",
    "error>view",
]


@query(
    "events_illegal_transitions",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(MIN(event_id) AS BIGINT) AS first_event_id
FROM seq
WHERE prev_type IS NOT NULL
  AND prev_type || '>' || event_type NOT IN
      ({", ".join(f"'{t}'" for t in _LEGAL_TRANSITIONS)})
GROUP BY prev_type, event_type
""",
)
def events_illegal_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining conformance check: replay each user's event
    stream against the declared legal-transition whitelist and report
    every ILLEGAL consecutive pair with its frequency, affected-user
    count, and earliest exemplar — the log-vs-model deviation census
    (van der Aalst's conformance checking, the "token replay" special
    case for a free-choice lifecycle model expressible as a transition
    whitelist). This is how a pipeline owner detects instrumentation
    bugs (events emitted out of order), broken funnels (purchase
    without a preceding click) and bot traffic (error→error loops) in
    one report.

    Scale shape: ONE per-user window (lag over (ts, event_id) — the
    same single-shuffle sessionization partitioning every timeline
    operator shares), a whitelist filter that is a literal IN over a
    ~10-element set (no join, free at any volume), and a bounded
    rollup — output is at most |event_types|² rows. Per-user windows
    never globally sort; a hot user is one task's state, not a
    shuffle hotspot.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    pair = F.concat_ws(">", "prev_type", "event_type")
    return (
        seq.filter(
            F.col("prev_type").isNotNull()
            & ~pair.isin(_LEGAL_TRANSITIONS)
        )
        .groupBy("prev_type", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
        )
    )
