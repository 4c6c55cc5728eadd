"""Warehouse temporal operators: SCD Type-2 history and snapshot diff.

The reference keeps only current state (documents, api_keys rows are
SCD Type-1: update-in-place — internal/database/documents.go upserts);
a warehouse built on an append-only event stream needs the temporal
complements every dimensional pipeline ships:

- *SCD Type-2 history build*: turn the change stream into validity
  intervals (state, valid_from, valid_to, is_current) — the Kimball
  type-2 dimension derived with two windows, no self-join.
- *Snapshot diff (CDC reconciliation)*: the state table as of T1 vs
  as of T2, keyed diff — what an incremental pipeline replays/audits
  when two loads disagree.

Both are pure window/join compositions over the events table — one
user_id shuffle each, integer-µs arithmetic so the DuckDB oracles
hash-match exactly. At 100 TB both partition by the entity key, and
the SCD2 output is exactly the layout you'd range-partition by
(entity, valid_from) for time-travel lookups.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from the_hive_spark.registry import query
from the_hive_spark.tables import table

SCD2_OPEN_END_US = 9_223_372_036_854_775_807  # int64 max = still current

SNAP_T1 = "2024-01-15"
SNAP_T2 = "2024-01-25"


@query(
    "events_scd2_history",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, event_type AS state, ts,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_state
  FROM events
), changes AS (
  SELECT user_id, event_id, state, epoch_us(CAST(ts AS TIMESTAMP)) AS vf
  FROM seq WHERE prev_state IS NULL OR prev_state != state
)
SELECT user_id, state,
       CAST(vf AS BIGINT) AS valid_from_us,
       CAST(COALESCE(
         LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf, event_id),
         {SCD2_OPEN_END_US}) AS BIGINT) AS valid_to_us,
       (LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf, event_id) IS NULL)
         AS is_current
FROM changes
""",
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from the event stream: collapse each
    user's consecutive same-type events into validity intervals —
    (state, valid_from, valid_to, is_current), open intervals carrying
    the int64-max sentinel so BETWEEN lookups need no NULL handling.

    Two windows on the same (user_id) partitioning — change-point
    detection via LAG, interval close via LEAD — so the whole history
    build is ONE shuffle of the stream and never a self-join. ties on
    ts break by event_id on both engines, keeping zero-length
    intervals (same-µs flips) deterministic.
    """
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("vf"),
        F.lag("event_type").over(w).alias("prev_state"),
    )
    changes = seq.filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    w2 = Window.partitionBy("user_id").orderBy(F.asc("vf"), F.asc("event_id"))
    nxt = F.lead("vf").over(w2)
    return changes.select(
        "user_id",
        "state",
        F.col("vf").cast("bigint").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(SCD2_OPEN_END_US)).cast("bigint").alias(
            "valid_to_us"
        ),
        nxt.isNull().alias("is_current"),
    )


def _snapshot_sql(cutoff: str) -> str:
    return f"""
  SELECT user_id, state FROM (
    SELECT user_id, event_type AS state,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
             AS rn
    FROM events WHERE ts < TIMESTAMP '{cutoff}'
  ) WHERE rn = 1
"""


@query(
    "events_snapshot_diff",
    oracle=f"""
WITH s1 AS ({_snapshot_sql(SNAP_T1)}), s2 AS ({_snapshot_sql(SNAP_T2)})
SELECT s2.user_id,
       s1.state AS old_state,
       s2.state AS new_state,
       CASE WHEN s1.user_id IS NULL THEN 'added' ELSE 'changed' END
         AS change_type
FROM s2 LEFT JOIN s1 ON s1.user_id = s2.user_id
WHERE s1.user_id IS NULL OR s1.state != s2.state
""",
)
def events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC reconciliation: the per-user state table as of {SNAP_T1}
    vs as of {SNAP_T2}, emitting the keyed diff (added / changed) an
    incremental load would have to apply — the audit every CDC
    pipeline runs when a snapshot and its incrementals disagree.

    Both snapshots are newest-per-key windows (the last-touch
    compaction shape) over cutoff-filtered scans — the cutoff
    predicate pushes to the parquet scan — followed by ONE user_id
    equi-join; append-only streams can't produce 'removed', so the
    diff is a left join, not full outer.
    """
    def snapshot(cutoff: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            table(spark, sf_dir, "events")
            .filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
            .select(
                "user_id",
                F.col("event_type").alias("state"),
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    s1 = snapshot(SNAP_T1).withColumnRenamed("state", "old_state")
    s2 = snapshot(SNAP_T2).withColumnRenamed("state", "new_state")
    j = s2.join(s1, "user_id", "left")
    return j.filter(
        F.col("old_state").isNull()
        | (F.col("old_state") != F.col("new_state"))
    ).select(
        "user_id",
        "old_state",
        "new_state",
        F.when(F.col("old_state").isNull(), "added")
        .otherwise("changed")
        .alias("change_type"),
    )


@query(
    "events_p95_exceedance",
    oracle="""
WITH ranked AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_micros,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT),
                                     event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), thr AS (
  SELECT event_type,
         CAST(MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN value_micros END)
              AS BIGINT) AS p95_micros
  FROM ranked GROUP BY event_type
)
SELECT e.event_type, e.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_exceed,
       CAST(MAX(CAST(FLOOR(e.value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS max_value_micros,
       ANY_VALUE(t.p95_micros) AS p95_micros
FROM events e JOIN thr t ON t.event_type = e.event_type
WHERE CAST(FLOOR(e.value * 1000000 + 0.5) AS BIGINT) > t.p95_micros
GROUP BY e.event_type, e.user_id
""",
)
def events_p95_exceedance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-threshold alerting: users whose events exceed their
    event type's exact p95 value, with exceedance counts and the
    per-type threshold — the standard two-pass alert shape (derive the
    threshold from the data, then filter the stream against it) used
    for spend caps, latency SLOs, and abuse flags.

    Pass 1 computes the exact lower-nearest-rank p95 per type (same
    integer-µs rank arithmetic as events_value_percentiles); the
    resulting threshold table is |types| rows and BROADCASTS into
    pass 2's scan-side filter — the fact stream never joins anything
    its own size, and the final aggregate is map-side combined on
    (type, user).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "user_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("value_micros"),
    )
    w = Window.partitionBy("event_type").orderBy("value_micros", "event_id")
    wn = Window.partitionBy("event_type")
    thr = (
        ev.select(
            "event_type",
            "value_micros",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.floor((95 * F.col("n") + 99) / F.lit(100)),
                    F.col("value_micros"),
                )
            )
            .cast("bigint")
            .alias("p95_micros")
        )
    )
    return (
        ev.join(F.broadcast(thr), "event_type")
        .filter(F.col("value_micros") > F.col("p95_micros"))
        .groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exceed"),
            F.max("value_micros").cast("bigint").alias("max_value_micros"),
            F.first("p95_micros").cast("bigint").alias("p95_micros"),
        )
    )


@query(
    "events_weekday_seasonality",
    oracle="""
WITH daily AS (
  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         -- +1: DuckDB numbers Sunday as 0, Spark's dayofweek as 1
         CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY day, dow
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_all, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily
)
SELECT d.dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(d.n) AS BIGINT) AS n_events,
       CAST(FLOOR(1000000.0 * SUM(d.n) * ANY_VALUE(t.n_days)
                  / (COUNT(*) * ANY_VALUE(t.n_all)) + 0.5) AS BIGINT)
         AS seasonal_index_ppm
FROM daily d CROSS JOIN tot t
GROUP BY d.dow
""",
)
def events_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index: each weekday's mean daily volume
    relative to the overall mean daily volume (ppm; 1,000,000 = an
    average day) — the deseasonalization factor table that turns raw
    daily counts into trend-comparable series (capacity planning,
    anomaly baselines, the divisor in front of any WoW comparison).

    Index arithmetic is one cross-multiplied integer ratio —
    mean_dow/mean_all = (Σn_dow · days_all)/(days_dow · n_all) — with
    a single final IEEE division, so the table hashes stably.
    int64 headroom: the only integer product is days_dow·n_all ≤
    n_days·n_all; with a ≤10⁴-day calendar that stays exact past
    9·10¹⁴ total events (≈sf 10⁶) — beyond it, ANSI mode fails loud
    rather than wrapping (tests/test_overflow_bounds.py). The
    heavy pass is one map-side-combined daily aggregation; everything
    after runs on the calendar grid.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.dayofweek("ts").cast("bigint").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = daily.agg(
        F.sum("n").alias("n_all"), F.count(F.lit(1)).alias("n_days")
    ).collect()[0]
    n_all, n_days_all = int(tot["n_all"]), int(tot["n_days"])
    idx = (
        1000000.0
        * F.sum("n")
        * F.lit(n_days_all)
        / (F.count(F.lit(1)) * F.lit(n_all))
    )
    return daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.floor(idx + F.lit(0.5)).cast("bigint").alias("seasonal_index_ppm"),
    )


@query(
    "events_user_lifecycle",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         CAST(ts AS DATE) AS d
  FROM events
), seq AS (
  SELECT user_id, day, d,
         LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
  FROM active
), state AS (
  SELECT day,
         CASE WHEN prev_d IS NULL THEN 'new'
              WHEN d - prev_d = 1 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM seq
)
SELECT day, state, CAST(COUNT(*) AS BIGINT) AS n_users
FROM state GROUP BY day, state
""",
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: every active (user, day) classified as NEW
    (first day ever), RETAINED (also active the previous calendar
    day), or RESURRECTED (returning after a gap) — the daily
    decomposition behind every growth dashboard's "where did today's
    actives come from" chart, and the input to churn math (churned(d)
    = active(d−1) − retained(d)).

    One distinct (user, day) pass, one LAG over each user's active-day
    sequence, a (day, state) rollup — single user_id shuffle, grid-
    sized output. Day arithmetic is calendar-exact on both engines
    (date difference in days, no timestamp subtraction).
    """
    ev = table(spark, sf_dir, "events")
    active = ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("ts").cast("date").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    seq = active.withColumn("prev_d", F.lag("d").over(w))
    state = F.when(F.col("prev_d").isNull(), "new").when(
        F.datediff("d", "prev_d") == 1, "retained"
    ).otherwise("resurrected")
    return (
        seq.select("day", state.alias("state"))
        .groupBy("day", "state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@query(
    "events_unconverted_clicks",
    oracle="""
SELECT c.user_id,
       c.event_id AS cause_id,
       CAST(epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS cause_ts_us
FROM events c
WHERE c.event_type = 'click'
  AND NOT EXISTS (
    SELECT 1 FROM events e
    WHERE e.event_type = 'purchase' AND e.user_id = c.user_id
      AND e.ts >= c.ts
      AND e.ts <= c.ts + INTERVAL 1 HOUR)
""",
)
def events_unconverted_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stream-stream LEFT OUTER interval join
    (streaming/windows.py::unconverted_causes): clicks with no
    purchase from the same user in the following hour — the
    abandoned-funnel feed. The driver-oracled face proves the exact
    semantics the streaming form emits after its watermark closes;
    batch/stream parity is pinned in tests/test_streaming.py. The
    oracle states it as NOT EXISTS — the anti-join every engine lowers
    the unmatched-left-side question to.
    """
    from the_hive_spark.streaming.windows import unconverted_causes

    ev = table(spark, sf_dir, "events")
    return unconverted_causes(ev).select(
        "user_id",
        "cause_id",
        F.unix_micros("cause_ts").cast("bigint").alias("cause_ts_us"),
    )


@query(
    "events_daily_trend_slope",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, x
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(y) AS BIGINT) AS n_events,
       CAST(FLOOR(1000.0 * (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                  / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) + 0.5) AS BIGINT)
         AS slope_milli_per_day
FROM daily
GROUP BY event_type
HAVING COUNT(*) >= 2
""",
)
def events_daily_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type volume trend: the ordinary-least-squares slope of
    daily event counts over the day index (milli-events/day) — the
    "is this metric growing or decaying, and how fast" number behind
    every trend arrow, computed exactly: OLS slope =
    (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) where every sum is exact int64
    and the single division happens once per type.

    One map-side-combined daily aggregation (the corpus pass), then
    four integer sums over the per-type day grid — the same
    reduce-then-analyze shape as the CUSUM changepoint.

    Types active on exactly one day are excluded (HAVING n ≥ 2 on both
    sides): there the OLS denominator is 0, where Spark's non-ANSI
    division yields NULL but DuckDB's IEEE division yields ±inf — the
    guard keeps the cross-engine contract on defined slopes only.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    n = F.count(F.lit(1))
    slope = (
        1000.0
        * (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
        / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            n.cast("bigint").alias("n_days"),
            F.sum("y").cast("bigint").alias("n_events"),
            F.floor(slope + F.lit(0.5)).cast("bigint").alias(
                "slope_milli_per_day"
            ),
        )
        .filter(F.col("n_days") >= 2)
    )


RFM_ASOF = "2024-02-01"


@query(
    "events_rfm_segments",
    oracle=f"""
WITH rfm AS (
  SELECT user_id,
         CAST(DATE '{RFM_ASOF}' - MAX(CAST(ts AS DATE)) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_micros
  FROM events GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary_micros,
       CAST(NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary_micros, user_id) AS BIGINT) AS m_score
FROM rfm
""",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation as of {RFM_ASOF}: per user, recency (days
    since last event), frequency (event count), monetary (value
    total), each banded into quintiles — the CRM segmentation whose
    (r, f, m) triple drives retention campaigns ("champions" = 555,
    "at risk" = high m, low r). Higher score = better customer, so
    recency ranks DESCENDING (most-recent last) while f/m rank
    ascending; all three NTILEs carry a user_id tie-break for
    engine-stable banding.

    One corpus pass builds the per-user rollup (matstore-materialized
    so the three rankings don't rescan the fact); each quintile is
    then an EXACT distributed rank (functions/ids.py::
    dense_sequential_ids — range-partition + per-partition row_number
    + offsets, no single-partition stage) banded by integer NTILE
    arithmetic (ids.ntile_from_rank), hash-identical to the bare
    NTILE window the oracle states.
    """
    from the_hive_spark.functions.ids import (
        dense_sequential_ids,
        ntile_from_rank,
    )
    from the_hive_spark.functions.matstore import materialized

    ev = table(spark, sf_dir, "events")
    rfm = materialized(
        spark,
        ("rfm_rollup", sf_dir, RFM_ASOF),
        lambda: ev.groupBy("user_id").agg(
            F.datediff(
                F.lit(RFM_ASOF).cast("date"), F.max(F.col("ts").cast("date"))
            )
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
            ).alias("monetary_micros"),
        ),
    )
    n = rfm.count()  # cached rollup — O(partitions) job
    # recency ranks DESCENDING: negate the key so the ascending
    # range-partitioned rank gives the DESC, user_id ASC total order
    ranked = dense_sequential_ids(
        rfm.withColumn("_neg_rec", -F.col("recency_days")),
        ["_neg_rec", "user_id"],
        id_col="_r_rank",
    ).drop("_neg_rec")
    ranked = dense_sequential_ids(
        ranked, ["frequency", "user_id"], id_col="_f_rank"
    )
    ranked = dense_sequential_ids(
        ranked, ["monetary_micros", "user_id"], id_col="_m_rank"
    )
    return ranked.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micros",
        ntile_from_rank("_r_rank", n, 5).alias("r_score"),
        ntile_from_rank("_f_rank", n, 5).alias("f_score"),
        ntile_from_rank("_m_rank", n, 5).alias("m_score"),
    )


@query(
    "events_type_audience_overlap",
    oracle="""
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), sz AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM tu GROUP BY event_type
), pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, p.n_common,
       sa.n_users AS n_a, sb.n_users AS n_b,
       CAST(FLOOR(1000000.0 * p.n_common
                  / (sa.n_users + sb.n_users - p.n_common) + 0.5) AS BIGINT)
         AS overlap_ppm
FROM pair p
JOIN sz sa ON sa.event_type = p.type_a
JOIN sz sb ON sb.event_type = p.type_b
""",
)
def events_type_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of event types, how
    many users do BOTH, with the Jaccard of the two audiences (ppm) —
    the segmentation readout behind "do purchasers also open errors",
    feature-adoption overlap, and funnel design.

    The distinct (type, user) projection collapses the fact stream to
    at most |types|·|users| rows BEFORE any pairing; the self-join on
    user_id fans out to C(|types per user|, 2) per user — bounded by
    the (tiny, closed) type domain squared, never by event volume.
    One fact shuffle for the distinct, one user-keyed join, a
    |types|²-key rollup.
    """
    ev = table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sz = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    a, b = tu.alias("a"), tu.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    overlap = 1000000.0 * F.col("n_common") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        pair.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            "n_a",
            "n_b",
            F.floor(overlap + F.lit(0.5)).cast("bigint").alias("overlap_ppm"),
        )
    )


PARETO_GRID = [1, 5, 10, 20, 50]  # top-X% marks


@query(
    "events_pareto_concentration",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rn,
         COUNT(*) OVER () AS n, SUM(c) OVER () AS tot
  FROM per_user
), cum AS (
  SELECT rn, n, tot, SUM(c) OVER (ORDER BY rn) AS cum_c FROM ranked
)
SELECT CAST(p.pct AS BIGINT) AS top_pct,
       CAST(MAX(CASE WHEN cum.rn = greatest(p.pct * cum.n // 100, 1)
                     THEN cum.cum_c END) AS BIGINT) AS n_events,
       CAST(FLOOR(1000000.0 * MAX(CASE WHEN cum.rn = greatest(p.pct * cum.n // 100, 1)
                     THEN cum.cum_c END) / ANY_VALUE(cum.tot) + 0.5) AS BIGINT)
         AS share_ppm
FROM cum CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in PARETO_GRID)}]) AS pct) p
GROUP BY p.pct
""",
)
def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration curve: the share of all events produced by
    the top 1/5/10/20/50% most-active users — the "80/20" readout
    behind capacity planning, whale detection, and the sampling-bias
    check before any per-user experiment.

    One per-user rollup (the corpus pass); the descending rank and the
    running sum are the EXACT distributed forms (functions/ids.py:
    dense_sequential_ids + distributed_prefix_sum — range-partitioned,
    no single-partition stage); the five marks are then ONE broadcast
    join of the materialized ranked table against the 5-row
    (pct → target rank) map — not five re-derivations of the ranked
    CTE. Integer rank arithmetic matches the oracle exactly.
    """
    from the_hive_spark.functions.ids import (
        dense_sequential_ids,
        distributed_prefix_sum,
    )

    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ranked = dense_sequential_ids(
        per_user.withColumn("_negc", -F.col("c")),
        ["_negc", "user_id"],
        id_col="rn",
    ).drop("_negc")
    # exclusive prefix in rank order; rn is unique so ties are moot
    ranked = distributed_prefix_sum(ranked, "rn", "c", out_col="_prev")
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("tot")
    ).collect()[0]
    n, tot = int(stats["n"]), int(stats["tot"] or 1)
    targets = [(pct, max(pct * n // 100, 1)) for pct in PARETO_GRID]
    tmap = spark.createDataFrame(targets, "top_pct bigint, rn bigint")
    return (
        ranked.withColumn("cum_c", F.col("_prev") + F.col("c"))
        .join(F.broadcast(tmap), "rn")
        .select(
            "top_pct",
            F.col("cum_c").cast("bigint").alias("n_events"),
            F.floor(1000000.0 * F.col("cum_c") / F.lit(tot) + F.lit(0.5))
            .cast("bigint")
            .alias("share_ppm"),
        )
    )


@query(
    "events_burst_fano",
    oracle="""
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, day
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(x) AS BIGINT) AS n_events,
       CAST(FLOOR(1000.0 * (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                  / (COUNT(*) * SUM(x)) + 0.5) AS BIGINT) AS fano_milli
FROM daily GROUP BY event_type
""",
)
def events_burst_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per event type: the Fano factor (variance-to-mean
    ratio, milli-units) of daily counts — the overdispersion detector
    that separates Poisson-like background traffic (Fano ≈ 1000) from
    bursty sources (retry storms, batch jobs, scraping waves) whose
    variance far exceeds their mean even when totals look normal.

    Exact integer statistics: Fano = var/mean =
    (n·Σx² − (Σx)²)/(n·Σx) with all sums exact int64 and ONE final
    division — no float moments accumulate. Same reduce-then-analyze
    shape as the trend slope: one map-side-combined daily aggregation,
    then four sums per type over the day grid.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    n = F.count(F.lit(1))
    fano = (
        1000.0
        * (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        / (n * F.sum("x"))
    )
    return daily.groupBy("event_type").agg(
        n.cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("n_events"),
        F.floor(fano + F.lit(0.5)).cast("bigint").alias("fano_milli"),
    )


@query(
    "events_daily_gapfill",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, day_idx
), bounds AS (
  SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM daily
), types AS (
  SELECT DISTINCT event_type FROM daily
), spine AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS day_idx
  FROM types CROSS JOIN bounds
)
SELECT s.event_type, CAST(s.day_idx AS BIGINT) AS day_idx,
       CAST(COALESCE(d.c, 0) AS BIGINT) AS n_events,
       (d.c IS NULL) AS is_gap
FROM spine s
LEFT JOIN daily d ON d.event_type = s.event_type AND d.day_idx = s.day_idx
""",
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: a dense (type × day) grid over the
    observed date range with zero-filled missing days — the densify
    step every time-series consumer (trend fits, anomaly scans,
    charting) needs, because a day with NO rows is invisible to plain
    GROUP BY and silently biases averages and slopes.

    Scale shape: the fact collapses to the (type, day) rollup first —
    the only corpus pass; the spine is generated (sequence + explode)
    from a 1-row bounds broadcast times the tiny type dimension, so
    the left join is grid-sized on both sides, partitioned by type.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    bounds = daily.agg(
        F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi")
    )
    types = daily.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_idx"),
        )
    )
    return (
        spine.join(daily, ["event_type", "day_idx"], "left")
        .select(
            "event_type",
            F.col("day_idx").cast("bigint").alias("day_idx"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("n_events"),
            F.col("c").isNull().alias("is_gap"),
        )
    )


CHI2_SPLIT_TS = "2024-01-16 00:00:00"
CHI2_BUCKET_MICROS = 50_000_000  # 50-unit value buckets
CHI2_MAX_BUCKET = 9


@query(
    "events_drift_chi2_by_type",
    oracle=f"""
WITH e AS (
  SELECT event_type,
         CAST(ts AS TIMESTAMP) < TIMESTAMP '{CHI2_SPLIT_TS}' AS early,
         least(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
               // {CHI2_BUCKET_MICROS}, {CHI2_MAX_BUCKET}) AS bucket
  FROM events
), cnt AS (
  SELECT event_type, bucket,
         CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS o1,
         CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS o2
  FROM e GROUP BY event_type, bucket
), tot AS (
  SELECT event_type,
         CAST(SUM(o1) AS BIGINT) AS n1, CAST(SUM(o2) AS BIGINT) AS n2
  FROM cnt GROUP BY event_type
)
SELECT c.event_type, t.n1, t.n2,
       CAST(SUM(CAST(FLOOR(
         (1000000.0 * CAST((c.o1 * t.n2 - c.o2 * t.n1) AS DOUBLE)
                    * CAST((c.o1 * t.n2 - c.o2 * t.n1) AS DOUBLE))
         / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)
            * CAST((c.o1 + c.o2) AS DOUBLE))
         + 0.5) AS BIGINT)) AS BIGINT) AS chi2_micro
FROM cnt c JOIN tot t ON t.event_type = c.event_type
WHERE t.n1 > 0 AND t.n2 > 0
GROUP BY c.event_type, t.n1, t.n2
""",
)
def events_drift_chi2_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor, chi-square flavor: per event type,
    the two-sample χ² statistic between the value distributions of the
    first and second half of the window (10 fixed-width value buckets)
    — the categorical-bucket complement of the KS drift monitor
    (doc_drift_ks_by_source), and the standard "did my feature
    distribution shift" alarm of ML monitoring.

    Determinism across engines without giving up the statistic: the
    2×2 per-bucket term is algebraically collapsed to the all-integer
    form D²/(n1·n2·(o1+o2)) with D = o1·n2 − o2·n1 (exact BIGINT),
    leaving exactly THREE double ops per bucket (two multiplies, one
    divide — engines agree bit-for-bit on identical IEEE op
    sequences, where the textbook per-half (O−E)²/E chain drifted in
    the last ulp); terms floor to integer micro-units PER BUCKET and
    only integers are summed, so no order-dependent float
    accumulation ever happens. One fact pass to the (type, bucket,
    half) rollup; everything after is grid-sized. Types active in
    only one half are excluded (expected counts 0, χ² undefined).
    D stays inside the double's exact-integer range up to ~10⁷ rows
    per (type, bucket) half — past that, rescale the bucket grid.
    """
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (F.col("ts") < F.lit(CHI2_SPLIT_TS).cast("timestamp")).alias("early"),
        F.least(
            F.expr(
                f"CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)"
                f" div {CHI2_BUCKET_MICROS}"
            ),
            F.lit(CHI2_MAX_BUCKET),
        ).alias("bucket"),
    )
    cnt = e.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).cast("bigint").alias("o1"),
        F.sum(F.when(F.col("early"), 0).otherwise(1)).cast("bigint").alias("o2"),
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("o1").cast("bigint").alias("n1"),
        F.sum("o2").cast("bigint").alias("n2"),
    )
    term = F.expr(
        "CAST(FLOOR("
        "(1000000.0 * CAST((o1 * n2 - o2 * n1) AS DOUBLE)"
        "           * CAST((o1 * n2 - o2 * n1) AS DOUBLE))"
        " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
        "    * CAST((o1 + o2) AS DOUBLE))"
        " + 0.5) AS BIGINT)"
    )
    return (
        cnt.join(F.broadcast(tot), "event_type")
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .groupBy("event_type", "n1", "n2")
        .agg(F.sum(term).cast("bigint").alias("chi2_micro"))
    )


@query(
    "events_forecast_holt",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, day_idx
), series AS (
  SELECT event_type, list(y * 1000000 ORDER BY day_idx) AS ys
  FROM daily GROUP BY event_type
), walk AS (
  -- sequential fold as an explicit recursion: one state row per
  -- (type, step), unambiguous evaluation order
  SELECT event_type, 1 AS i, ys[1] AS l, CAST(0 AS BIGINT) AS t, ys
  FROM series
  UNION ALL
  SELECT event_type, i + 1,
         CAST(FLOOR((ys[i + 1] + l + t) / 2.0) AS BIGINT),
         CAST(FLOOR((CAST(FLOOR((ys[i + 1] + l + t) / 2.0) AS BIGINT) - l)
                    / 4.0) AS BIGINT)
           + t + CAST(FLOOR((0 - t) / 4.0) AS BIGINT),
         ys
  FROM walk WHERE i < len(ys)
)
SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days,
       CAST(l AS BIGINT) AS level_micro,
       CAST(t AS BIGINT) AS trend_micro,
       CAST(l + 7 * t AS BIGINT) AS forecast_7d_micro
FROM walk WHERE i = len(ys)
""",
)
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing forecast per event type
    (α = 1/2, β = 1/4): level/trend state after folding the daily
    series, plus the 7-day-ahead projection — the capacity-planning
    forecast a metrics stack derives from every counter.

    A time recurrence cannot parallelize WITHIN a series, so the
    engine shape is: one fact pass to the daily rollup, collect each
    type's (short) series into an in-row array, and run the recurrence
    as a JVM ``aggregate`` fold — sequential per row, parallel across
    types, no driver loop and no window.

    Determinism: the recurrence is QUANTIZED to integer micro-units —
    l' = ⌊(y + l + t)/2⌋, t' = ⌊(l' − l)/4⌋ + ⌊3t/4⌋ — because the
    float form's dyadic state outgrows the 53-bit mantissa within ~25
    steps, after which engines legitimately disagree in the last ulp
    (measured: DuckDB's list_reduce drifted milli-units from the
    Python/Spark fold). Every step here is integer add + exact
    power-of-two double division + FLOOR (floor-division that treats
    negatives identically on both engines, unlike `div` vs `//`), so
    the fold is bit-exact anywhere. Assumes near-contiguous daily
    series; gap days would need the gapfill spine upstream.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day_idx, y))),"
            " s -> s.y * CAST(1000000 AS BIGINT))"
        ).alias("ys")
    )
    st = F.expr(
        "aggregate(slice(ys, 2, size(ys) - 1),"
        " named_struct('l', ys[0], 't', CAST(0 AS BIGINT)),"  # Spark [] is 0-based
        " (acc, y) -> named_struct("
        "   'l', CAST(FLOOR((y + acc.l + acc.t) / 2.0D) AS BIGINT),"
        "   't', CAST(FLOOR((CAST(FLOOR((y + acc.l + acc.t) / 2.0D)"
        "                    AS BIGINT) - acc.l) / 4.0D) AS BIGINT)"
        "        + acc.t + CAST(FLOOR((0 - acc.t) / 4.0D) AS BIGINT)))"
    )
    return series.select(
        "event_type",
        F.size("ys").cast("bigint").alias("n_days"),
        st.alias("_st"),
    ).select(
        "event_type",
        "n_days",
        F.col("_st.l").cast("bigint").alias("level_micro"),
        F.col("_st.t").cast("bigint").alias("trend_micro"),
        (F.col("_st.l") + 7 * F.col("_st.t")).cast("bigint").alias(
            "forecast_7d_micro"
        ),
    )


ACF_MAX_LAG = 7


@query(
    "events_acf_by_lag",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, day_idx
), stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM daily GROUP BY event_type
), lagk AS (
  SELECT a.event_type, k.k,
         CAST(SUM(a.y * b.y) AS BIGINT) AS syyk,
         CAST(SUM(a.y) AS BIGINT) AS sa,
         CAST(SUM(b.y) AS BIGINT) AS sb,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS k) k
  CROSS JOIN daily a
  JOIN daily b ON b.event_type = a.event_type
              AND b.day_idx = a.day_idx + k.k
  GROUP BY a.event_type, k.k
)
SELECT l.event_type, CAST(l.k AS BIGINT) AS lag, l.m AS n_pairs,
       CAST(FLOOR(1000000.0
            * CAST(st.n * st.n * l.syyk - st.n * st.s * (l.sa + l.sb)
                   + l.m * st.s * st.s AS DOUBLE)
            / CAST(st.n * (st.n * st.syy - st.s * st.s) AS DOUBLE)
            + 0.5) AS BIGINT) AS acf_ppm
FROM lagk l JOIN stats st ON st.event_type = l.event_type
WHERE st.n * st.syy - st.s * st.s > 0
""",
)
def events_acf_by_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily counts per event type, lags
    1..{ACF_MAX_LAG} (ppm) — the seasonality detector behind "is this
    metric weekly-periodic" (a peak at lag 7) and the independence
    check before any i.i.d.-assuming statistic.

    Exactness across engines: ACF's mean-centered products expand to
    the cross-multiplied integer identity
    r_k = (n²·Σyᵈyᵈ⁺ᵏ − n·S·(Sₐ+S_b) + m·S²) / (n·(n·Σy² − S²))
    with every sum an exact int64 over the (tiny) per-type day grid —
    measured pair counts m and partial sums Sₐ/S_b keep the identity
    correct even for gappy series — and ONE double division per
    (type, lag). Types with zero variance are excluded (ACF
    undefined). Shape: one fact pass to the daily rollup; the lag
    join is grid×{ACF_MAX_LAG} rows, partitioned by type.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    ks = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("k"))
    a = daily.select(
        F.col("event_type"), F.col("day_idx"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day_idx").alias("day_b"),
        F.col("y").alias("yb"),
    )
    lagk = (
        a.crossJoin(F.broadcast(ks))
        .join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("day_b") == F.col("day_idx") + F.col("k")),
        )
        .groupBy("event_type", "k")
        .agg(
            F.sum(F.col("ya") * F.col("yb")).cast("bigint").alias("syyk"),
            F.sum("ya").cast("bigint").alias("sa"),
            F.sum("yb").cast("bigint").alias("sb"),
            F.count(F.lit(1)).cast("bigint").alias("m"),
        )
    )
    num = (
        F.col("n") * F.col("n") * F.col("syyk")
        - F.col("n") * F.col("s") * (F.col("sa") + F.col("sb"))
        + F.col("m") * F.col("s") * F.col("s")
    ).cast("double")
    den = (
        F.col("n") * (F.col("n") * F.col("syy") - F.col("s") * F.col("s"))
    ).cast("double")
    return (
        lagk.join(F.broadcast(stats), "event_type")
        .filter(F.col("n") * F.col("syy") - F.col("s") * F.col("s") > 0)
        .select(
            "event_type",
            F.col("k").cast("bigint").alias("lag"),
            F.col("m").alias("n_pairs"),
            F.floor(1000000.0 * num / den + F.lit(0.5))
            .cast("bigint")
            .alias("acf_ppm"),
        )
    )


@query(
    "events_type_diversity_daily",
    oracle="""
WITH c AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
         event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY day_idx, event_type
)
SELECT day_idx,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(FLOOR(1000000.0
            * CAST(SUM(c) * SUM(c) - SUM(c * c) AS DOUBLE)
            / CAST(SUM(c) * SUM(c) AS DOUBLE) + 0.5) AS BIGINT)
         AS diversity_ppm
FROM c GROUP BY day_idx
""",
)
def events_type_diversity_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-mix diversity: the Gini impurity 1 − Σpᵢ² of the
    type distribution per day (ppm; 0 = one type dominates, →1 −1/k =
    uniform over k types) — the log-free diversity index (Simpson's)
    that answers "did traffic collapse onto one event type today"
    without Shannon entropy's cross-engine log-rounding hazard:
    1 − Σ(cᵢ/N)² = (N² − Σcᵢ²)/N² is an exact integer ratio with ONE
    double division per day. Two map-side-combined rollups, grid-sized
    everything after the fact pass.
    """
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n = F.sum("c")
    sq = F.sum(F.col("c") * F.col("c"))
    return c.groupBy("day_idx").agg(
        n.cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.floor(
            1000000.0
            * (n * n - sq).cast("double")
            / (n * n).cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("diversity_ppm"),
    )


@query(
    "events_peak_concurrency",
    oracle="""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('microsecond', prev_ts, ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
), sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, MIN(ts) AS s_ts, MAX(ts) AS e_ts
  FROM sessions GROUP BY user_id, session_id
), boundaries AS (
  SELECT epoch_us(s_ts) * 2 AS ord, 1 AS delta, s_ts AS ts FROM per_session
  UNION ALL
  SELECT epoch_us(e_ts) * 2 + 1 AS ord, -1 AS delta, e_ts AS ts
  FROM per_session
), running AS (
  SELECT ts, delta,
         SUM(delta) OVER (ORDER BY ord ROWS UNBOUNDED PRECEDING) AS conc
  FROM boundaries
)
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrent,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS sessions_started
FROM running GROUP BY day
""",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning number
    (license seats, connection pools, live-user high-water mark) — by
    the classic sweep line: every session contributes a +1 boundary at
    its start and a −1 at its end; concurrency is the running sum over
    boundaries in time order and the day's peak is its max. Starts
    sort before ends at the same instant (ord = µs·2 + {start:0,
    end:1}), so touching sessions count as concurrent and zero-
    duration (single-event) sessions still register.

    The global running sum is the single-partition-window trap: a bare
    ``SUM() OVER (ORDER BY ord)`` funnels every boundary through one
    task. Here it rides :func:`distributed_prefix_sum` (range
    partition → per-partition window → O(partitions) offset collect).
    Boundary ties at equal ord carry equal deltas (+1 with +1), so the
    per-day MAX is order-independent — the oracle's single-partition
    window computes the identical multiset. Plan: one user shuffle for
    sessionization, 2-rows-per-session boundary stream, one range
    shuffle, day-grid rollup.
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
                | (
                    (F.unix_micros("ts") - F.unix_micros("prev_ts"))
                    > 1_800_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w_run))
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts")
    )
    starts = per_session.select(
        (F.unix_micros("s_ts") * 2).alias("ord"),
        F.lit(1).alias("delta"),
        F.col("s_ts").alias("ts"),
    )
    ends = per_session.select(
        (F.unix_micros("e_ts") * 2 + 1).alias("ord"),
        F.lit(-1).alias("delta"),
        F.col("e_ts").alias("ts"),
    )
    from the_hive_spark.functions.ids import distributed_prefix_sum

    running = distributed_prefix_sum(
        starts.unionAll(ends), "ord", "delta", out_col="_prev"
    ).withColumn("conc", F.col("_prev") + F.col("delta"))
    return running.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.max("conc").cast("bigint").alias("peak_concurrent"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("sessions_started"),
    )


@query(
    "events_rollup_multigrain",
    oracle="""
WITH base AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk,
         event_type, user_id
  FROM events
)
SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
            WHEN GROUPING(d) = 0 THEN 'day'
            ELSE 'week' END AS grain,
       strftime(COALESCE(h, d, wk), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM base
GROUP BY event_type, GROUPING SETS ((h), (d), (wk))
""",
)
def events_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/week continuous-aggregate rollup in ONE scan — the
    hypertable materialization pattern (TimescaleDB continuous
    aggregates; Druid/Pinot rollup segments): every dashboard grain
    from a single pass instead of one query per zoom level.

    GROUPING SETS compiles to Expand (each row fans to its 3 grain
    tuples) + one partial-aggregated shuffle — strictly cheaper than 3
    scans of the fact at 100 TB, and the classic trade: 3× map-side
    rows for 1× I/O. COUNT(DISTINCT user) per grain rides the same
    expand (Spark plans the distinct as a second keyed aggregation,
    still one scan). Buckets format as strings so the hash is
    timezone-stable across engines (session TZ pinned UTC).
    """
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("week", "ts").alias("wk"),
        "event_type",
        "user_id",
    )
    grain = (
        F.when(F.grouping("h") == 0, F.lit("hour"))
        .when(F.grouping("d") == 0, F.lit("day"))
        .otherwise(F.lit("week"))
    )
    # grouping() markers are only resolvable inside the agg itself
    rolled = ev.groupingSets(
        [["h", "event_type"], ["d", "event_type"], ["wk", "event_type"]],
        "h", "d", "wk", "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        grain.alias("grain"),
        F.date_format(
            F.coalesce("h", "d", "wk"), "yyyy-MM-dd HH:mm:ss"
        ).alias("bucket_start"),
    )
    return rolled.select(
        "grain", "bucket_start", "event_type", "n_events", "n_users"
    )


@query(
    "events_dau_wau_mau",
    oracle="""
WITH ad AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
), days AS (
  SELECT DISTINCT day FROM ad
), wau_c AS (
  SELECT ad.day + CAST(i AS INTEGER) AS target_day, ad.user_id
  FROM ad, UNNEST(range(0, 7)) AS t(i)
), mau_c AS (
  SELECT ad.day + CAST(i AS INTEGER) AS target_day, ad.user_id
  FROM ad, UNNEST(range(0, 30)) AS t(i)
), dau AS (
  SELECT day, COUNT(DISTINCT user_id) AS dau FROM ad GROUP BY day
), wau AS (
  SELECT target_day AS day, COUNT(DISTINCT user_id) AS wau
  FROM wau_c GROUP BY target_day
), mau AS (
  SELECT target_day AS day, COUNT(DISTINCT user_id) AS mau
  FROM mau_c GROUP BY target_day
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       CAST(mau.mau AS BIGINT) AS mau,
       CAST(FLOOR(1000000.0 * dau.dau / mau.mau + 0.5) AS BIGINT)
         AS stickiness_ppm
FROM days d JOIN dau USING (day) JOIN wau USING (day) JOIN mau USING (day)
""",
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU + stickiness (DAU/MAU ppm) per active day — the
    growth-dashboard headline. Distinct-users-over-a-sliding-window
    cannot be a window function (COUNT(DISTINCT) OVER a 30-day frame
    is unsupported AND would hold per-frame user sets); the scalable
    form is the contribution explode: each active (user, day) row
    contributes itself to the 7 / 30 target days it keeps a user
    "active" for, then a plain per-day distinct count — map-side
    expand of the (user, day) table (≪ events), two keyed
    aggregations, no window state anywhere.

    Output days are the observed activity grid; a target day with no
    activity of its own is omitted (dashboards gapfill via
    events_daily_gapfill). Exact integers end-to-end; the single
    float division quantizes to ppm.
    """
    ev = table(spark, sf_dir, "events")
    ad = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    dau = ad.groupBy("day").agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    def contrib(n_days: int, out: str) -> DataFrame:
        return (
            ad.select(
                "user_id",
                F.explode(
                    F.expr(f"sequence(day, date_add(day, {n_days - 1}))")
                ).alias("day"),
            )
            .groupBy("day")
            .agg(F.count_distinct("user_id").cast("bigint").alias(out))
        )

    wau = contrib(7, "wau")
    mau = contrib(30, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            "mau",
            F.floor(1000000.0 * F.col("dau") / F.col("mau") + F.lit(0.5))
            .cast("bigint")
            .alias("stickiness_ppm"),
        )
    )


BOT_CV2_MAX_MILLI = 100  # CV² < 0.1 ⇒ suspiciously regular cadence
BOT_MIN_GAPS = 20


@query(
    "events_bot_regularity",
    oracle=f"""
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   LAG(CAST(ts AS TIMESTAMP))
                     OVER (PARTITION BY user_id
                           ORDER BY CAST(ts AS TIMESTAMP), event_id),
                   CAST(ts AS TIMESTAMP)) AS gap_us
  FROM events
), m AS (
  SELECT user_id,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(gap_us AS HUGEINT)) AS HUGEINT) AS sg,
         CAST(SUM(CAST(gap_us AS HUGEINT) * CAST(gap_us AS HUGEINT))
              AS HUGEINT) AS sgg
  FROM g WHERE gap_us IS NOT NULL
  GROUP BY user_id
  HAVING COUNT(*) >= {BOT_MIN_GAPS} AND SUM(gap_us) > 0
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_gaps,
       CAST(sg // n AS BIGINT) AS mean_gap_us,
       CAST(FLOOR(1000.0 * CAST(n * sgg - sg * sg AS DOUBLE)
                  / CAST(sg * sg AS DOUBLE) + 0.5) AS BIGINT) AS cv2_milli,
       (1000.0 * CAST(n * sgg - sg * sg AS DOUBLE)
          / CAST(sg * sg AS DOUBLE) < {BOT_CV2_MAX_MILLI}) AS flagged_bot
FROM m
""",
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cadence-regularity bot heuristic: per user, the squared
    coefficient of variation of inter-event gaps (CV² =
    n·Σg²/(Σg)² − 1, milli) — human traffic is bursty (CV² ≳ 1,
    cf. events_burst_fano at the daily grain), scripted traffic ticks
    like a metronome (CV² → 0), so a user with ≥{BOT_MIN_GAPS} gaps
    and CV² < {BOT_CV2_MAX_MILLI}/1000 is flagged for the abuse queue.

    Engine-stable: gap moments are exact integer sums in
    decimal(38,0)/HUGEINT; CV² reduces to one float division of exact
    operands (n·Σg² − (Σg)² over (Σg)²), same single-division rational
    form as the χ² drift test. One user-keyed window for gaps, one
    map-side-combined aggregation — the same two-exchange profile as
    sessionization, at any scale.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    gap = F.col("gap_us").cast("decimal(38,0)")
    m = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(gap).alias("sg"),
            F.sum(gap * gap).alias("sgg"),
        )
        .filter((F.col("n") >= BOT_MIN_GAPS) & (F.col("sg") > 0))
    )
    cv2 = (
        1000.0
        * (F.col("n") * F.col("sgg") - F.col("sg") * F.col("sg")).cast("double")
        / (F.col("sg") * F.col("sg")).cast("double")
    )
    return m.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_gaps"),
        # `div` = exact integral quotient on decimals (a decimal '/'
        # rounds at its result scale BEFORE floor — off-by-one risk
        # against the oracle's exact `//`)
        F.expr("CAST((sg div n) AS BIGINT)").alias("mean_gap_us"),
        F.floor(cv2 + F.lit(0.5)).cast("bigint").alias("cv2_milli"),
        (cv2 < BOT_CV2_MAX_MILLI).alias("flagged_bot"),
    )


SLO_BUDGET_PPM = 10_000  # 1% error budget
SLO_FAST_FACTOR_MILLI = 14_400  # page: short window burns 14.4x budget
SLO_SLOW_FACTOR_MILLI = 6_000  # ...AND long window burns 6x budget


@query(
    "events_slo_burn",
    oracle=f"""
WITH daily AS (
  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS errors
  FROM events GROUP BY day, d
), win AS (
  SELECT t.day, t.d, t.total AS tot_1d, t.errors AS err_1d,
         CAST(SUM(s.total) AS BIGINT) AS tot_7d,
         CAST(SUM(s.errors) AS BIGINT) AS err_7d
  FROM daily t JOIN daily s
    ON s.d <= t.d AND s.d > t.d - 7
  GROUP BY t.day, t.d, t.total, t.errors
)
SELECT day, err_1d, tot_1d, err_7d, tot_7d,
       CAST(FLOOR(1000000000.0 * err_1d
                  / (tot_1d * {SLO_BUDGET_PPM}) + 0.5) AS BIGINT)
         AS fast_burn_milli,
       CAST(FLOOR(1000000000.0 * err_7d
                  / (tot_7d * {SLO_BUDGET_PPM}) + 0.5) AS BIGINT)
         AS slow_burn_milli,
       (1000000000.0 * err_1d / (tot_1d * {SLO_BUDGET_PPM})
          >= {SLO_FAST_FACTOR_MILLI}
        AND 1000000000.0 * err_7d / (tot_7d * {SLO_BUDGET_PPM})
          >= {SLO_SLOW_FACTOR_MILLI}) AS page
FROM win
""",
)
def events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO error-budget burn rate (Google SRE workbook
    ch. 5): per day, the short-window (1 d) and long-window (7 d
    trailing) error rates expressed as multiples of a
    {SLO_BUDGET_PPM}-ppm budget (milli), paging only when BOTH exceed
    their thresholds — the alert that fires fast on real regressions
    but not on one noisy day, at day granularity over the events fact
    (swap hours in for days and nothing else changes).

    Exact: burn = 10⁹·err/(tot·budget_ppm) is one float division of
    integer operands; the trailing window is a bounded self-join on
    the DAY GRID (≤ calendar-sized input, 7-row fan-out) — the same
    rolling-window shape as q_rolling_revenue_7d, never a
    single-partition window over the fact. One heavy daily rollup,
    everything after is grid arithmetic.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.to_date("ts").alias("d"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("bigint")
        .alias("errors"),
    )
    t, s = daily.alias("t"), daily.alias("s")
    win = (
        t.join(
            s,
            (F.col("s.d") <= F.col("t.d"))
            & (F.col("s.d") > F.date_sub(F.col("t.d"), 7)),
        )
        .groupBy(
            F.col("t.day").alias("day"),
            F.col("t.total").alias("tot_1d"),
            F.col("t.errors").alias("err_1d"),
        )
        .agg(
            F.sum("s.total").cast("bigint").alias("tot_7d"),
            F.sum("s.errors").cast("bigint").alias("err_7d"),
        )
    )
    fast = (
        1000000000.0 * F.col("err_1d") / (F.col("tot_1d") * SLO_BUDGET_PPM)
    )
    slow = (
        1000000000.0 * F.col("err_7d") / (F.col("tot_7d") * SLO_BUDGET_PPM)
    )
    return win.select(
        "day",
        "err_1d",
        "tot_1d",
        "err_7d",
        "tot_7d",
        F.floor(fast + F.lit(0.5)).cast("bigint").alias("fast_burn_milli"),
        F.floor(slow + F.lit(0.5)).cast("bigint").alias("slow_burn_milli"),
        (
            (fast >= SLO_FAST_FACTOR_MILLI) & (slow >= SLO_SLOW_FACTOR_MILLI)
        ).alias("page"),
    )
