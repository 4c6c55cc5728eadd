"""Event-time windowed aggregation with watermarks — the Structured
Streaming semantics the reference never had (its timeline is wall-clock
appends, SURVEY.md §2.8 ST4: "no watermark-drop semantics exist in the
reference; no event-time"), but which any 100 TB event pipeline needs:
late data admitted within the watermark, state bounded by it, windows
emitted exactly once per (window, key) in append mode.

Batch/stream parity: each helper runs identically on a batch DataFrame
(watermark is a no-op in batch) and on a readStream DataFrame — the
tests exercise both and assert they agree, which is the Spark-native
way to prove a streaming aggregation correct.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_WATERMARK = "10 minutes"


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) per-type event
    counts. State is keyed by (window, event_type) and dropped once
    the watermark passes the window end — bounded regardless of
    stream length."""
    w = (
        F.window(ts_col, window)
        if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
            ).alias("total_value_micros"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value_micros",
        )
    )


def windowed_user_activity(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Distinct users per tumbling window via the streaming-legal
    rewrite: approx/exact distinct aggregations aren't allowed on
    streams, so distinct-per-window is two stacked aggregations —
    dedupe (window, user) pairs first, then count. Both stages share
    the watermark, so state stays bounded."""
    deduped = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return deduped.groupBy("win").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("n_events"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "n_users",
        "n_events",
    )


def attributed_conversions(
    events: DataFrame,
    cause_type: str = "click",
    effect_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream interval self-join: each ``effect_type`` event
    paired with the same user's ``cause_type`` events in the preceding
    ``within`` interval — conversion attribution, the canonical
    two-stream correlation.

    Both sides carry the watermark and the join condition bounds
    cause_ts to [effect_ts - within, effect_ts], so Spark can prove
    when a buffered row can never match again and evict it: state is
    O(watermark + within) per side, independent of stream length.
    An equi-join on user_id alone (no time bound) would be rejected /
    unbounded. Runs identically on a batch DataFrame (watermark no-op)
    — the parity test's correctness oracle.
    """
    causes = (
        events.withWatermark(ts_col, watermark)
        .filter(F.col("event_type") == cause_type)
        .select(
            F.col("user_id").alias("cause_user"),
            F.col(ts_col).alias("cause_ts"),
            F.col("event_id").alias("cause_id"),
        )
    )
    effects = (
        events.withWatermark(ts_col, watermark)
        .filter(F.col("event_type") == effect_type)
        .select(
            F.col("user_id").alias("user_id"),
            F.col(ts_col).alias("effect_ts"),
            F.col("event_id").alias("effect_id"),
        )
    )
    return effects.join(
        causes,
        (F.col("cause_user") == F.col("user_id"))
        & (F.col("cause_ts") <= F.col("effect_ts"))
        & (F.col("cause_ts") >= F.col("effect_ts") - F.expr(f"INTERVAL {within}")),
        "inner",
    ).select("user_id", "effect_id", "effect_ts", "cause_id", "cause_ts")


def unconverted_causes(
    events: DataFrame,
    cause_type: str = "click",
    effect_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: ``cause_type`` events
    that saw NO ``effect_type`` from the same user within ``within``
    afterward — the abandoned-cart / failed-funnel feed, which is a
    *harder* streaming problem than the inner join: an unmatched row
    can only be emitted once the watermark proves no future match can
    arrive, so null-padded results trail the watermark by design.

    Same bounded-state construction as attributed_conversions (both
    sides watermarked, join condition time-bounds the match window);
    the outer-ness adds no state, only the deferred emission. Runs
    identically on a batch DataFrame (the parity oracle), where it is
    the classic NOT EXISTS anti-join.
    """
    causes = (
        events.withWatermark(ts_col, watermark)
        .filter(F.col("event_type") == cause_type)
        .select(
            F.col("user_id").alias("user_id"),
            F.col(ts_col).alias("cause_ts"),
            F.col("event_id").alias("cause_id"),
        )
    )
    effects = (
        events.withWatermark(ts_col, watermark)
        .filter(F.col("event_type") == effect_type)
        .select(
            F.col("user_id").alias("effect_user"),
            F.col(ts_col).alias("effect_ts"),
            F.col("event_id").alias("effect_id"),
        )
    )
    joined = causes.join(
        effects,
        (F.col("effect_user") == F.col("user_id"))
        & (F.col("effect_ts") >= F.col("cause_ts"))
        & (F.col("effect_ts") <= F.col("cause_ts") + F.expr(f"INTERVAL {within}")),
        "left_outer",
    )
    return joined.filter(F.col("effect_id").isNull()).select(
        "user_id", "cause_id", "cause_ts"
    )


def user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time sessionization via ``session_window``: per-user
    sessions that close after ``gap`` of inactivity, with event count
    and value total per session.

    This is the native-streaming face of the batch sessionization in
    operators/timeline.py (LAG-gap islands): in a stream, Spark merges
    adjacent windows into growing sessions and finalizes one once the
    watermark passes session_end + gap — state per (user, open
    session), bounded by the watermark, emitted exactly once in append
    mode. Runs identically on a batch DataFrame (the parity oracle).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
            ).alias("total_value_micros"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value_micros",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once → effectively-once: drop redelivered rows by key
    with state BOUNDED by the watermark (``dropDuplicatesWithinWatermark``)
    — the ST2/ST4 idempotent-redelivery semantic for event streams,
    where plain ``dropDuplicates`` on a stream would keep every key
    ever seen (state grows without bound; a non-plan at 100 TB).

    The watermark is the redelivery horizon: duplicates arriving
    within it are suppressed, state for older keys is evicted. On a
    batch DataFrame the same helper is plain ``dropDuplicates`` — the
    parity oracle (batch input has no redelivery horizon).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))
