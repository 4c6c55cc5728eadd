"""Per-key token-bucket rate limiting as a stateful streaming operator.

The admission-control primitive in front of any per-tenant ingest or
API surface (the reference throttles per API key at the server; here
the same policy runs INSIDE the stream, so the decision scales with
the key space instead of a front-end box): each key holds a bucket of
``burst`` tokens refilled at ``rate_per_sec``; an event is admitted
iff a whole token is available, and every event is emitted with its
admit/deny verdict (deny streams feed alerting/audit, exactly like the
engine's alert sink).

Event-time driven and deterministic: refill is computed from the
EVENT timestamps (µs), not wall clock, so replaying the same input
yields the same admissions — the property the batch-parity test pins.
State EXPIRY is event-time too (the stream's watermark drives the
timeout), so how the input is paced into micro-batches cannot change
when a bucket drops: a key expires only once the watermark passes
last-event-time + burst/rate, the point at which the refill law would
have returned the bucket to full burst anyway. State per key is two
scalars (milli-tokens, last event-time µs); ``applyInPandasWithState``
shards keys across executors, so capacity is O(distinct keys /
cluster), with no coordination between keys.

Two operator harnesses share one recurrence: :func:`rate_limited`
(applyInPandasWithState, any state store) and
:func:`rate_limited_tws` (Spark 4 transformWithState, RocksDB store
required) — both call :func:`_bucket_admit`, so admissions are
bit-identical by construction and pinned by parity tests.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

DEFAULT_RATE_PER_SEC = 1.0
DEFAULT_BURST = 3

# The watermark column runs on a clock offset +1 s from ts_us. Spark
# initializes the watermark to epoch 0 and drops stateful-operator
# input at-or-below it, so an UNSHIFTED event at ts_us=0 (a perfectly
# valid instant) would be silently discarded in the very first batch.
# Only the watermark/expiry comparisons see this clock — admission
# arithmetic uses raw ts_us — and both setTimeoutTimestamp and the
# watermark derive from the same shifted column, so expiry points are
# unchanged.
_WM_OFFSET_US = 1_000_000

_STATE_SCHEMA = StructType(
    [
        StructField("tokens_milli", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("allowed", LongType()),  # 1 admit / 0 deny
        StructField("tokens_after_milli", LongType()),
    ]
)


def _concat_event_time_order(
    pdfs: Iterable[pd.DataFrame],
) -> tuple[np.ndarray, np.ndarray]:
    """(event_id, ts_us) int64 arrays in event-time order (id
    tiebreak) from a batch's chunked pandas frames. Columns come out
    as numpy int64 arrays and the sort is one lexsort — no pandas
    row iteration anywhere on this path."""
    parts = [p for p in pdfs if len(p)]
    if not parts:
        e = np.empty(0, np.int64)
        return e, e
    if len(parts) == 1:
        eid = parts[0]["event_id"].to_numpy(np.int64)
        ts = parts[0]["ts_us"].to_numpy(np.int64)
    else:
        eid = np.concatenate(
            [p["event_id"].to_numpy(np.int64) for p in parts])
        ts = np.concatenate(
            [p["ts_us"].to_numpy(np.int64) for p in parts])
    order = np.lexsort((eid, ts))  # event-time order, id tiebreak
    return eid[order], ts[order]


def _bucket_admit(
    eid: np.ndarray,
    ts: np.ndarray,
    tokens_milli: int,
    last_ts_us: int | None,
    rate_per_sec: float,
    burst: int,
) -> tuple[np.ndarray, np.ndarray, int, int | None]:
    """The token-bucket recurrence over one key's event-time-ordered
    batch: (allowed, tokens_after_milli, tokens_milli', last_ts_us').

    Preallocated outputs, primitive-int loop; the arithmetic is the
    reference recipe expression-for-expression (float refill multiply,
    floor-div 1000, clamp at burst·1000, admit costs exactly 1000).
    Both streaming harnesses — applyInPandasWithState's admit_events
    and the transformWithState TokenBucketProcessor — call THIS
    function, so their admissions cannot diverge."""
    n = len(ts)
    allowed = np.empty(n, np.int64)
    tokens_after = np.empty(n, np.int64)
    cap = burst * 1000
    t = tokens_milli
    lt = last_ts_us
    for i in range(n):
        u = int(ts[i])
        if lt is None:
            lt = u
        elif u > lt:
            refill = (u - lt) * rate_per_sec
            t = min(cap, t + int(refill // 1000))
            lt = u
        if t >= 1000:
            t -= 1000
            allowed[i] = 1
        else:
            allowed[i] = 0
        tokens_after[i] = t
    return allowed, tokens_after, t, lt


def admit_events(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    rate_per_sec: float = DEFAULT_RATE_PER_SEC,
    burst: int = DEFAULT_BURST,
) -> Iterable[pd.DataFrame]:
    """Stateful token-bucket admission for one key's events.

    Two distinct lateness regimes, and they compose: an input row
    at-or-below the stream's WATERMARK never reaches this function at
    all — Spark's stateful-operator contract drops it (size
    :func:`rate_limited`'s ``late_tolerance`` to the source's real
    out-of-orderness; the default is deliberately conservative).
    Rows that DO arrive but are out of order within the tolerance
    (ts before the bucket's last seen ts) refill nothing but still
    contend for tokens — the deterministic convention for replay.
    Integer milli-token arithmetic: refill = elapsed_us · rate / 1000
    (floor), capped at burst·1000; admit costs exactly 1000.

    State expiry is an EVENT-time timeout: the bucket drops when the
    stream's watermark passes last-event-time + max(60s, burst/rate)
    — the idle span over which the refill law would have returned it
    to full burst anyway, so an expired-then-recreated bucket admits
    identically to one that was never dropped. Because both refill
    AND expiry are functions of event time, micro-batch pacing cannot
    change admissions (the round-5 processing-time timeout could: a
    live run whose event time lagged wall clock expired state a
    back-to-back replay kept). The flip side is the standard
    watermark contract: input rows at-or-below the watermark are
    dropped by the operator itself (see :func:`rate_limited`'s
    ``late_tolerance``) — in-order sources are never affected.
    """
    user_id = int(key[0])
    if state.hasTimedOut:  # idle key: drop the bucket, full on return
        state.remove()
        return

    tokens_milli = burst * 1000
    last_ts_us = None
    if state.exists:
        tokens_milli, last = state.get
        last_ts_us = None if last < 0 else int(last)

    # Hot path (r10 verdict #7): this function runs once per key per
    # micro-batch over the whole event volume, and the original
    # itertuples + list-append form WAS the measured ~19 s per-batch
    # floor at sf10 (STREAM_FLOOR.json: state-store provider and
    # partition-count swaps moved p50 by <5%; the Python row loop is
    # where the time lives). The recurrence lives in _bucket_admit —
    # shared verbatim with the transformWithState processor below, so
    # the two operator harnesses admit bit-identically by construction
    # (pinned by test_streaming's batch/stream parity and
    # golden-admission tests).
    eid, ts = _concat_event_time_order(pdfs)
    allowed, tokens_after, tokens_milli, last_ts_us = _bucket_admit(
        eid, ts, tokens_milli, last_ts_us, rate_per_sec, burst
    )
    n = len(ts)

    state.update((tokens_milli, -1 if last_ts_us is None else last_ts_us))
    # State may only expire once the idle period is long enough that
    # event-time refill would have refilled the bucket to full burst
    # anyway (burst/rate seconds) — a shorter timeout would hand
    # slow-rate keys a fresh burst earlier than the rate allows. The
    # timeout is an event-time TIMESTAMP (watermark-driven), so expiry
    # is a pure function of the input events, replay-identical across
    # any micro-batch pacing. setTimeoutTimestamp must stay ahead of
    # the current watermark (Spark rejects an already-passed instant);
    # clamping forward is safe — expiring LATER than the refill floor
    # never changes admissions, it just holds a full-anyway bucket.
    # rate_per_sec <= 0 means block-after-burst FOREVER: refill never
    # adds tokens, so the state must never expire (expiry would mint a
    # fresh burst); leaving the timeout unset keeps it immortal,
    # bounded by key cardinality like any keyed-state operator.
    # Both the idle span and the µs→ms conversion CEIL so the expiry
    # instant is never EARLIER than the exact burst/rate refill point
    # (floor truncation could shave up to ~2 ms combined, letting a
    # recreated full bucket admit a volley a never-expired bucket
    # would still be refilling toward).
    if rate_per_sec > 0 and last_ts_us is not None:
        state.setTimeoutTimestamp(
            _expiry_instant_ms(
                last_ts_us, rate_per_sec, burst,
                state.getCurrentWatermarkMs(),
            )
        )
    if n:
        yield pd.DataFrame(
            {
                "user_id": np.full(n, user_id, dtype=np.int64),
                "event_id": eid,
                "ts_us": ts,
                "allowed": allowed,
                "tokens_after_milli": tokens_after,
            }
        )


def rate_limited(
    events: DataFrame,
    rate_per_sec: float = DEFAULT_RATE_PER_SEC,
    burst: int = DEFAULT_BURST,
    late_tolerance: str = "10 minutes",
) -> DataFrame:
    """Wire the token bucket onto a stream carrying
    (user_id, event_id, ts_us).

    ``late_tolerance`` is the watermark delay, and it carries the
    STANDARD Structured Streaming contract: an input row whose event
    time is at-or-below the watermark of its micro-batch (i.e. later
    than ``late_tolerance`` behind the max event time seen in PRIOR
    batches) is dropped by the stateful operator, exactly as in
    watermarked window aggregation or dropDuplicates. The default is
    deliberately conservative (10 minutes) so out-of-order sources do
    not silently lose rows — tightening it is an explicit opt-in that
    trades lateness coverage for earlier state expiry. For every
    accepted row, admissions are replay-identical across pacing (both
    refill and state expiry are functions of event time). In-order
    sources are never affected at any tolerance (a row can't trail a
    max seen only in earlier batches)."""

    def fn(key, pdfs, state):
        yield from admit_events(
            key, pdfs, state, rate_per_sec=rate_per_sec, burst=burst
        )

    return (
        events.withColumn(
            "ts_evt", F.timestamp_micros(F.col("ts_us") + _WM_OFFSET_US)
        )
        .withWatermark("ts_evt", late_tolerance)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- Spark 4 transformWithState harness -------------------------------
#
# STREAM_FLOOR.json pinned the applyInPandasWithState floor at ~3 ms
# CPU per key per batch in the per-key python-state exchange protocol
# (our UDF accounts for <1 s of a ~15 s stage), and named Spark 4's
# transformWithState — a different state protocol (Arrow-batched
# per-key dispatch + a state-server connection instead of inline
# per-key state rows) — as a path that could break it. This is that
# path: the SAME recurrence (_bucket_admit, shared by construction)
# on the new operator. Requires the RocksDB state store provider
# (Spark rejects transformWithState on the HDFS-backed provider).
#
# State is (tokens_milli, last_ts_us, timer_ms): the first two scalars
# are the bucket exactly as in _STATE_SCHEMA; timer_ms records the
# event-time expiry timer this key currently holds, because TWS timers
# are explicit objects (register/delete) rather than GroupState's
# single implicit timeout — re-arming requires deleting the previous
# instant, and the expiry callback must ignore a stale timer that a
# later batch already superseded.

_TWS_STATE_SCHEMA = StructType(
    [
        StructField("tokens_milli", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("timer_ms", LongType()),
    ]
)


def _expiry_instant_ms(
    last_ts_us: int, rate_per_sec: float, burst: int, watermark_ms: int
) -> int:
    """The event-time instant at which an idle bucket may drop: the
    point where refill law would have returned it to full burst anyway
    (≥60 s floor), ceil'd so expiry is never EARLIER than the exact
    refill point, clamped ahead of the current watermark (Spark
    rejects an already-passed instant; later never changes
    admissions). Shared by both harnesses."""
    idle_ms = max(60_000, math.ceil(1000 * burst / rate_per_sec))
    return max(
        -(-(last_ts_us + _WM_OFFSET_US) // 1000) + idle_ms,
        watermark_ms + 1,
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class TokenBucketProcessor(StatefulProcessor):
    """StatefulProcessor flavor of the token bucket (Spark 4
    transformWithStateInPandas). Admissions are bit-identical to
    :func:`admit_events` — both call :func:`_bucket_admit` — and the
    expiry law is the same event-time instant via
    :func:`_expiry_instant_ms`; only the state/timer plumbing differs
    (ValueState + explicit timers vs GroupState's implicit timeout).
    Pinned against the sibling by test_streaming's TWS parity tests.
    """

    def __init__(
        self,
        rate_per_sec: float = DEFAULT_RATE_PER_SEC,
        burst: int = DEFAULT_BURST,
    ) -> None:
        self._rate = rate_per_sec
        self._burst = burst

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState("bucket", _TWS_STATE_SCHEMA)

    def close(self) -> None:
        pass

    def handleInputRows(self, key, rows, timerValues):
        user_id = int(key[0])
        got = self._state.get()
        if got is None:
            tokens_milli, last_ts_us, old_timer = self._burst * 1000, None, None
        else:
            tokens_milli = int(got[0])
            last_ts_us = None if got[1] < 0 else int(got[1])
            old_timer = None if got[2] < 0 else int(got[2])

        eid, ts = _concat_event_time_order(rows)
        allowed, tokens_after, tokens_milli, last_ts_us = _bucket_admit(
            eid, ts, tokens_milli, last_ts_us, self._rate, self._burst
        )

        new_timer = -1
        if self._rate > 0 and last_ts_us is not None:
            new_timer = _expiry_instant_ms(
                last_ts_us, self._rate, self._burst,
                timerValues.getCurrentWatermarkInMs(),
            )
            if old_timer != new_timer:
                if old_timer is not None:
                    self._handle.deleteTimer(old_timer)
                self._handle.registerTimer(new_timer)
        self._state.update(
            (tokens_milli,
             -1 if last_ts_us is None else last_ts_us,
             new_timer)
        )
        n = len(ts)
        if n:
            yield pd.DataFrame(
                {
                    "user_id": np.full(n, user_id, dtype=np.int64),
                    "event_id": eid,
                    "ts_us": ts,
                    "allowed": allowed,
                    "tokens_after_milli": tokens_after,
                }
            )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # Drop the bucket only if the fired timer is the one this key
        # currently holds — a batch that ran after registration
        # re-armed the timer, and acting on the stale instant would
        # hand the key a fresh burst early. Spark deletes a fired
        # timer itself; nothing to clean up on the stale path.
        got = self._state.get()
        if got is not None and int(got[2]) == int(
            expiredTimerInfo.getExpiryTimeInMs()
        ):
            self._state.clear()
        return iter(())


def rate_limited_tws(
    events: DataFrame,
    rate_per_sec: float = DEFAULT_RATE_PER_SEC,
    burst: int = DEFAULT_BURST,
    late_tolerance: str = "10 minutes",
) -> DataFrame:
    """:func:`rate_limited` on the Spark 4 transformWithState
    operator — same input contract (user_id, event_id, ts_us), same
    OUTPUT_SCHEMA, same watermark/late-row contract, bit-identical
    admissions (shared :func:`_bucket_admit`). The session must run
    the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``); Spark rejects transformWithState
    on the default HDFS-backed provider at query start."""
    proc = TokenBucketProcessor(rate_per_sec=rate_per_sec, burst=burst)

    return (
        events.withColumn(
            "ts_evt", F.timestamp_micros(F.col("ts_us") + _WM_OFFSET_US)
        )
        .withWatermark("ts_evt", late_tolerance)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
