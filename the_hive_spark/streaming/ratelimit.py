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

# The watermark column runs on a clock offset +1 s from ts_us, so an
# event at ts_us=0 (a perfectly valid instant) maps to a positive
# timestamp: Spark initializes the watermark to epoch 0 and requires
# setTimeoutTimestamp to be strictly ahead of it, and a 0/negative
# shifted clock would wedge the very first batch's timer registration
# for such keys. Only the watermark/expiry comparisons see this clock
# — admission arithmetic uses raw ts_us — and both
# setTimeoutTimestamp and the watermark derive from the same shifted
# column, so expiry points are unchanged. (The operator family does
# NOT drop late input rows — see admit_events — so the offset is
# about timer validity, not input filtering.)
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

    Lateness: Spark does NOT filter late input rows for this operator
    family — map/flatMapGroupsWithState semantics pass every row to
    the function and use the watermark only for state timeouts
    (verified empirically by test_rate_limiter_snapshot_late_row
    _parity against Spark 4.1.2; an earlier revision of this
    docstring claimed the window-aggregation drop contract, which
    does not apply here). Out-of-order rows — whether within one
    batch (sorted into event-time order below) or arriving in a later
    batch (ts before the bucket's last seen ts) — refill nothing but
    still contend for tokens. Admissions are therefore replay-
    deterministic for a fixed input-to-batch assignment; an in-order
    feed is deterministic under ANY pacing, and a feed with
    cross-batch out-of-order rows is deterministic per pacing.
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
    back-to-back replay kept).
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

    ``late_tolerance`` is the watermark delay. For THIS operator
    family the watermark does not filter input: map/flatMapGroups
    WithState semantics pass late rows through to the function (they
    contend without refilling — see :func:`admit_events`; pinned
    empirically by test_rate_limiter_snapshot_late_row_parity). What
    the tolerance actually sizes is state-expiry timing: a smaller
    delay lets the watermark chase the stream closer and drop idle
    buckets sooner, which by the refill law never changes admissions
    — only state footprint. Admissions are replay-identical across
    pacing for in-order feeds (both refill and expiry are functions
    of event time); a feed with cross-batch out-of-order rows is
    deterministic per input-to-batch assignment."""

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


# --- snapshot-state harness (no state store) --------------------------
#
# STREAM_FLOOR.json localized the ~17-23 s per-batch floor of BOTH
# stateful-operator harnesses to per-key Python dispatch: ~3 ms of
# harness protocol per key per batch (state row exchange in
# applyInPandasWithState, state-server round-trips in
# transformWithState), with our UDF under 1 s of a ~15 s stage. The
# named fix was "carry the state yourself". This harness does that:
# bucket state lives in versioned parquet snapshots, each micro-batch
# unions state rows with the batch's events, hash-shuffles ONCE on
# user_id, sorts within partitions, and runs ONE segmented
# mapInPandas pass per partition — per-key cost drops from the
# harness's ~3 ms to a numpy slice, while admissions stay
# bit-identical (the same _bucket_admit recurrence; pinned by
# test_streaming's snapshot parity tests).
#
# Scale tradeoff vs a state store, stated honestly: the snapshot is
# REWRITTEN in full every batch — O(|keys|) parquet read + shuffle +
# write per batch, against RocksDB changelog's O(touched keys).
# It wins when most keys are touched every batch (the sf10 feed:
# ~150k of 150k) and on any workload where the per-key harness cost
# dominates; it loses on sparse-touch workloads over huge key spaces
# (100M idle keys would be re-shuffled each batch for no work).
# Watermark, late-row drops, and state expiry follow the same
# event-time laws as rate_limited (expiry timing is a state-SIZE
# concern only: an expired-then-recreated bucket admits identically
# by the refill law, so snapshot-vs-store expiry timing differences
# cannot change admissions).

_STATE_TS_SENTINEL = -(2**62)  # sorts before any real event ts
_NEVER_EXPIRES_MS = 2**62

_SNAP_WORK_SCHEMA = StructType(
    [
        StructField("kind", LongType()),  # 0 = state row, 1 = event
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("tokens_milli", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("expiry_ms", LongType()),
    ]
)

_SNAP_OUT_SCHEMA = StructType(
    list(_SNAP_WORK_SCHEMA.fields)
    + [
        StructField("allowed", LongType()),
        StructField("tokens_after_milli", LongType()),
    ]
)


def _parse_duration_ms(spec: str | int) -> int:
    """'10 minutes' / '0 seconds' / plain-int ms → milliseconds,
    mirroring the subset of Spark's CalendarInterval syntax the
    rate-limiter API documents."""
    if isinstance(spec, int):
        return spec
    import re

    m = re.fullmatch(
        r"\s*(\d+)\s*(millisecond|second|minute|hour|day)s?\s*", spec
    )
    if not m:
        raise ValueError(f"unsupported duration: {spec!r}")
    mult = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[m.group(2)]
    return int(m.group(1)) * mult


def _segmented_admit(rate_per_sec: float, burst: int, wm_ms: int):
    """Build the per-partition mapInPandas body: one Python call per
    partition, segmented by user_id (the partition is hash-shuffled on
    user_id and sorted by (user_id, ts_us, event_id), so each key is a
    contiguous run whose optional state sentinel — ts_us = -2^62 —
    leads it). Emits verdict rows (kind 1) and next-snapshot state
    rows (kind 0). Untouched keys pass their stored expiry through
    UNCHANGED — recomputing it under the current watermark clamp would
    push an idle key's expiry forward every batch and the bucket would
    never drop."""

    def run(it):
        chunks = [c for c in it if len(c)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1 else chunks[0]
        )
        uid = pdf["user_id"].to_numpy(np.int64)
        kind = pdf["kind"].to_numpy(np.int64)
        eid = pdf["event_id"].to_numpy(np.int64)
        ts = pdf["ts_us"].to_numpy(np.int64)
        tok = pdf["tokens_milli"].to_numpy(np.int64)
        lts = pdf["last_ts_us"].to_numpy(np.int64)
        exp = pdf["expiry_ms"].to_numpy(np.int64)
        n = len(uid)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], n]

        v_uid, v_eid, v_ts, v_alw, v_tok = [], [], [], [], []
        s_uid, s_tok, s_lt, s_exp = [], [], [], []
        cap = burst * 1000
        for s, e in zip(starts, ends):
            u = int(uid[s])
            if kind[s] == 0:
                t0, lt0, exp0 = int(tok[s]), int(lts[s]), int(exp[s])
                lt0 = None if lt0 < 0 else lt0
                s += 1
            else:
                t0, lt0, exp0 = cap, None, _NEVER_EXPIRES_MS
            if s == e:  # state-only segment: untouched key
                s_uid.append(u)
                s_tok.append(t0)
                s_lt.append(-1 if lt0 is None else lt0)
                s_exp.append(exp0)
                continue
            allowed, tokens_after, t1, lt1 = _bucket_admit(
                eid[s:e], ts[s:e], t0, lt0, rate_per_sec, burst
            )
            v_uid.append(np.full(e - s, u, np.int64))
            v_eid.append(eid[s:e])
            v_ts.append(ts[s:e])
            v_alw.append(allowed)
            v_tok.append(tokens_after)
            if rate_per_sec > 0 and lt1 is not None:
                new_exp = _expiry_instant_ms(lt1, rate_per_sec, burst, wm_ms)
            else:
                new_exp = _NEVER_EXPIRES_MS
            s_uid.append(u)
            s_tok.append(t1)
            s_lt.append(-1 if lt1 is None else lt1)
            s_exp.append(new_exp)

        zeros = lambda m: np.zeros(m, np.int64)  # noqa: E731
        if v_uid:
            m = sum(len(a) for a in v_uid)
            yield pd.DataFrame(
                {
                    "kind": np.ones(m, np.int64),
                    "user_id": np.concatenate(v_uid),
                    "event_id": np.concatenate(v_eid),
                    "ts_us": np.concatenate(v_ts),
                    "tokens_milli": zeros(m),
                    "last_ts_us": zeros(m),
                    "expiry_ms": zeros(m),
                    "allowed": np.concatenate(v_alw),
                    "tokens_after_milli": np.concatenate(v_tok),
                }
            )
        if s_uid:
            m = len(s_uid)
            yield pd.DataFrame(
                {
                    "kind": zeros(m),
                    "user_id": np.asarray(s_uid, np.int64),
                    "event_id": np.full(m, -1, np.int64),
                    "ts_us": np.full(m, _STATE_TS_SENTINEL, np.int64),
                    "tokens_milli": np.asarray(s_tok, np.int64),
                    "last_ts_us": np.asarray(s_lt, np.int64),
                    "expiry_ms": np.asarray(s_exp, np.int64),
                    "allowed": zeros(m),
                    "tokens_after_milli": zeros(m),
                }
            )

    return run


class SnapshotRateLimiter:
    """The token bucket carried on self-managed snapshot state instead
    of a state store. ``start_query(stream, sink, checkpoint)`` runs a
    plain foreachBatch query; each batch joins the latest snapshot,
    admits via the shared :func:`_bucket_admit`, hands the verdict
    DataFrame to ``sink``, and writes snapshot version
    ``v{batch_id}``. Restart replay is exactly-once by construction:
    a replayed batch re-reads the newest version OLDER than its own
    batch_id and idempotently overwrites its own.

    Watermark parity with :func:`rate_limited`: the stateful
    operators do NOT drop late input rows (map/flatMapGroupsWithState
    semantics — the watermark there drives only state timeouts), so
    neither does this harness; late rows contend without refilling,
    exactly as in :func:`_bucket_admit`. The watermark — floor-ms of
    the max shifted event time seen in PRIOR batches minus
    ``late_tolerance``, initially 0 — is used solely to prune expired
    buckets from the snapshot, which cannot change admissions (an
    expired-then-recreated bucket admits identically by the refill
    law). The max is recovered from the snapshot itself:
    max(last_ts_us) over live buckets IS the max event time seen,
    because every event (admitted or denied) advances its bucket's
    clock and the most-recent key can never expire first.

    Version listing/meta use local-filesystem paths (the repo's test
    rig); a cluster deployment swaps these for the Hadoop FileSystem
    API — the plan shape (one keyed shuffle + one snapshot write per
    batch) is unchanged.
    """

    def __init__(
        self,
        state_root: str,
        rate_per_sec: float = DEFAULT_RATE_PER_SEC,
        burst: int = DEFAULT_BURST,
        late_tolerance: str | int = "10 minutes",
        num_partitions: int | None = None,
    ) -> None:
        self.state_root = state_root
        self.rate = rate_per_sec
        self.burst = burst
        self.tol_ms = _parse_duration_ms(late_tolerance)
        self.num_partitions = num_partitions

    # -- snapshot bookkeeping (driver side, tiny) --
    def _versions(self) -> list[int]:
        import os

        if not os.path.isdir(self.state_root):
            return []
        out = []
        for d in os.listdir(self.state_root):
            if d.startswith("v") and d[1:].isdigit():
                out.append(int(d[1:]))
        return sorted(out)

    def _vdir(self, b: int) -> str:
        import os

        return os.path.join(self.state_root, f"v{b:012d}")

    def _meta(self, b: int) -> dict:
        import json
        import os

        with open(os.path.join(self._vdir(b), "_snapmeta.json")) as fh:
            return json.load(fh)

    def _process_batch(self, batch_df, batch_id: int, sink) -> None:
        import json
        import os
        import shutil

        spark = batch_df.sparkSession
        prior = [b for b in self._versions() if b < batch_id]
        if prior:
            base = prior[-1]
            max_evt_ms = self._meta(base)["max_evt_ms"]
        else:
            base, max_evt_ms = None, 0
        wm_ms = max(0, max_evt_ms - self.tol_ms)

        # NO late-row input filter — pinned parity with the stateful
        # operators: Spark passes late rows through to
        # (applyInPandasWith|transformWith)State (verified in
        # test_rate_limiter_snapshot_late_row_parity; the watermark
        # drives only state expiry there and snapshot pruning here,
        # neither of which can change admissions).
        events = batch_df.select(
            F.lit(1).alias("kind"),
            F.col("user_id").cast("long"),
            F.col("event_id").cast("long"),
            F.col("ts_us").cast("long"),
            F.lit(0).cast("long").alias("tokens_milli"),
            F.lit(0).cast("long").alias("last_ts_us"),
            F.lit(0).cast("long").alias("expiry_ms"),
        )
        work = events
        if base is not None:
            state = (
                spark.read.parquet(self._vdir(base))
                .filter(F.col("expiry_ms") > F.lit(wm_ms))
                .select(
                    F.lit(0).alias("kind"),
                    "user_id",
                    F.lit(-1).cast("long").alias("event_id"),
                    F.lit(_STATE_TS_SENTINEL).alias("ts_us"),
                    "tokens_milli",
                    "last_ts_us",
                    "expiry_ms",
                )
            )
            work = events.unionByName(state)

        nparts = self.num_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        out = (
            work.repartition(nparts, "user_id")
            .sortWithinPartitions("user_id", "ts_us", "event_id")
            .mapInPandas(
                _segmented_admit(self.rate, self.burst, wm_ms),
                schema=_SNAP_OUT_SCHEMA,
            )
            .persist()
        )
        try:
            new_state = out.filter(F.col("kind") == 0).select(
                "user_id", "tokens_milli", "last_ts_us", "expiry_ms"
            )
            vdir = self._vdir(batch_id)
            tmp = vdir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            new_state.write.mode("overwrite").parquet(tmp)
            # scalar watermark probe: a 1-row aggregate, not a row-set
            # read (the streaming-hygiene test bans O(batch) collects)
            row = (
                spark.read.parquet(tmp)
                .agg(F.max("last_ts_us").alias("m"))
                .first()
            )
            batch_max = row["m"] if row["m"] is not None else None
            new_max_ms = max(
                max_evt_ms,
                0 if batch_max is None
                else (batch_max + _WM_OFFSET_US) // 1000,
            )
            with open(os.path.join(tmp, "_snapmeta.json"), "w") as fh:
                json.dump(
                    {"batch_id": batch_id, "max_evt_ms": int(new_max_ms)},
                    fh,
                )
            shutil.rmtree(vdir, ignore_errors=True)
            os.rename(tmp, vdir)

            verdicts = out.filter(F.col("kind") == 1).select(
                "user_id", "event_id", "ts_us",
                "allowed", "tokens_after_milli",
            )
            sink(verdicts, batch_id)
        finally:
            out.unpersist()
        # keep the previous 2 versions for crash-replay headroom
        for b in self._versions():
            if b < batch_id - 2:
                shutil.rmtree(self._vdir(b), ignore_errors=True)

    def start_query(self, stream, sink, checkpoint: str,
                    available_now: bool = False):
        """stream (user_id, event_id, ts_us) → StreamingQuery whose
        every micro-batch calls ``sink(verdicts_df, batch_id)``."""

        def fb(batch_df, batch_id):
            self._process_batch(batch_df, int(batch_id), sink)

        w = (
            stream.writeStream.foreachBatch(fb)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()
