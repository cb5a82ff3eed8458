"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only stateful stream logic is tree status propagation
(T6, handled driver-side); this module adds the kind of per-key
streaming state a metrics engine grows next: online EWMA + variance
per metric with anomaly flagging. It demonstrates the pattern SURVEY
§2.9 prescribes for distributed custom state — Arrow-batched groups,
explicit state schema, no watermark (late points update state in
arrival order, consistent with the engine's no-drop policy).

State per metric: (ewma, ewm_var, n). For each point:
    d = value - ewma ; ewma += alpha * d ; var = (1-alpha)*(var + alpha*d^2)
A point is anomalous when |d| > z * sqrt(var) once warmed up (n >= min_n).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("ewm_var", DoubleType()),
        StructField("n", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("timestamp", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)


def make_ewma_fn(alpha: float = 0.3, z_threshold: float = 3.0, min_n: int = 5):
    """Build the (key, batches, state) -> batches function (picklable)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (name,) = key
        if state.exists:
            ewma, var, n = state.get
        else:
            ewma, var, n = 0.0, 0.0, 0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("timestamp")
            for ts, value in zip(pdf["timestamp"], pdf["value"]):
                if n == 0:
                    ewma, var, d = float(value), 0.0, 0.0
                    is_anom = False
                else:
                    d = float(value) - ewma
                    # judge against the state BEFORE absorbing this point —
                    # otherwise a large spike inflates the variance it is
                    # tested against and masks itself
                    is_anom = bool(n > min_n and var > 0 and abs(d) > z_threshold * (var ** 0.5))
                    ewma += alpha * d
                    var = (1 - alpha) * (var + alpha * d * d)
                n += 1
                out_rows.append((name, int(ts), float(value), ewma, is_anom))
        state.update((ewma, var, n))
        yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return update


def ewma_anomalies(parsed: DataFrame, alpha: float = 0.3, z_threshold: float = 3.0,
                   min_n: int = 5) -> DataFrame:
    """Streaming DataFrame (name, timestamp, value, ...) -> scored stream.

    State is partitioned by metric name — the same key the storage
    layer clusters on, so a 100 TB stream shards its state evenly
    across executors along with the data.
    """
    return (
        parsed.groupBy("name")
        .applyInPandasWithState(
            make_ewma_fn(alpha, z_threshold, min_n),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Event-time sessionization with gap timeout
# ---------------------------------------------------------------------------

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ts", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("closed_by", StringType()),
    ]
)


def make_session_fn(gap_seconds: int):
    """(key, batches, state) -> closed sessions. A session closes when a
    later event arrives more than ``gap_seconds`` after the previous one
    (closed_by='gap') or when the watermark passes last_ts + gap
    (closed_by='timeout' — the open session is flushed)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        cols = [f.name for f in SESSION_OUTPUT_SCHEMA.fields]
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame([(k, start, last, n, sv, "timeout")], columns=cols)
            return
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = None
            n, sv = 0, 0.0
        out = []
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if start is not None:
                state.update((start, last, n, sv))
                state.setTimeoutTimestamp((last + gap_seconds) * 1000)
            yield pd.DataFrame([], columns=cols)
            return
        events = pd.concat(chunks, ignore_index=True).sort_values("ts_sec")
        for ts, value in zip(events["ts_sec"], events["value"]):
            ts = int(ts)
            if start is None:
                start, last, n, sv = ts, ts, 1, float(value)
            elif ts - last > gap_seconds:
                out.append((k, start, last, n, sv, "gap"))
                start, last, n, sv = ts, ts, 1, float(value)
            else:
                last = max(last, ts)
                n += 1
                sv += float(value)
        state.update((start, last, n, sv))
        # wake up when the watermark passes the gap horizon to flush
        state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        yield pd.DataFrame(out, columns=cols)

    return update


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               key_col: str = "key") -> DataFrame:
    """Custom session windows over a stream — the applyInPandasWithState
    equivalent of ``session_window`` with full control over the emitted
    aggregate (and a template for richer per-session state).

    ``events`` needs (key, ts_sec: long, value: double, event_time:
    timestamp with a watermark). State shards by ``key`` — same story
    as ewma_anomalies: the state store scales horizontally with the
    key space, no global state.
    """
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            make_session_fn(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (Space-Saving sketch per key)
# ---------------------------------------------------------------------------

HH_STATE_SCHEMA = StructType(
    [
        StructField("items", StringType()),   # \x1f-joined item labels
        StructField("counts", StringType()),  # comma-joined estimated counts
        StructField("errs", StringType()),    # comma-joined max overestimates
    ]
)

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("item", StringType()),
        StructField("est_count", LongType()),
        StructField("max_err", LongType()),
        StructField("batch_rank", LongType()),
    ]
)


def make_heavy_hitters_fn(capacity: int, top_k: int):
    """Space-Saving (Metwally et al.): bounded ``capacity`` counters per
    key; a new item evicts the minimum counter and inherits its count
    as overestimate error. est_count - max_err is a guaranteed lower
    bound on the true frequency."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            items_s, counts_s, errs_s = state.get
            items = items_s.split("\x1f") if items_s else []
            counters = dict(zip(items, zip(map(int, counts_s.split(",")) if counts_s else [],
                                           map(int, errs_s.split(",")) if errs_s else [])))
        else:
            counters = {}
        for pdf in pdfs:
            for item in pdf["item"]:
                item = str(item)
                if item in counters:
                    c, e = counters[item]
                    counters[item] = (c + 1, e)
                elif len(counters) < capacity:
                    counters[item] = (1, 0)
                else:
                    victim = min(counters, key=lambda i: counters[i][0])
                    vc, _ = counters.pop(victim)
                    counters[item] = (vc + 1, vc)
        items = sorted(counters, key=lambda i: (-counters[i][0], i))
        state.update((
            "\x1f".join(items),
            ",".join(str(counters[i][0]) for i in items),
            ",".join(str(counters[i][1]) for i in items),
        ))
        top = items[:top_k]
        yield pd.DataFrame(
            [(k, i, counters[i][0], counters[i][1], r + 1) for r, i in enumerate(top)],
            columns=[f.name for f in HH_OUTPUT_SCHEMA.fields],
        )

    return update


def heavy_hitters(events: DataFrame, capacity: int = 100, top_k: int = 10,
                  key_col: str = "key") -> DataFrame:
    """Streaming approximate top-k items per key under bounded memory.

    Emits the current top-k estimate after every micro-batch (update
    mode downstream dedups on (key, item) if a changelog is unwanted).
    At 100 TB the point is the *bound*: capacity counters per key
    regardless of item cardinality, and sketches of disjoint streams
    merge by summing — the state never outgrows the store.
    """
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            make_heavy_hitters_fn(capacity, top_k),
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming exact dedup with TTL'd state
# ---------------------------------------------------------------------------

DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_ts", LongType()),
        StructField("n_suppressed", LongType()),
    ]
)

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("content_key", StringType()),
        StructField("first_ts", LongType()),
        StructField("n_suppressed", LongType()),
        StructField("expired", BooleanType()),
    ]
)


def make_dedup_fn(ttl_seconds: int):
    """(key, batches, state) -> dedup manifest rows.

    First sight of a key emits (key, first_ts, 0, expired=false) — the
    signal to keep that record. Repeats within the TTL are suppressed
    (state counts them). When the watermark passes first_ts + ttl the
    state expires and a closing manifest row reports the suppression
    total; a later arrival of the same content starts a fresh cycle.
    """

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        cols = [f.name for f in DEDUP_OUTPUT_SCHEMA.fields]
        if state.hasTimedOut:
            first_ts, n_sup = state.get
            state.remove()
            yield pd.DataFrame([(k, first_ts, n_sup, True)], columns=cols)
            return
        chunks = [p for p in pdfs if len(p)]  # pdfs is single-pass
        n_new = sum(len(p) for p in chunks)
        if n_new == 0:
            yield pd.DataFrame([], columns=cols)
            return
        min_ts = int(min(int(p["ts_sec"].min()) for p in chunks))
        out = []
        if state.exists:
            first_ts, n_sup = state.get
            n_sup += n_new
        else:
            first_ts, n_sup = min_ts, n_new - 1
            out.append((k, first_ts, 0, False))
        state.update((first_ts, n_sup))
        state.setTimeoutTimestamp((first_ts + ttl_seconds) * 1000)
        yield pd.DataFrame(out, columns=cols)

    return update


def streaming_dedup(records: DataFrame, ttl_seconds: int = 3600,
                    key_col: str = "content_key") -> DataFrame:
    """Streaming exact dedup manifest under TTL'd per-content state.

    ``records`` needs (content_key, ts_sec: long, event_time: timestamp
    with a watermark). Spark's built-in
    ``dropDuplicatesWithinWatermark`` covers plain suppression; this
    custom operator additionally REPORTS — each content key emits a
    keep row on first sight and a closing row with the suppression
    count when its state expires, which is the audit trail a corpus
    ingest wants. State is one (long, long) pair per live key, sharded
    by the same hash the dedup groups on; expiry bounds the store at
    (arrival rate x TTL) regardless of stream age.
    """
    return (
        records.groupBy(key_col)
        .applyInPandasWithState(
            make_dedup_fn(ttl_seconds),
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming window funnel (CH windowFunnel over an unbounded stream)
# ---------------------------------------------------------------------------

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("level", LongType()),
        StructField("anchor", LongType()),
        StructField("last", LongType()),
    ]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("level", LongType()),
        StructField("advanced_at", LongType()),
    ]
)


def make_funnel_fn(steps: list, window_sec: int):
    """(key, batches, state) -> level-advance events. Same greedy
    semantics as ``functions.behavior.window_funnel`` (earliest step-1
    anchors; each next step strictly later, within window of the
    anchor), with per-user state carried across micro-batches. Events
    are processed in event-time order WITHIN a batch; a cross-batch
    straggler older than the carried state cannot rewind it (arrival-
    order greediness — the streaming trade the batch twin doesn't
    make; re-run the batch operator for the exact answer)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        level, anchor, last = state.get if state.exists else (0, 0, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_sec")
            for ts, et in zip(pdf["ts_sec"], pdf["event_type"]):
                ts = int(ts)
                if level == 0:
                    if et == steps[0]:
                        level, anchor, last = 1, ts, ts
                        out.append((user, 1, ts))
                elif level < len(steps) and et == steps[level] \
                        and ts > last and ts <= anchor + window_sec:
                    level += 1
                    last = ts
                    out.append((user, level, ts))
        state.update((level, anchor, last))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in FUNNEL_OUTPUT_SCHEMA.fields])

    return update


def streaming_funnel(events: DataFrame, steps: list, window_sec: int) -> DataFrame:
    """Streaming (user_id, ts_sec, event_type) -> append stream of
    funnel level advances. State shards on user_id — the same key the
    batch funnel shuffles on, so a 1000-executor stream spreads its
    state with the data."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_fn(list(steps), window_sec),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
