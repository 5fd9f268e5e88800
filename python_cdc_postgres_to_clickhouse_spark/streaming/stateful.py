"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.6): per-key running statistics with TTL'd state.

Windows/dedup cover the declarative stateful surface; this is the escape
hatch for state machines Spark has no built-in for — here, a per-user
running counter + sum + last-seen that emits an updated row per key per
micro-batch and drops state for keys idle past a timeout (the bounded-state
requirement at 100 TB: state size tracks *active* keys, not history).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)


def _update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, s, last = state.get if state.exists else (0, 0.0, 0)  # .get is a property
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000))
    state.update((n, s, last))
    state.setTimeoutDuration(60 * 60 * 1000)  # reclaim idle keys after 1h
    yield pd.DataFrame(
        [(user_id, n, s, last)],
        columns=["user_id", "n_events", "sum_value", "last_ts_ms"],
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value, ...) → continuously-updated per-user
    stats. Streaming only (processing-time timeout reclaims idle state)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Holt linear trend: exactly-resumable because the recurrence is
# a LINEAR fold — state_t = A·state_{t-1} + B·v_t — so folding a key's
# series in chunks with carried (level, trend) is bit-identical to the
# monolithic fold (operators/forecast.py is the batch form; the chunked≡
# monolithic property is pinned in tests/test_forecast.py).
#
# Ordering contract: events must arrive per-key in (ts, event_id) order
# ACROSS batches; rows at or behind the per-key high-water mark are dropped
# and counted in n_late (replayed batches therefore fold to a no-op — the
# idempotency story — and genuinely-late data is surfaced, not silently
# misfolded). Within a batch, rows are sorted before folding.
# ---------------------------------------------------------------------------

TREND_ALPHA = 0.5
TREND_BETA = 0.5

TREND_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("forecast_1", T.DoubleType()),
        T.StructField("n_late", T.LongType()),
    ]
)

TREND_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_points", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("last_ts_ns", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("n_late", T.LongType()),
    ]
)

_TREND_EMPTY = (0, 0.0, 0.0, -1, -1, 0)


def fold_trend_chunk(state: tuple, pdf: pd.DataFrame) -> tuple:
    """Pure chunk fold: carry (n_points, level, trend, last_ts_ns,
    last_event_id, n_late) over one batch of a single key's rows."""
    n, level, trend, last_ns, last_id, n_late = state
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    ts_ns = pdf["ts"].astype("int64").to_numpy()
    eid = pdf["event_id"].astype("int64").to_numpy()
    vals = pdf["value"].astype("float64").to_numpy()
    for t_ns, e, v in zip(ts_ns, eid, vals):
        if (t_ns, e) <= (last_ns, last_id):
            n_late += 1
            continue
        if n == 0:
            level, trend = float(v), 0.0
        else:
            prev = level
            level = TREND_ALPHA * float(v) + (1.0 - TREND_ALPHA) * (level + trend)
            trend = TREND_BETA * (level - prev) + (1.0 - TREND_BETA) * trend
        n += 1
        last_ns, last_id = int(t_ns), int(e)
    return n, level, trend, last_ns, last_id, n_late


def _trend_update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    st = tuple(state.get) if state.exists else _TREND_EMPTY
    for pdf in pdfs:
        st = fold_trend_chunk(st, pdf)
    state.update(st)
    n, level, trend, _ns, _id, n_late = st
    yield pd.DataFrame(
        [(user_id, n, level, trend, level + trend, n_late)],
        columns=[
            "user_id", "n_points", "level", "trend", "forecast_1", "n_late"
        ],
    )


def running_user_trend(events: DataFrame) -> DataFrame:
    """events(user_id, ts, event_id, value) → continuously-updated per-user
    Holt level/trend/forecast. State is six scalars per key — bounded by
    the ACTIVE key population, never by history length. No timeout: a
    trend model must survive idle periods (contrast running_user_stats,
    where idle reclamation is the point)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _trend_update,
        outputStructType=TREND_OUTPUT_SCHEMA,
        stateStructType=TREND_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
