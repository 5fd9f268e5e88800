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
