"""Online anomaly detection: per-key prequential z-score flagging with
Welford state (the streaming sibling of queries/behavior.x_outlier_zscore).

Each event is scored against the statistics of everything seen BEFORE it
(test-then-train — the score never peeks at its own value), then folded
into the running (n, mean, M2) via Welford's update. State is three
numbers per key — size tracks |event types|, never event volume — so this
is the bounded-state escape hatch shape applyInPandasWithState exists for
(same pattern as stateful.running_user_stats; SURVEY §2.6).

Ordering: rows are scored in (ts, event_id) order *within* each
micro-batch (sorted in the update function); across batches, arrival
order is the stream's replay order. Flag decisions therefore depend on
arrival order — inherent to any online detector — but are DETERMINISTIC
for a fixed chunking (test-asserted: same stream twice → identical
output), and a single-batch run reproduces an offline sequential replay
exactly.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

Z_THRESHOLD = 3.0
MIN_N = 30  # don't flag until the baseline has this many observations

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
        T.StructField("n_flagged", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
        T.StructField("n_flagged", T.LongType()),
    ]
)


def score_and_update(
    n: int, mean: float, m2: float, n_flagged: int, values, threshold: float, min_n: int
) -> tuple[int, float, float, int]:
    """Sequential prequential scoring + Welford fold over ``values``.

    Pure function shared by the streaming operator and the offline replay
    tests — the single source of truth for the update arithmetic.
    """
    for x in values:
        x = float(x)
        if n >= min_n and m2 > 0.0:
            sd = (m2 / (n - 1)) ** 0.5
            if abs(x - mean) / sd > threshold:
                n_flagged += 1
        n += 1
        delta = x - mean
        mean += delta / n
        m2 += delta * (x - mean)
    return n, mean, m2, n_flagged


def _update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (event_type,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, mean, m2, n_flagged = state.get if state.exists else (0, 0.0, 0.0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n, mean, m2, n_flagged = score_and_update(
            n, mean, m2, n_flagged, pdf["value"].to_numpy(), Z_THRESHOLD, MIN_N
        )
    state.update((n, mean, m2, n_flagged))
    state.setTimeoutDuration(60 * 60 * 1000)
    yield pd.DataFrame(
        [(event_type, n, mean, m2, n_flagged)],
        columns=["event_type", "n_seen", "mean", "m2", "n_flagged"],
    )


def running_anomaly_stats(events: DataFrame) -> DataFrame:
    """events(event_type, ts, event_id, value) stream → continuously
    updated per-type baseline + prequential anomaly count."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
