"""Holt linear trend (double exponential smoothing) per key.

The recurrence
    l_t = alpha * v_t + (1 - alpha) * (l_{t-1} + b_{t-1})
    b_t = beta  * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}
is sequential in t — the one shape the relational surface genuinely cannot
express (each step consumes the previous step's OUTPUT, unlike EWMA's
fixed-weight form which unrolls to lag columns, x_ewma_trailing).

Execution shape — and why it is mapInPandas, not applyInPandas:
``groupBy().applyInPandas`` invokes Python once PER GROUP; with many small
keys the per-call pandas construction dominates (measured 7.0 s at sf0.1 /
~2k users vs 1.x s for this form — at 10^8 keys it would be the whole job).
Instead the input is hash-repartitioned on the key and sorted within
partitions by (key, ts, order), then ONE ``mapInPandas`` pass folds each
Arrow batch, detecting group boundaries vectorized and carrying the open
group's two-float state across batch and iterator steps; a group's rows are
contiguous within exactly one partition, so each key is emitted exactly
once. Shuffle: the event set once; output: one row per key.

At 100 TB the constraint is the largest single key's history must sort
within its partition (Spark spills sorts; the Python side holds only one
batch plus six scalars). The streaming form
(streaming/stateful.py:running_user_trend) checkpoints the same state per
key and folds increments — the recurrence is linear, so chunked folding is
bit-identical to monolithic (pinned in tests/test_forecast.py).

Determinism: the fold consumes (ts, order)-sorted rows after an explicit
sort — partition layout cannot reorder it. alpha/beta default to dyadic 0.5
so every step is exact IEEE arithmetic, making the numpy replay bit-exact.

No SQL oracle (DuckDB has no per-row recursive fold over groups that maps
cleanly) — declared rows-only; tests replay the recurrence in plain
numpy/pandas and pin determinism and the single-point degenerate case.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["holt_linear"]

_OUT_SCHEMA = (
    "{key} {ktype}, n_points bigint, level double, trend double, "
    "forecast_1 double"
)


def holt_linear(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Per-``key`` Holt linear smoothing over ``value_col`` in
    (``ts_col``, ``order_col``) order; returns one row per key with the
    final level/trend and the one-step-ahead forecast."""
    ktype = dict(df.dtypes)[key]
    schema = _OUT_SCHEMA.format(key=key, ktype=ktype)
    spark = df.sparkSession
    n_part = spark.sparkContext.defaultParallelism

    def fold_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key = None
        n, level, trend = 0, 0.0, 0.0
        out: list[tuple] = []

        def close_group():
            if cur_key is not None:
                out.append((cur_key, n, level, trend, level + trend))

        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf[key].to_numpy()
            vals = pdf[value_col].to_numpy(dtype="float64")
            # vectorized group boundaries over the sorted batch
            starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
            ends = np.append(starts[1:], len(keys))
            for s, e in zip(starts, ends):
                k = keys[s]
                if k != cur_key:
                    close_group()
                    cur_key, n, level, trend = k, 0, 0.0, 0.0
                seg = vals[s:e]
                i = 0
                if n == 0:
                    level, trend = float(seg[0]), 0.0
                    n, i = 1, 1
                for x in seg[i:].tolist():
                    prev = level
                    level = alpha * x + (1.0 - alpha) * (level + trend)
                    trend = beta * (level - prev) + (1.0 - beta) * trend
                n += e - s - i
            if len(out) >= 1024:
                yield pd.DataFrame(
                    out, columns=[key, "n_points", "level", "trend", "forecast_1"]
                )
                out = []
        close_group()
        if out:
            yield pd.DataFrame(
                out, columns=[key, "n_points", "level", "trend", "forecast_1"]
            )

    src = (
        df.select(key, ts_col, value_col, order_col)
        .repartition(n_part, key)
        .sortWithinPartitions(key, ts_col, order_col)
        .select(key, value_col)  # fold needs only these two past the sort
    )
    return src.mapInPandas(fold_partition, schema=schema)
