"""Holt linear trend (double exponential smoothing) per key.

The recurrence
    l_t = alpha * v_t + (1 - alpha) * (l_{t-1} + b_{t-1})
    b_t = beta  * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}
is sequential in t — the one shape the relational surface genuinely cannot
express (each step consumes the previous step's OUTPUT, unlike EWMA's
fixed-weight form which unrolls to lag columns, x_ewma_trailing). This is
the documented Arrow escape hatch done right:

- ONE ``groupBy(keys).applyInPandas`` pass: Spark ships each key's rows as
  a single Arrow batch; the fold is vectorized numpy inside the worker.
- State per key is two floats — output is one row per key, so the shuffle
  carries the event set once and returns |keys| rows.
- At 100 TB the constraint is the largest single key's history must fit a
  worker (same contract as any grouped-map op); the mitigations are the
  standard ones — time-bound the window upstream, or checkpoint carried
  (level, trend) state per key and fold increments (the streaming form).

Determinism: the fold runs in (ts, event_id) order after an explicit sort
inside the group — layout/partitioning cannot reorder it. alpha/beta
default to dyadic 0.5 so every step is exact IEEE arithmetic, making the
numpy replay test bit-exact.

No SQL oracle (DuckDB has no recursive per-row fold over groups that maps
cleanly) — declared rows-only; tests replay the recurrence in plain
numpy/pandas and pin determinism and the single-point degenerate case.
"""

from __future__ import annotations

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

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, order_col], kind="mergesort")
        v = pdf[value_col].to_numpy(dtype="float64")
        level = float(v[0])
        trend = 0.0
        for x in v[1:]:
            prev = level
            level = alpha * float(x) + (1.0 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1.0 - beta) * trend
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n_points": [len(v)],
                "level": [level],
                "trend": [trend],
                "forecast_1": [level + trend],
            }
        )

    cols = [key, ts_col, value_col, order_col]
    return df.select(*cols).groupBy(key).applyInPandas(fold, schema=schema)
