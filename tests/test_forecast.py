"""Holt linear trend: numpy replay parity, determinism, degenerate input."""

from __future__ import annotations

import numpy as np
import pandas as pd

from python_cdc_postgres_to_clickhouse_spark.operators.forecast import holt_linear
from python_cdc_postgres_to_clickhouse_spark.registry import all_queries
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_SMOKE


def _replay(values, alpha=0.5, beta=0.5):
    level, trend = float(values[0]), 0.0
    for x in values[1:]:
        prev = level
        level = alpha * float(x) + (1.0 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1.0 - beta) * trend
    return level, trend


def test_holt_matches_pandas_replay_bit_exact(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    got = (
        holt_linear(ev, "user_id", "ts", "value", "event_id")
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    pdf = ev.select("user_id", "ts", "value", "event_id").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    for uid, g in pdf.groupby("user_id"):
        level, trend = _replay(g["value"].to_numpy())
        row = got.loc[uid]
        assert row["n_points"] == len(g)
        assert row["level"] == level, uid          # dyadic alpha -> bit-exact
        assert row["trend"] == trend, uid
        assert row["forecast_1"] == level + trend, uid


def test_holt_deterministic_across_layouts(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    a = holt_linear(ev, "user_id", "ts", "value", "event_id").toPandas()
    b = (
        holt_linear(ev.repartition(13), "user_id", "ts", "value", "event_id")
        .toPandas()
    )
    a = a.sort_values("user_id").reset_index(drop=True)
    b = b.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_holt_single_point_group(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2026, 1, 1), 5.0, 10)],
        "user_id bigint, ts timestamp, value double, event_id bigint",
    )
    row = holt_linear(df, "user_id", "ts", "value", "event_id").collect()[0]
    assert row.n_points == 1 and row.level == 5.0 and row.trend == 0.0
    assert row.forecast_1 == 5.0


def test_declared_query_runs(spark):
    df = all_queries()["x_holt_trend"].fn(spark, SF_SMOKE)
    assert df.count() > 0
    assert not np.isnan(df.toPandas()["forecast_1"]).any()
