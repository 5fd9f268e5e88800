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


# ---------------------------------------------------------------------------
# Streaming form: chunked fold ≡ monolithic fold (linear recurrence), late
# rows drop to a no-op, and the applyInPandasWithState leg end-to-end.
# ---------------------------------------------------------------------------

from python_cdc_postgres_to_clickhouse_spark.streaming.stateful import (  # noqa: E402
    _TREND_EMPTY,
    fold_trend_chunk,
    running_user_trend,
)


def _one_user_pdf(spark, uid=3):
    ev = load_tables(spark, SF_SMOKE)["events"]
    pdf = (
        ev.filter(ev.user_id == uid)
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(pdf) >= 6
    return pdf


def test_chunked_fold_bit_equals_monolithic(spark):
    pdf = _one_user_pdf(spark)
    mono = fold_trend_chunk(_TREND_EMPTY, pdf)
    for cuts in [(2,), (1, 4), (3, 3), (len(pdf) - 1,)]:
        st = _TREND_EMPTY
        prev = 0
        for c in (*cuts, len(pdf)):
            st = fold_trend_chunk(st, pdf.iloc[prev:c])
            prev = c
        assert st == mono, cuts  # tuple equality -> bit-exact doubles


def test_replayed_and_late_rows_are_noops_but_counted(spark):
    pdf = _one_user_pdf(spark)
    st = fold_trend_chunk(_TREND_EMPTY, pdf)
    replay = fold_trend_chunk(st, pdf.iloc[1:3])  # duplicate redelivery
    assert replay[:5] == st[:5]
    assert replay[5] == st[5] + 2  # surfaced, not silently misfolded


def test_stream_final_state_matches_batch_holt(spark, tmp_path):
    ev = (
        load_tables(spark, SF_SMOKE)["events"]
        .filter("user_id < 20")
        .select("user_id", "ts", "event_id", "value")
    )
    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        running_user_trend(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("trend_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_points"], r["level"], r["trend"])
        for r in spark.sql(
            """SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY n_points DESC) rn
               FROM trend_stream) WHERE rn = 1"""
        ).collect()
    }
    exp = {
        r["user_id"]: (r["n_points"], r["level"], r["trend"])
        for r in holt_linear(ev, "user_id", "ts", "value", "event_id").collect()
    }
    assert got == exp
