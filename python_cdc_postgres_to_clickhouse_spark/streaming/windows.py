"""Event-time windowing (T2-T5): tumbling / sliding / session windows with
watermarks. The same builders serve batch DataFrames (driver oracle checks)
and streaming DataFrames (watermark + append mode) — Spark's
``window``/``session_window`` are mode-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound (T2/T5): events later than `delay` behind the max
    observed event time are dropped and window state is reclaimed — the
    engine's analog of the reference's 7-day Kafka retention bound
    (debezium.json:24), but per-operator and in event time."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df  # watermarks are a streaming-only concept; batch sees all data


def _agg(df: DataFrame, window_col: Column, group_cols: list[str]) -> DataFrame:
    return (
        df.groupBy(window_col.alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def tumbling(df: DataFrame, width: str = "10 minutes",
             ts_col: str = "ts", group_cols: list[str] | None = None) -> DataFrame:
    """Tumbling window aggregation (T3)."""
    return _agg(df, F.window(ts_col, width), group_cols or ["event_type"])


def sliding(df: DataFrame, width: str = "10 minutes", slide: str = "5 minutes",
            ts_col: str = "ts", group_cols: list[str] | None = None) -> DataFrame:
    """Sliding window aggregation (T3): each event lands in width/slide
    overlapping windows."""
    return _agg(df, F.window(ts_col, width, slide), group_cols or ["event_type"])


def session(df: DataFrame, gap: str = "30 minutes",
            ts_col: str = "ts", group_cols: list[str] | None = None) -> DataFrame:
    """Session windows (T4): dynamic-length windows closed by a `gap` of
    inactivity per key."""
    return _agg(df, F.session_window(ts_col, gap), group_cols or ["user_id"])
