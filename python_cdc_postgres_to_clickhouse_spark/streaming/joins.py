"""Streaming joins (§2.5 extension): stream-static enrichment and
time-bounded stream-stream joins.

Stream-static is free (the static side is just a batch plan re-evaluated
per micro-batch). Stream-stream requires watermarks on both sides plus a
time-bound in the join condition so Spark can expire buffered state — an
unbounded stream-stream join would hold both streams forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: dimension lookup on every micro-batch.

    Note: for a plain parquet dim the file listing is resolved when the
    DataFrame is created — overwriting the directory mid-stream breaks or
    serves a stale snapshot. To pick up dimension updates without a stream
    restart, re-resolve the dim inside ``foreachBatch`` (or use a
    table format with snapshot isolation like Delta/Iceberg).
    """
    return stream.join(F.broadcast(dim), on, "left")


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Time-bounded stream-stream inner join: match right events within
    [left_ts, left_ts + max_delay] per key. Both sides are watermarked so
    buffered rows older than the bound are dropped — state is
    delay-bounded, not history-bounded (the 100 TB requirement).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond)


def correlate_streams_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Left-outer time-bounded stream-stream join: unmatched left rows are
    emitted with nulls once the watermark passes their join window — i.e.
    "signups that did NOT purchase within the window" as a stream. The
    null-side emission is watermark-driven: with availableNow processing,
    rows inside the final watermark stay buffered (Spark cannot yet rule
    out a future match), so tests append a far-future sentinel event to
    flush the watermark past all real data.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "left_outer")
