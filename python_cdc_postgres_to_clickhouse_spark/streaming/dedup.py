"""Streaming deduplication (T6): at-least-once delivery → exactly-once rows.

The reference's consumer-group semantics re-deliver messages after rebalance
or crash (main.py:12-16); the engine drops re-deliveries on the event
identity (key + lsn) within a watermark-bounded state window, so dedup state
does not grow without bound at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_changes(
    changes: DataFrame,
    identity: Sequence[str] = ("id", "source_lsn"),
    ts_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate deliveries of the same change event.

    Streaming: state-bounded via ``dropDuplicatesWithinWatermark`` (requires
    a watermarked event-time column). Batch: plain dropDuplicates — same
    observable result, no state concern.
    """
    cols = list(identity)
    if changes.isStreaming:
        return changes.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
    return changes.dropDuplicates(cols)
