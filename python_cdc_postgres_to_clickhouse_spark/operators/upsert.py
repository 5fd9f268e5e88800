"""Latest-by-key upsert materialization (D3) — the CDC semantic core.

The reference delegates this to ClickHouse (ReplacingMergeTree + FINAL would
collapse versions at read time); the engine owns it natively. Key = the
Kafka message key / primary key (reference debezium.json:14), order =
``source_lsn`` (WAL total order) with offset tiebreakers for at-least-once
duplicate deliveries (reference main.py:12-16 consumer-group semantics).

Scale design (100 TB): one hash shuffle on the key, then a per-key top-1 —
Spark plans row_number + filter(rn=1) as a WindowGroupLimit (top-1 push-down
into the shuffle) so no full sort of each partition materializes. Skewed
keys are split by AQE. For continuous ingest the same function runs inside
``foreachBatch`` merging each micro-batch into the partitioned Parquet state
(streaming/upsert_sink.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..sources.cdc import OP_DELETE


def latest_by_key(
    changes: DataFrame,
    keys: Sequence[str] = ("id",),
    order_by: Sequence[str] = ("source_lsn", "kafka_offset"),
    op_col: str = "op",
    drop_deletes: bool = True,
) -> DataFrame:
    """Current-state view of a change log: newest version per key wins.

    Duplicate deliveries (same lsn) are benign: the unique
    ``kafka_offset`` tiebreaker makes row_number deterministic and all
    copies of the winning event carry identical payloads. A key whose
    newest event is a delete is removed entirely when ``drop_deletes``.
    """
    order: list[Column] = [F.desc(c) for c in order_by]
    w = W.partitionBy(*keys).orderBy(*order)
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if drop_deletes and op_col in changes.columns:
        latest = latest.filter(F.col(op_col) != OP_DELETE)
    return latest


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str] = ("id",),
    order_by: Sequence[str] = ("source_lsn", "kafka_offset"),
    op_col: str = "op",
) -> DataFrame:
    """Merge a change log into a base snapshot (D1 ⊎ D3).

    The snapshot rows are treated as version 0 (order −∞): any change for
    the same key supersedes them; deletes remove keys; unchanged snapshot
    rows survive. Equivalent to MERGE INTO without requiring a transactional
    table format — the anti-join + union + window composition from the
    public Spark CDC playbook.
    """
    key_cols = list(keys)
    # Snapshot rows get order columns of -1 so any real change wins.
    snap = snapshot
    for c in order_by:
        if c not in snap.columns:
            snap = snap.withColumn(c, F.lit(-1).cast("long"))
    if op_col not in snap.columns:
        snap = snap.withColumn(op_col, F.lit("r"))
    common = [c for c in changes.columns if c in snap.columns]
    merged = snap.select(common).unionByName(changes.select(common))
    return latest_by_key(
        merged, keys=key_cols, order_by=order_by, op_col=op_col, drop_deletes=True
    )


def replay_oracle(events: list[dict]) -> dict:
    """Python reference implementation: replay in (source_lsn) order, last
    non-delete per id wins. Used only by tests as the ground truth."""
    final: dict = {}
    for e in sorted(events, key=lambda e: (e["source_lsn"], e["kafka_offset"])):
        key = (e["after"] or e["before"])["id"]
        if e["op"] == OP_DELETE:
            final.pop(key, None)
        else:
            final[key] = e["after"]
    return final
