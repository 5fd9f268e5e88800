"""Incremental rollup maintenance: the AggregatingMergeTree analog.

ClickHouse deployments pre-aggregate CDC streams into rollup tables
(per-hour revenue, per-day counts) maintained incrementally; the reference
provisions ClickHouse for exactly this kind of serving (SURVEY §2.4). Here
the same contract is a foreachBatch sink that keeps a partial-aggregate
table additively mergeable:

    state[bucket] ⊕ batch_partial[bucket]

Only ADDITIVE partials (sum/count — decimal-exact) are stored, so merging a
micro-batch touches only the buckets present in that batch (dynamic
partition overwrite on the bucket's coarse key). Derived values (averages)
are computed at read time from the partials — storing them would break
mergeability.

At 100 TB: the rollup table is tiny relative to the stream (one row per
(bucket, dims)), each micro-batch merge reads/writes only the touched
date partitions, and queries hit the rollup instead of the raw stream —
the serving-layer pattern the reference delegates to ClickHouse.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


class HourlyRollupSink:
    """Maintains per-(hour, event_type) additive partials of events."""

    def __init__(self, spark: SparkSession, rollup_dir: str):
        self.spark = spark
        self.rollup_dir = rollup_dir

    @staticmethod
    def _partials(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("bucket", F.date_trunc("hour", F.col("ts")))
            .withColumn("day", F.to_date("bucket"))
            .groupBy("day", "bucket", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                # Pin the stored partial to a FIXED decimal type: Spark's sum
                # widens precision per aggregation level (18,6)→(28,6)→(38,6),
                # and parquet files with drifting decimal widths cannot be
                # read back together.
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("decimal(38,6)")
                .alias("sum_value"),
            )
        )

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.rollup_dir, "_applied", f"batch-{batch_id}")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Additive merges are NOT idempotent (unlike the latest-by-key
        # upsert), so a replayed batch after a crash would double-count.
        # A per-batch marker written after the merge makes the common
        # replay path (merge committed, stream checkpoint not) a no-op.
        # The residual window — crash between the state write and the
        # marker write — remains at-least-once; closing it fully needs a
        # transactional table format (Delta/Iceberg txn with batchId).
        if os.path.exists(self._marker(batch_id)):
            return
        incoming = self._partials(batch_df)
        days = [r["day"] for r in incoming.select("day").distinct().collect()]
        if not days:
            return
        merged = incoming
        if os.path.isdir(self.rollup_dir) and any(
            name.startswith("day=") for name in os.listdir(self.rollup_dir)
        ):
            existing = self.spark.read.parquet(self.rollup_dir).filter(
                F.col("day").isin(days)
            )
            merged = (
                existing.unionByName(incoming)
                .groupBy("day", "bucket", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
                )
            )
        # Per-write dynamic overwrite (NOT the session conf — mutating the
        # session would silently change overwrite semantics for unrelated
        # writes elsewhere in the application).
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(self.rollup_dir)
        )
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    def attach(self, events: DataFrame, checkpoint_dir: str, **trigger_kwargs) -> StreamingQuery:
        if not trigger_kwargs:
            trigger_kwargs = {"availableNow": True}
        return (
            events.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
            .trigger(**trigger_kwargs)
            .start()
        )

    def serve(self) -> DataFrame:
        """Read-time view: derived metrics from the additive partials."""
        r = self.spark.read.parquet(self.rollup_dir)
        return r.select(
            "bucket",
            "event_type",
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
            (F.col("sum_value").cast("double") / F.col("n_events").cast("double")).alias(
                "avg_value"
            ),
        )
