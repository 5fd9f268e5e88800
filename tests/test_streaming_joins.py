"""Streaming joins: stream-static enrichment and time-bounded
stream-stream correlation vs the equivalent batch join."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.streaming.joins import correlate_streams, enrich_with_static
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


def test_stream_static_enrichment(spark, tmp_path):
    t = load_tables(spark, SF_ORACLE)
    events = t["events"].select("event_id", "user_id", "ts", "event_type")
    src = str(tmp_path / "ev")
    events.coalesce(2).write.parquet(src)
    # Static dim: user_id → segment (derived from customer for realism).
    dim = t["customer"].select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        enrich_with_static(stream, dim, "user_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM enriched")
    batch = enrich_with_static(events, dim, "user_id")
    assert streamed.count() == events.count()
    s = {(r["event_id"], r["segment"]) for r in streamed.collect()}
    b = {(r["event_id"], r["segment"]) for r in batch.collect()}
    assert s == b


def test_stream_stream_outer_emits_unmatched(spark, tmp_path):
    """Left-outer: signups without a purchase in-window surface with null
    right side once the watermark passes (flushed by a sentinel event)."""
    from pyspark.sql import types as T

    from python_cdc_postgres_to_clickhouse_spark.streaming.joins import correlate_streams_outer

    import datetime as dt

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    s_schema = "signup_id long, user_id long, ts timestamp"
    p_schema = "purchase_id long, user_id long, p_ts timestamp"
    signups = spark.createDataFrame(
        [(1, 10, ts(0)), (2, 20, ts(0)), (99, 999, ts(23))],  # 99 = sentinel
        s_schema,
    )
    purchases = spark.createDataFrame(
        [(100, 10, ts(0, 30)), (900, 998, ts(23))],  # sentinel on right too
        p_schema,
    )
    sdir, pdir = str(tmp_path / "s"), str(tmp_path / "p")
    signups.coalesce(1).write.parquet(sdir)
    purchases.coalesce(1).write.parquet(pdir)
    joined = correlate_streams_outer(
        spark.readStream.schema(s_schema).parquet(sdir),
        spark.readStream.schema(p_schema).parquet(pdir),
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        max_delay="1 hour",
        watermark="2 hours",
    )
    q = (
        joined.select("signup_id", "purchase_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("outer_corr")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["signup_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM outer_corr").collect()
    }
    # signup 1 matched purchase 100; signup 2 emitted with NULL right side.
    assert (1, 100) in got
    assert (2, None) in got


def test_stream_stream_correlation_matches_batch(spark, tmp_path):
    """signup → purchase-within-24h correlation, streamed == batch."""
    t = load_tables(spark, SF_ORACLE)
    ev = t["events"].select("event_id", "user_id", "ts", "event_type")
    signups = ev.filter(F.col("event_type") == "signup").withColumnRenamed(
        "event_id", "signup_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").withColumnRenamed(
        "event_id", "purchase_id"
    )
    sdir, pdir = str(tmp_path / "s"), str(tmp_path / "p")
    signups.coalesce(2).write.parquet(sdir)
    purchases.coalesce(2).write.parquet(pdir)

    s_stream = spark.readStream.schema(signups.schema).parquet(sdir)
    p_stream = spark.readStream.schema(purchases.schema).parquet(pdir)
    joined = correlate_streams(
        s_stream.select("signup_id", "user_id", "ts"),
        p_stream.select("purchase_id", "user_id", F.col("ts").alias("p_ts")),
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        max_delay="24 hours",
        watermark="48 hours",
    )
    q = (
        joined.select("signup_id", "purchase_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("corr")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["signup_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM corr").collect()
    }
    batch = {
        (r["signup_id"], r["purchase_id"])
        for r in signups.alias("l")
        .join(
            purchases.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .select("signup_id", "purchase_id")
        .collect()
    }
    assert len(batch) > 0
    assert streamed == batch
