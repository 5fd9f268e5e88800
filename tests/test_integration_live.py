"""Env-gated live-service integration legs (SURVEY.md §2.1 S1/S2/S13).

This container ships no Kafka broker, no spark-sql-kafka JAR, no ClickHouse
server, and no ClickHouse JDBC driver — so by default every test here
SKIPS. Point the env vars below at real services (and put the matching
JARs on the Spark classpath via ``spark.jars.packages``) and the same
tests close the loop end-to-end:

  SPARK_GRAFT_KAFKA_BOOTSTRAP   e.g. "localhost:9092" — a reachable broker
  SPARK_GRAFT_KAFKA_TOPIC       topic with ≥1 message (default "users")
  SPARK_GRAFT_CLICKHOUSE_URL    e.g. "jdbc:clickhouse://localhost:8123/default"
  SPARK_GRAFT_CLICKHOUSE_TABLE  writable table (default "users_spark_it")

The broker-less legs of the same surfaces (option plumbing, envelope
decode, file-based stream stand-in, JDBC sink through a real micro-batch
with a mocked writer) are covered in test_sources.py / test_pipelines.py /
test_streaming.py — these tests exist so a migrating user can verify their
actual infrastructure with one env-var flip.
"""

from __future__ import annotations

import os

import pytest

KAFKA_BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
KAFKA_TOPIC = os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", "users")
CLICKHOUSE_URL = os.environ.get("SPARK_GRAFT_CLICKHOUSE_URL")
CLICKHOUSE_TABLE = os.environ.get("SPARK_GRAFT_CLICKHOUSE_TABLE", "users_spark_it")

needs_kafka = pytest.mark.skipif(
    not KAFKA_BOOTSTRAP,
    reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no live broker in this env)",
)
needs_clickhouse = pytest.mark.skipif(
    not CLICKHOUSE_URL,
    reason="SPARK_GRAFT_CLICKHOUSE_URL not set (no live ClickHouse in this env)",
)


@needs_kafka
def test_live_kafka_subscribe_batch_read(spark):
    """S1 live leg: subscribe-style bounded read returns Kafka's canonical
    schema and ≥0 rows from the configured topic."""
    from python_cdc_postgres_to_clickhouse_spark.sources import kafka as K

    opts = K.batch_options(KAFKA_BOOTSTRAP, KAFKA_TOPIC)
    df = K.reader(spark, **opts).load()
    cols = set(df.columns)
    assert {"key", "value", "topic", "partition", "offset", "timestamp"} <= cols
    assert df.count() >= 0


@needs_kafka
def test_live_kafka_bounded_offset_range(spark):
    """S2 live leg: an explicit [0, 1) offset window on partition 0 returns
    at most one record — the reference's seek-based replay as one read."""
    from python_cdc_postgres_to_clickhouse_spark.sources import kafka as K

    opts = K.batch_options(
        KAFKA_BOOTSTRAP, KAFKA_TOPIC, partition=0, start_offset=0, end_offset=1
    )
    rows = K.reader(spark, **opts).load().collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["offset"] == 0 and rows[0]["partition"] == 0


@needs_clickhouse
def test_live_clickhouse_jdbc_roundtrip(spark, tmp_path):
    """S13 live leg: drive the foreachBatch JDBC sink with one micro-batch
    and read the rows back through the same JDBC source."""
    from python_cdc_postgres_to_clickhouse_spark.pipelines import (
        clickhouse_append_batch,
    )

    opts = {
        "url": CLICKHOUSE_URL,
        "dbtable": CLICKHOUSE_TABLE,
        "driver": "com.clickhouse.jdbc.ClickHouseDriver",
        "user": os.environ.get("SPARK_GRAFT_CLICKHOUSE_USER", "default"),
        "password": os.environ.get("SPARK_GRAFT_CLICKHOUSE_PASSWORD", ""),
    }
    batch = spark.createDataFrame(
        [(9001, "it-user", "it@example.com", 1)],
        "id long, username string, email string, version int",
    )
    clickhouse_append_batch(opts)(batch, batch_id=0)
    back = (
        spark.read.format("jdbc")
        .options(**opts)
        .load()
        .where("id = 9001")
        .collect()
    )
    assert any(r["username"] == "it-user" for r in back)


POSTGRES_URL = os.environ.get("SPARK_GRAFT_POSTGRES_URL")
POSTGRES_TABLE = os.environ.get("SPARK_GRAFT_POSTGRES_TABLE", "public.users")

needs_postgres = pytest.mark.skipif(
    not POSTGRES_URL,
    reason="SPARK_GRAFT_POSTGRES_URL not set (no live Postgres in this env)",
)


@needs_postgres
def test_live_postgres_snapshot_partitioned_read(spark):
    """S7 live leg: the initial-snapshot head as a partitioned JDBC read —
    the D1 base a migrating user feeds to apply_changes. Requires the
    Postgres JDBC driver JAR on the classpath."""
    from python_cdc_postgres_to_clickhouse_spark.pipelines import postgres_snapshot

    df = postgres_snapshot(spark, POSTGRES_URL, table=POSTGRES_TABLE)
    assert df.count() >= 0
    assert "id" in [c.lower() for c in df.columns]
