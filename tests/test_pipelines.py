"""End-to-end pipeline composition + remaining SURVEY §2 parity pieces:
hex key decode (S6), schema evolution (D5), partition-pruned scans."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark import plans as P
from python_cdc_postgres_to_clickhouse_spark.operators.upsert import replay_oracle
from python_cdc_postgres_to_clickhouse_spark.pipelines import users_cdc_pipeline
from python_cdc_postgres_to_clickhouse_spark.sources.avro import decode_hex_key
from python_cdc_postgres_to_clickhouse_spark.sources.cdc import generate_changelog
from python_cdc_postgres_to_clickhouse_spark.streaming.filestream import (
    read_change_stream,
    write_stream_fixture,
)
from python_cdc_postgres_to_clickhouse_spark.streaming.upsert_sink import ParquetUpsertSink
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


@pytest.mark.heavy
def test_users_cdc_pipeline_end_to_end(spark, tmp_path):
    """One call: change stream → deduped → materialized current state."""
    fx = generate_changelog(n_keys=25, n_ops=180, seed=44, dup_rate=0.3)
    src = str(tmp_path / "src")
    write_stream_fixture(spark, fx, src, n_files=5)
    q, sink = users_cdc_pipeline(
        spark,
        read_change_stream(spark, src),
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
    )
    q.awaitTermination(120)
    got = {r["id"]: r["username"] for r in sink.current_state().collect()}
    assert got == {k: v["username"] for k, v in replay_oracle(fx.events).items()}


def test_hex_key_decode(spark):
    """S6: reference main1.py:13 — unhexlify(key).decode('utf-8')."""
    df = spark.createDataFrame([("3432",), ("68656c6c6f",)], ["key"])
    got = [r["k"] for r in df.select(decode_hex_key(F.col("key")).alias("k")).collect()]
    assert got == ["42", "hello"]


def test_sink_schema_evolution_adds_column_with_nulls(spark, tmp_path):
    """D5: a column added mid-stream must not break the state table; old
    rows read as null for the new column."""
    sink = ParquetUpsertSink(spark, str(tmp_path / "state"), n_buckets=2)
    batch1 = spark.createDataFrame(
        [(1, "a", "c", 10, 0)], ["id", "username", "op", "source_lsn", "kafka_offset"]
    )
    sink.process_batch(batch1, 0)
    batch2 = spark.createDataFrame(
        [(2, "b", "NEW", "c", 11, 1)],
        ["id", "username", "email2", "op", "source_lsn", "kafka_offset"],
    )
    sink.process_batch(batch2, 1)
    rows = {r["id"]: r for r in sink.current_state().collect()}
    assert rows[2]["email2"] == "NEW"
    assert rows[1]["email2"] is None  # evolved schema, old row null-extended


def test_partition_pruned_scan(spark, tmp_path):
    """Partition pruning: a filter on the partition column must restrict
    the scan to matching directories (no data read from other years)."""
    t = load_tables(spark, SF_ORACLE)
    path = str(tmp_path / "orders_by_year")
    (
        t["orders"]
        .withColumn("order_year", F.year("o_orderdate"))
        .write.partitionBy("order_year")
        .parquet(path)
    )
    df = spark.read.parquet(path).filter(F.col("order_year") == 1998)
    plan = P.formatted(df)
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters", 1)[1][:200]
    years = {r["order_year"] for r in df.select("order_year").distinct().collect()}
    assert years == {1998}


def test_clickhouse_jdbc_option_plumbing(spark, tmp_path, monkeypatch):
    """S13 escape hatch: the foreachBatch writer must hand every micro-batch
    to a jdbc-format append with the ClickHouse connection options (no
    driver JAR in the container, so the terminal .save() is stubbed)."""
    from python_cdc_postgres_to_clickhouse_spark.pipelines import (
        clickhouse_append_batch,
        clickhouse_jdbc_options,
    )

    opts = clickhouse_jdbc_options(host="ch.example", database="analytics",
                                   table="users_current")
    assert opts["url"] == "jdbc:clickhouse://ch.example:8123/analytics"
    assert opts["dbtable"] == "users_current"
    assert opts["driver"] == "com.clickhouse.jdbc.ClickHouseDriver"

    recorded: list[dict] = []

    class _FakeWriter:
        def __init__(self):
            self.state = {}

        def format(self, fmt):
            self.state["format"] = fmt
            return self

        def options(self, **kw):
            self.state.setdefault("options", {}).update(kw)
            return self

        def mode(self, m):
            self.state["mode"] = m
            return self

        def save(self):
            recorded.append(self.state)

    batch = spark.createDataFrame([(1, "alice")], ["id", "username"])
    monkeypatch.setattr(type(batch), "write", property(lambda self: _FakeWriter()))
    clickhouse_append_batch(opts)(batch, batch_id=0)
    assert recorded == [
        {"format": "jdbc", "options": opts, "mode": "append"}
    ]


def test_clickhouse_sink_streaming_wiring(spark, tmp_path, monkeypatch):
    """clickhouse_jdbc_sink end-to-end on a real micro-batch stream: every
    batch must reach the (stubbed) jdbc writer with the configured options
    and append mode; checkpointing wired."""
    from python_cdc_postgres_to_clickhouse_spark.pipelines import (
        clickhouse_jdbc_options,
        clickhouse_jdbc_sink,
    )

    # Patch the *concrete* DataFrame class (pyspark.sql.classic...): the
    # abstract base's attribute is shadowed by the subclass property, so
    # patching pyspark.sql.DataFrame would miss the foreachBatch df.
    _DF = type(spark.range(1))

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "username"]).coalesce(
        1
    ).write.parquet(src)

    recorded: list[dict] = []

    class _FakeWriter:
        def __init__(self):
            self.state = {}

        def format(self, fmt):
            self.state["format"] = fmt
            return self

        def options(self, **kw):
            self.state.setdefault("options", {}).update(kw)
            return self

        def mode(self, m):
            self.state["mode"] = m
            return self

        def save(self):
            recorded.append(self.state)

    # foreachBatch runs driver-side, so a process-wide property patch on
    # DataFrame.write intercepts the terminal jdbc save.
    monkeypatch.setattr(_DF, "write", property(lambda self: _FakeWriter()))

    opts = clickhouse_jdbc_options(host="ch.example", table="users_current")
    stream = spark.readStream.schema("id long, username string").parquet(src)
    q = clickhouse_jdbc_sink(
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        options=opts,
        available_now=True,
    )
    q.awaitTermination(60)
    assert len(recorded) >= 1
    for call in recorded:
        assert call == {"format": "jdbc", "options": opts, "mode": "append"}
