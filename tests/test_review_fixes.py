"""Regression tests for the round-1 self-review findings: rollup replay
idempotence, simhash blocking completeness, all-tombstone bucket
compaction, unspaced-language detection."""

from __future__ import annotations

import itertools
import os

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.operators import dedup as D
from python_cdc_postgres_to_clickhouse_spark.operators import textstats as TS
from python_cdc_postgres_to_clickhouse_spark.streaming.rollup_sink import HourlyRollupSink
from python_cdc_postgres_to_clickhouse_spark.streaming.upsert_sink import ParquetUpsertSink
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


def test_rollup_batch_replay_is_noop(spark, tmp_path):
    """foreachBatch may re-deliver a batch after crash; the additive merge
    must not double-count it."""
    t = load_tables(spark, SF_ORACLE)
    batch = t["events"].select("ts", "event_type", "value").limit(500)
    sink = HourlyRollupSink(spark, str(tmp_path / "rollup"))
    sink.process_batch(batch, batch_id=0)
    total1 = sink.serve().agg(F.sum("n_events")).first()[0]
    sink.process_batch(batch, batch_id=0)  # replay of the SAME batch id
    total2 = sink.serve().agg(F.sum("n_events")).first()[0]
    assert total1 == total2 == 500
    sink.process_batch(batch, batch_id=1)  # a genuinely new batch merges
    assert sink.serve().agg(F.sum("n_events")).first()[0] == 1000


def test_simhash_blocking_is_complete_for_max_hamming(spark):
    """Every signature pair within the Hamming radius must surface as a
    candidate — compare against brute-force over all signature pairs."""
    docs = load_tables(spark, SF_ORACLE)["documents"].limit(120)
    sigs = {
        r["doc"]: r["sh"]
        for r in docs.select(
            F.col("doc_id").alias("doc"), D.simhash(n_bits=16).alias("sh")
        ).collect()
    }
    for max_h in (1, 3):
        got = {
            (r["a"], r["b"])
            for r in D.simhash_near_duplicates(
                docs, max_hamming=max_h
            ).collect()
        }
        expected = {
            (a, b)
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= max_h
        }
        assert got == expected, f"max_hamming={max_h}: blocking dropped pairs"


def test_compact_removes_all_tombstone_buckets(spark, tmp_path):
    """A bucket whose rows are all expired tombstones must disappear."""
    sink = ParquetUpsertSink(spark, str(tmp_path / "state"), n_buckets=4)
    rows = [
        # live row and tombstone landing in (hash-dependent) buckets
        (i, f"u{i}", "d" if i % 2 else "c", 100 + i, i)
        for i in range(16)
    ]
    batch = spark.createDataFrame(
        rows, ["id", "username", "op", "source_lsn", "kafka_offset"]
    )
    sink.process_batch(batch, 0)
    raw = spark.read.parquet(str(tmp_path / "state"))
    assert raw.filter(F.col("op") == "d").count() == 8
    live_before = {r["id"] for r in sink.current_state().collect()}
    sink.compact(tombstone_horizon_lsn=10**9)  # all tombstones expired
    raw2 = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "state"))
    assert raw2.filter(F.col("op") == "d").count() == 0
    assert {r["id"] for r in sink.current_state().collect()} == live_before
    # No bucket directory contains only stale files (static overwrite wiped).
    bucket_dirs = [
        d for d in os.listdir(str(tmp_path / "state")) if d.startswith("bucket=")
    ]
    total_rows = raw2.count()
    assert total_rows == len(live_before)
    assert len(bucket_dirs) >= 1


def test_lang_id_detects_unspaced_chinese(spark):
    df = spark.createDataFrame(
        [(1, "我有的数据是在表里和不同的值"), (2, "the data and the value of a row")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["p"] for r in df.select("doc_id", TS.predict_lang().alias("p")).collect()}
    assert got == {1: "zh", 2: "en"}
