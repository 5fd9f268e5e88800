"""Online z-score anomaly detector: replay parity, determinism, and the
flag-worthiness of the baseline itself."""

from __future__ import annotations

import pytest

import pandas as pd
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.streaming.anomaly import (
    MIN_N,
    Z_THRESHOLD,
    running_anomaly_stats,
    score_and_update,
)
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


def _final_rows(spark, name):
    return {
        r["event_type"]: r
        for r in spark.sql(
            f"""
            SELECT * FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                           ORDER BY n_seen DESC) AS rn
              FROM {name}) WHERE rn = 1
            """
        ).collect()
    }


def _run(spark, src, ckpt, name, max_files=None):
    ev = load_tables(spark, SF_ORACLE)["events"]
    stream = spark.readStream.schema(
        ev.select("event_type", "ts", "event_id", "value").schema
    )
    if max_files:
        stream = stream.option("maxFilesPerTrigger", str(max_files))
    q = (
        running_anomaly_stats(stream.parquet(src))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return _final_rows(spark, name)


@pytest.mark.heavy
def test_single_batch_equals_offline_replay(spark, tmp_path):
    ev = (
        load_tables(spark, SF_ORACLE)["events"]
        .select("event_type", "ts", "event_id", "value")
        .filter(F.col("event_type").isin("click", "error"))
    )
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)

    got = _run(spark, src, str(tmp_path / "ck"), "anomaly_single")

    pdf = ev.orderBy("ts", "event_id").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        n, mean, m2, flagged = score_and_update(
            0, 0.0, 0.0, 0, grp["value"].to_numpy(), Z_THRESHOLD, MIN_N
        )
        r = got[etype]
        assert r["n_seen"] == n
        assert abs(r["mean"] - mean) < 1e-12
        assert abs(r["m2"] - m2) < 1e-6
        assert r["n_flagged"] == flagged, etype


@pytest.mark.heavy
def test_chunked_replay_is_deterministic(spark, tmp_path):
    ev = load_tables(spark, SF_ORACLE)["events"].select(
        "event_type", "ts", "event_id", "value"
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    a = _run(spark, src, str(tmp_path / "ck_a"), "anomaly_a", max_files=1)
    b = _run(spark, src, str(tmp_path / "ck_b"), "anomaly_b", max_files=1)
    assert set(a) == set(b)
    for etype in a:
        ra, rb = a[etype], b[etype]
        assert (ra["n_seen"], ra["n_flagged"]) == (rb["n_seen"], rb["n_flagged"])
        assert ra["mean"] == rb["mean"] and ra["m2"] == rb["m2"], etype
    # Totals are chunking-independent even though flags are prequential.
    exp_n = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {k: v["n_seen"] for k, v in a.items()} == exp_n


def test_scoring_never_peeks_at_its_own_value():
    """A massive outlier arriving after a stable baseline is flagged; the
    same value as the FIRST observation is not (no baseline yet)."""
    base = [10.0, 11.0] * 20
    n, mean, m2, flagged = score_and_update(
        0, 0.0, 0.0, 0, base + [1000.0], Z_THRESHOLD, MIN_N
    )
    assert flagged == 1
    n2, _, _, flagged2 = score_and_update(
        0, 0.0, 0.0, 0, [1000.0] + base, Z_THRESHOLD, MIN_N
    )
    assert flagged2 == 0, "first row has no baseline to violate"
    assert n == n2 == 41
