"""Streaming HLL sketch state: chunked build ≡ monolithic build, replay
idempotence WITHOUT markers, rollup-from-sketches, and accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.streaming.sketch_sink import (
    DistinctSketchSink,
)
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


def _events(spark):
    return load_tables(spark, SF_ORACLE)["events"].select("ts", "event_type", "user_id")


def test_stream_sketches_equal_monolithic_build(spark, tmp_path):
    """Register-max merge: estimates from chunk-merged state must EXACTLY
    equal a single-pass batch sketch — not merely be close."""
    events = _events(spark)
    src = str(tmp_path / "ev")
    events.repartition(6).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    sink = DistinctSketchSink(spark, str(tmp_path / "state"))
    q = sink.attach(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    served = {
        (r["bucket"], r["event_type"]): r["approx_users"]
        for r in sink.serve().collect()
    }
    mono = {
        (r["bucket"], r["event_type"]): r["e"]
        for r in events.withColumn("bucket", F.date_trunc("hour", F.col("ts")))
        .groupBy("bucket", "event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(sink.lgk))
            ).alias("e")
        )
        .collect()
    }
    assert served == mono
    assert len(served) > 10


def test_replay_is_a_noop_without_markers(spark, tmp_path):
    """HLL union is idempotent, so re-processing the same micro-batch must
    leave every estimate unchanged — the exactly-once story additive
    rollups can only get from applied-batch markers."""
    events = _events(spark)
    sink = DistinctSketchSink(spark, str(tmp_path / "state"))
    half = events.filter(F.col("user_id") % 2 == 0)
    sink.process_batch(half, batch_id=0)
    before = sorted(
        (str(r["bucket"]), r["event_type"], r["approx_users"])
        for r in sink.serve().collect()
    )
    sink.process_batch(half, batch_id=0)  # crash-replay of the same batch
    after = sorted(
        (str(r["bucket"]), r["event_type"], r["approx_users"])
        for r in sink.serve().collect()
    )
    assert before == after


def test_rollup_from_sketches_matches_direct_and_bounds(spark, tmp_path):
    events = _events(spark)
    sink = DistinctSketchSink(spark, str(tmp_path / "state"))
    sink.process_batch(events, batch_id=0)
    daily = {
        (r["bucket"], r["event_type"]): r["approx_users"]
        for r in sink.serve_rollup("day").collect()
    }
    direct = {
        (r["bucket"], r["event_type"]): r["e"]
        for r in events.withColumn("bucket", F.date_trunc("day", F.col("ts")))
        .groupBy("bucket", "event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(sink.lgk))
            ).alias("e")
        )
        .collect()
    }
    # Union of hourly sketches == daily single-pass sketch, exactly.
    assert daily == direct
    # And within the HLL error envelope of exact distinct counts.
    exact = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in events.withColumn("bucket", F.date_trunc("day", F.col("ts")))
        .groupBy("bucket", "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(daily[k] - n) / max(n, 1) < 0.1, (k, daily[k], n)


def test_state_stays_one_file_per_day(spark, tmp_path):
    """Each day partition must hold exactly one parquet file after any
    number of merges — per-day state is KB-sized and the dynamic overwrite
    would otherwise emit shuffle-partition-count near-empty files per
    batch."""
    import glob
    import os

    events = _events(spark)
    sink = DistinctSketchSink(spark, str(tmp_path / "state"))
    sink.process_batch(events.filter(F.col("user_id") % 2 == 0), batch_id=0)
    sink.process_batch(events.filter(F.col("user_id") % 2 == 1), batch_id=1)
    for day_dir in glob.glob(os.path.join(str(tmp_path / "state"), "day=*")):
        files = [f for f in os.listdir(day_dir) if f.endswith(".parquet")]
        assert len(files) == 1, (day_dir, files)


def test_merge_read_prunes_to_touched_day_partitions(spark, tmp_path):
    """The merge-time state read (read.parquet + day.isin(batch days)) must
    touch ONLY the day= partitions the incoming batch spans — partition
    pruning on the state dir, asserted on the files actually read, so a
    one-day micro-batch never rescans months of state."""
    events = _events(spark)
    sink = DistinctSketchSink(spark, str(tmp_path / "state"))
    sink.process_batch(events, batch_id=0)

    state = spark.read.parquet(sink.state_dir)
    all_days = sorted(r["day"] for r in state.select("day").distinct().collect())
    assert len(all_days) >= 2, "fixture must span multiple days"
    target = all_days[0]
    # Mirror process_batch's merge read exactly.
    pruned = state.filter(F.col("day").isin([target]))
    read_files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert read_files, "pruned read returned no files"
    for f in read_files:
        assert f"day={target.isoformat()}" in f, (f, target)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    after = plan.split("PartitionFilters")[1][:200] if "PartitionFilters" in plan else ""
    assert "day" in after, f"day predicate not in PartitionFilters:\n{plan}"
