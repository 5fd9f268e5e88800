"""Online per-source admission cap: exactly min(K, available) admitted per
source, lifetime cap across micro-batches, earlier batches win, restart
admits nothing new (counter state survives the checkpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.streaming.admission import admit_first_k
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE

K = 7


def _docs(spark):
    return load_tables(spark, SF_ORACLE)["documents"].select("doc_id", "source")


def _run_stream(spark, src, ckpt, table):
    docs_schema = "doc_id long, source string"
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        admit_first_k(stream, K)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow terminates on its own; returning False here means the
    # batches are still running and the memory table would be read partial.
    assert q.awaitTermination(600), "admission stream did not finish in 600s"


def test_admission_cap_and_batch_precedence(spark, tmp_path):
    docs = _docs(spark)
    # Two explicit chunks: earlier files must win the budget.
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "docs")
    first.coalesce(1).write.parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    _run_stream(spark, src, str(tmp_path / "ckpt"), "admitted")
    rows = spark.sql("SELECT * FROM admitted").collect()

    per_source_avail = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got: dict = {}
    for r in rows:
        got.setdefault(r["source"], []).append(r)
    assert set(got) == set(per_source_avail)
    for srcname, admitted in got.items():
        assert len(admitted) == min(K, per_source_avail[srcname]), srcname
        # Dense 1..k ranks, no duplicates.
        assert sorted(r["admit_rank"] for r in admitted) == list(
            range(1, len(admitted) + 1)
        ), srcname
    # A source with ≥K docs in the first chunk admits ONLY first-chunk docs
    # (earlier micro-batches consume the budget first).
    first_counts = {
        r["source"]: r["n"]
        for r in first.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for srcname, admitted in got.items():
        if first_counts.get(srcname, 0) >= K:
            assert all(r["doc_id"] % 2 == 0 for r in admitted), srcname


def test_admission_restart_admits_nothing_new(spark, tmp_path):
    """Counter state survives the checkpoint: a restart over the same files
    re-admits nothing (memory sink can't recover a checkpoint, so this
    leg uses a parquet sink)."""
    docs = _docs(spark)
    src = str(tmp_path / "docs")
    docs.coalesce(2).write.parquet(src)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, source string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            admit_first_k(stream, K)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "admission stream did not finish in 600s"

    run()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    # Restart on the SAME checkpoint with no new input files.
    run()
    assert spark.read.parquet(out).count() == n_first
