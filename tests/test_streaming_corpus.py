"""Incremental corpus prep (streaming/corpus.py): chunked streaming replay
must reproduce the one-shot batch pipeline exactly, including across
restarts and corpus growth."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.queries.extensions import x_corpus_prep
from python_cdc_postgres_to_clickhouse_spark.streaming.corpus import (
    corpus_prep_stream,
    prep_documents,
)
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE

BATCH_COLS = ["doc_id", "fp", "n_tokens", "stopword_hits", "quality_score"]


@pytest.fixture()
def docs(spark):
    return load_tables(spark, SF_ORACLE)["documents"]


def _write_chunks(docs, directory: str, lo: int, hi: int, n_chunks: int, start_index: int = 0):
    """Write doc_id range [lo, hi) as n_chunks parquet files (one
    micro-batch each, id-ranged so growth tests can append later chunks)."""
    os.makedirs(directory, exist_ok=True)
    per = (hi - lo + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = docs.where(
            (F.col("doc_id") >= lo + i * per) & (F.col("doc_id") < lo + (i + 1) * per)
        )
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(directory, f"chunk_{start_index + i:05d}.parquet")
        )


def _stream(spark, directory, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(directory, "*.parquet"))
    )


def _canon(df):
    return sorted(
        (
            r["doc_id"],
            r["fp"],
            r["n_tokens"],
            r["stopword_hits"],
            round(r["quality_score"], 12),
        )
        for r in df.select(*BATCH_COLS).collect()
    )


def _batch_reference(docs):
    """Batch ground truth on an arbitrary subset: canonical (min doc_id)
    per fingerprint among quality-passing documents."""
    prepped = prep_documents(docs)
    w = W.partitionBy("fp").orderBy("doc_id")
    return (
        prepped.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@pytest.mark.heavy
def test_chunked_stream_equals_batch_pipeline(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    _write_chunks(docs, src, lo=0, hi=500, n_chunks=6)
    sink, q = corpus_prep_stream(
        spark,
        _stream(spark, src, docs.schema),
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert _canon(sink.current_state()) == _canon(x_corpus_prep(spark, SF_ORACLE))


@pytest.mark.heavy
def test_incremental_growth_and_restart(spark, docs, tmp_path):
    """Stream half the corpus; then the corpus grows and the pipeline
    re-attaches on the same checkpoint: it must converge to the full-batch
    result by processing only the new files."""
    src = str(tmp_path / "src")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _write_chunks(docs.where("doc_id < 250"), src, lo=0, hi=250, n_chunks=3)
    sink, q = corpus_prep_stream(spark, _stream(spark, src, docs.schema), state, ckpt)
    q.awaitTermination(120)
    assert _canon(sink.current_state()) == _canon(
        _batch_reference(docs.where("doc_id < 250"))
    )
    _write_chunks(
        docs.where("doc_id >= 250"), src, lo=250, hi=500, n_chunks=3, start_index=3
    )
    sink2, q2 = corpus_prep_stream(spark, _stream(spark, src, docs.schema), state, ckpt)
    q2.awaitTermination(120)
    assert _canon(sink2.current_state()) == _canon(x_corpus_prep(spark, SF_ORACLE))


@pytest.mark.heavy
def test_duplicate_redelivery_never_displaces_canonical(spark, tmp_path):
    """Re-delivering an already-seen document (same fingerprint, higher
    doc_id) must leave the canonical row untouched."""
    text = "the data value and of to a row " * 8
    a = spark.createDataFrame(
        [(1, text, "en")], "doc_id long, text string, lang string"
    )
    dup = spark.createDataFrame(
        [(9, text, "en")], "doc_id long, text string, lang string"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    a.coalesce(1).write.parquet(os.path.join(src, "chunk_00000.parquet"))
    dup.coalesce(1).write.parquet(os.path.join(src, "chunk_00001.parquet"))
    sink, q = corpus_prep_stream(
        spark,
        _stream(spark, src, a.schema),
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rows = sink.current_state().collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1  # first-seen wins, re-delivery ignored
