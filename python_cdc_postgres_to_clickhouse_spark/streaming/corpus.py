"""Incremental corpus prep: the EXT training-data pipeline as a stream.

`x_corpus_prep` (queries/extensions.py) is the batch shape: normalize →
exact-dedup (canonical = min doc_id per content fingerprint) → quality
filter, one Catalyst plan. A growing corpus wants the same result without
re-reading everything, so this module re-expresses it on the engine's CDC
machinery — the same division the reference's pipeline uses (consume →
upsert into serving state), with the content fingerprint as the key:

- the per-document stages (fingerprint, quality features, split label)
  are STATELESS narrow maps — identical code paths in batch and stream;
- cross-batch exact dedup is keyed state in the bucketed Parquet upsert
  sink (`ParquetUpsertSink`): key = fingerprint, winner = first-seen
  (min doc_id), so a re-ingested or duplicated document can never replace
  the canonical copy;
- quality filtering commutes with fingerprint-dedup (the score is a pure
  function of the normalized token stream, which all same-fingerprint
  copies share), so filtering before the stateful stage shrinks state
  without changing the result.

At 100 TB: per-trigger cost is the narrow prep of the new micro-batch
plus a merge into only the touched fingerprint buckets — never a corpus
rescan. Equivalence with the batch plan is asserted in
tests/test_streaming_corpus.py (chunked replay == one-shot batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import textstats as TS
from ..operators.sampling import split_column
from .upsert_sink import ParquetUpsertSink


def prep_documents(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """Stateless prep stages — safe on a batch OR streaming DataFrame.

    Output per surviving document: identity, fingerprint, quality
    features, split label, plus the upsert bookkeeping columns (``op``,
    ``first_rank``) the keyed-dedup sink orders by.
    """
    return (
        TS.quality_features(docs)
        .filter(F.col("quality_score") >= min_quality)
        .select(
            "doc_id",
            TS.fingerprint().alias("fp"),
            "n_tokens",
            "stopword_hits",
            "quality_score",
            split_column("doc_id").alias("split"),
            F.lit("c").alias("op"),
            # latest_by_key keeps the MAX order key; negating doc_id makes
            # that the FIRST-seen document — canonical copy semantics.
            (-F.col("doc_id")).alias("first_rank"),
        )
    )


def corpus_prep_stream(
    spark: SparkSession,
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.5,
    n_buckets: int = 16,
    **trigger_kwargs,
) -> tuple[ParquetUpsertSink, StreamingQuery]:
    """Attach the incremental corpus-prep pipeline to a document stream.

    Returns the sink (read ``sink.current_state()`` for the canonical
    corpus) and the running query. Defaults to ``availableNow`` (drain
    what exists, then stop) — the catch-up/backfill trigger; pass e.g.
    ``processingTime='10 seconds'`` for continuous ingestion.
    """
    sink = ParquetUpsertSink(
        spark,
        state_dir,
        keys=("fp",),
        order_by=("first_rank",),
        n_buckets=n_buckets,
    )
    query = sink.attach(
        prep_documents(doc_stream, min_quality=min_quality),
        checkpoint_dir,
        **trigger_kwargs,
    )
    return sink, query
