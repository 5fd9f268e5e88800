"""File-based change-event stream: the broker-less stand-in for Kafka.

Writes a ChangeLogFixture as a sequence of small parquet files (one per
micro-batch worth of events, preserving delivery order) and reads them back
with ``readStream`` — the engine-visible face of S8 (WAL changelog source)
when no broker exists. The downstream pipeline is identical to the Kafka
path; only the source builder differs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..sources.cdc import ENVELOPE_SCHEMA, ChangeLogFixture, changelog_df


def write_stream_fixture(
    spark: SparkSession,
    fixture: ChangeLogFixture,
    directory: str,
    n_files: int = 10,
) -> list[str]:
    """Materialize the fixture as n_files parquet files in delivery order.

    Each file is one "poll batch"; the file source picks them up in
    lexicographic order (zero-padded names) when ``maxFilesPerTrigger=1``.
    """
    os.makedirs(directory, exist_ok=True)
    events = fixture.events
    chunk = max(1, (len(events) + n_files - 1) // n_files)
    paths = []
    for i in range(0, len(events), chunk):
        part = ChangeLogFixture(events=events[i : i + chunk])
        path = os.path.join(directory, f"batch_{i // chunk:05d}.parquet")
        changelog_df(spark, part).coalesce(1).write.mode("overwrite").parquet(path)
        paths.append(path)
    return paths


def read_change_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming envelope source over a fixture directory."""
    return (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(os.path.join(directory, "*.parquet"))
    )
