"""Kafka source builders (SURVEY.md §2.1 S1/S2/S11).

One Spark source covers all three reference consumers: the confluent-kafka
subscribe loop (main.py:12-29), the seek-based bounded replay (main1.py:5-25)
and the kafka-python client (read_from_kafka.py:21-26) — client choice is a
non-semantic detail; subscription, offsets, and isolation level are the
semantics, and they surface here as explicit options.

The broker-less test story: option-building is pure (unit-testable), and
``reader``/``stream_reader`` only touch the network at ``load()`` time. This
container has no Kafka JAR or broker, so tests cover the option plumbing and
the file-based stand-in stream (streaming/filestream.py) exercises the same
downstream operators.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader

DEFAULT_POLL_TRIGGER_SECONDS = 10  # mirrors consumer.poll(10), main.py:29


def bounded_offsets(topic: str, partition: int, start: int, end: int) -> tuple[str, str]:
    """Offset-range JSON for a bounded replay — replaces the reference's
    per-offset assign/seek/poll loop (main1.py:16-24) with one batch read.
    """
    return (
        json.dumps({topic: {str(partition): start}}),
        json.dumps({topic: {str(partition): end}}),
    )


def batch_options(
    bootstrap_servers: str,
    topic: str,
    partition: int | None = None,
    start_offset: int | None = None,
    end_offset: int | None = None,
    read_committed: bool = True,
) -> dict[str, str]:
    """Options for a bounded batch read (S2 + S11)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.isolation.level": "read_committed" if read_committed else "read_uncommitted",
    }
    if partition is not None and start_offset is not None and end_offset is not None:
        starting, ending = bounded_offsets(topic, partition, start_offset, end_offset)
        opts.update({"assign": json.dumps({topic: [partition]}),
                     "startingOffsets": starting, "endingOffsets": ending})
    else:
        opts.update({"subscribe": topic, "startingOffsets": "earliest",
                     "endingOffsets": "latest"})
    return opts


def stream_options(
    bootstrap_servers: str,
    topics: str | list[str] | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    min_partitions: int | None = None,
) -> dict[str, str]:
    """Options for the continuous subscribe source (S1/S9).

    ``subscribe_pattern`` covers the all-tables connector (one topic per
    table, reference all.json) the way ``table.include.list``-absence does
    connector-side; ``min_partitions`` maps topic partitions to more Spark
    tasks than Kafka partitions when decode dominates.
    """
    if (topics is None) == (subscribe_pattern is None):
        raise ValueError("exactly one of topics / subscribe_pattern required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if topics is not None:
        opts["subscribe"] = ",".join([topics] if isinstance(topics, str) else topics)
    else:
        opts["subscribePattern"] = subscribe_pattern
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def reader(spark: SparkSession, **options: str):
    """Batch Kafka reader; raises a clear error when the Kafka JAR is absent."""
    r = spark.read.format("kafka")
    for k, v in options.items():
        r = r.option(k, v)
    return r


def stream_reader(spark: SparkSession, **options: str) -> DataStreamReader:
    r = spark.readStream.format("kafka")
    for k, v in options.items():
        r = r.option(k, v)
    return r
