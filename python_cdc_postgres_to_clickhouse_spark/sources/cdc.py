"""Debezium change-event envelope: schema, unwrap, and fixture generation.

The reference flattens the envelope connector-side with the
``ExtractNewRecordState`` SMT (reference debezium.json:27-28, all.json:26-27),
discarding ``op``/``source.lsn`` and dropping deletes. The engine keeps the
envelope as a StructType and unwraps in the query (SURVEY.md §2.1 S10) —
strictly more capable: ``op`` routes change types (D2) and ``lsn`` orders the
latest-by-key upsert (D3).

Envelope shape follows FIXTURES.md A2 / the Debezium envelope
`{before, after, source{lsn, ts_ms, table}, op, ts_ms}`.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Row-state struct (post-unwrap `users` shape, reference schema.avsc:1-31).
USERS_ROW = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("username", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("created_at_us", T.LongType()),  # MicroTimestamp
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("before", USERS_ROW),  # null for op in ('c','r')
        T.StructField("after", USERS_ROW),  # null for op = 'd'
        T.StructField("op", T.StringType()),  # c/u/d/r
        T.StructField("ts_ms", T.LongType()),
        T.StructField("source_lsn", T.LongType()),  # total order
        T.StructField("source_table", T.StringType()),
        T.StructField("kafka_partition", T.IntegerType()),
        T.StructField("kafka_offset", T.LongType()),
    ]
)

OP_INSERT, OP_UPDATE, OP_DELETE, OP_READ = "c", "u", "d", "r"


def unwrap(
    envelopes: DataFrame,
    keep_deletes: bool = False,
    key_fields: tuple[str, ...] = ("id",),
) -> DataFrame:
    """ExtractNewRecordState equivalent: envelope → flat new-row records.

    Reference parity mode (``keep_deletes=False``) drops deletes and
    tombstones like the SMT's defaults; either way ``op`` and ``source_lsn``
    survive as columns for downstream ordering — dropping them (as the
    reference does) makes D3 impossible, so the engine always keeps them.

    Delete events carry a null ``after``, so key columns coalesce from
    ``before`` — otherwise every delete would group under a null key and the
    upsert (D3) could never retire its key. Non-key columns stay null for
    deletes (correct: the row no longer has a state).
    """
    flat = envelopes.filter(F.col("after").isNotNull() | (F.col("op") == OP_DELETE))
    if not keep_deletes:
        flat = flat.filter(F.col("op") != OP_DELETE)
    row_type = envelopes.schema["after"].dataType
    cols = [
        (
            F.coalesce(F.col(f"after.{f.name}"), F.col(f"before.{f.name}"))
            if f.name in key_fields
            else F.col(f"after.{f.name}")
        ).alias(f.name)
        for f in row_type.fields
    ]
    return flat.select(
        *cols, "op", "ts_ms", "source_lsn", "source_table",
        "kafka_partition", "kafka_offset",
    )


def with_event_time(df: DataFrame) -> DataFrame:
    """Map Debezium MicroTimestamp (µs long) → TimestampType (F5), and add
    a never-null ``event_time`` from the envelope's ``ts_ms`` — delete
    events carry a null row state, so watermarks/dedup anchor on the
    envelope timestamp, not the business column."""
    return df.withColumn(
        "created_at", F.timestamp_micros(F.col("created_at_us"))
    ).withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))


# ---------------------------------------------------------------------------
# Deterministic adversarial fixture generator (FIXTURES.md A2)
# ---------------------------------------------------------------------------


@dataclass
class ChangeLogFixture:
    """A generated change log plus its replay oracle.

    ``events`` are envelope dicts in *delivery* order (out-of-order and
    duplicated w.r.t. lsn — at-least-once semantics, reference main.py:12-16);
    ``expected_final`` is the replay oracle: apply events in (source_lsn)
    order, last non-delete wins per id.
    """

    events: list[dict] = field(default_factory=list)
    expected_final: dict[int, dict] = field(default_factory=dict)


def generate_changelog(
    n_keys: int = 50,
    n_ops: int = 400,
    seed: int = 42,
    dup_rate: float = 0.1,
    shuffle_window: int = 8,
) -> ChangeLogFixture:
    """Generate an adversarial users change log.

    Includes every sequence FIXTURES.md demands: snapshot reads first,
    duplicate deliveries (same lsn twice), bounded out-of-order delivery,
    update-after-delete (key resurrection), delete-last.
    """
    rng = random.Random(seed)
    lsn = 1000
    events: list[dict] = []
    state: dict[int, dict] = {}

    def row(key: int, version: int) -> dict:
        return {
            "id": key,
            "username": f"user_{key}_v{version}",
            "email": f"user{key}.v{version}@example.com",
            "created_at_us": 1_700_000_000_000_000 + key * 1_000_000 + version,
        }

    # Snapshot phase: op='r' for a subset of keys (snapshot.mode=initial).
    for key in range(0, n_keys, 2):
        r = row(key, 0)
        events.append(_env(None, r, OP_READ, lsn))
        state[key] = r
        lsn += 1

    versions = {k: 0 for k in range(n_keys)}
    for _ in range(n_ops):
        key = rng.randrange(n_keys)
        alive = key in state
        if not alive:
            # Dead key: only an insert is possible (covers insert-after-delete
            # resurrection, the FIXTURES.md update-after-delete sequence).
            op = OP_INSERT
        else:
            op = rng.choices([OP_UPDATE, OP_DELETE], weights=[4, 1])[0]
        versions[key] += 1
        v = versions[key]
        if op == OP_DELETE:
            events.append(_env(state.pop(key), None, OP_DELETE, lsn))
        else:
            r = row(key, v)
            events.append(_env(state.get(key), r, op, lsn))
            state[key] = r
        lsn += 1

    # Ensure a delete-last key exists.
    if state:
        key = sorted(state)[0]
        events.append(_env(state.pop(key), None, OP_DELETE, lsn))
        lsn += 1

    expected_final = dict(state)

    # Duplicate deliveries: replay some events verbatim (same lsn).
    dups = [dict(e) for e in events if rng.random() < dup_rate]
    events.extend(dups)

    # Bounded shuffle: swap within a window to simulate cross-partition
    # interleaving without violating per-event identity.
    for i in range(len(events) - 1, 0, -1):
        j = max(0, i - rng.randrange(1, shuffle_window + 1))
        events[i], events[j] = events[j], events[i]

    for pos, e in enumerate(events):
        e["kafka_partition"] = e["source_lsn"] % 3  # all.json:21 — 3 partitions
        e["kafka_offset"] = pos

    return ChangeLogFixture(events=events, expected_final=expected_final)


def _env(before: dict | None, after: dict | None, op: str, lsn: int) -> dict:
    return {
        "before": before,
        "after": after,
        "op": op,
        "ts_ms": 1_700_000_000_000 + lsn,
        "source_lsn": lsn,
        "source_table": "users",
        "kafka_partition": 0,
        "kafka_offset": 0,
    }


def changelog_df(spark: SparkSession, fixture: ChangeLogFixture) -> DataFrame:
    return spark.createDataFrame(fixture.events, schema=ENVELOPE_SCHEMA)
