"""Property-based CDC test (SURVEY §5 strategy): for ANY op sequence with
duplicates and reordering, the Spark latest-by-key view equals the Python
replay oracle. Hypothesis drives the sequence shape; Spark runs once per
generated case on a session-scoped fixture."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from python_cdc_postgres_to_clickhouse_spark.operators.upsert import latest_by_key, replay_oracle
from python_cdc_postgres_to_clickhouse_spark.sources.cdc import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ChangeLogFixture,
    changelog_df,
    unwrap,
)


def _events_from_script(script: list[tuple[int, int]]) -> list[dict]:
    """Turn (key, action) pairs into a consistent Debezium event list.

    action parity decides update-vs-delete for live keys; dead keys always
    insert — mirroring real WAL constraints while letting Hypothesis explore
    arbitrary interleavings, duplicate deliveries, and shuffles.
    """
    state: dict[int, dict] = {}
    events: list[dict] = []
    lsn = 0
    for key, action in script:
        lsn += 1
        alive = key in state
        row = {
            "id": key,
            "username": f"u{key}_l{lsn}",
            "email": f"u{key}@x",
            "created_at_us": lsn,
        }
        if not alive:
            events.append(_env(None, row, OP_INSERT, lsn))
            state[key] = row
        elif action % 3 == 0:
            events.append(_env(state.pop(key), None, OP_DELETE, lsn))
        else:
            events.append(_env(state[key], row, OP_UPDATE, lsn))
            state[key] = row
    return events


def _env(before, after, op, lsn):
    return {
        "before": before,
        "after": after,
        "op": op,
        "ts_ms": lsn,
        "source_lsn": lsn,
        "source_table": "users",
        "kafka_partition": lsn % 3,
        "kafka_offset": 0,
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    script=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 9)), min_size=1, max_size=40
    ),
    dup_mask=st.lists(st.booleans(), min_size=0, max_size=40),
    shuffle_seed=st.integers(0, 2**16),
)
@pytest.mark.heavy
def test_latest_by_key_equals_replay_for_any_sequence(
    spark, script, dup_mask, shuffle_seed
):
    events = _events_from_script(script)
    # Duplicate deliveries (verbatim redelivery, same lsn).
    dups = [dict(e) for e, d in zip(events, dup_mask) if d]
    events = events + dups
    # Arbitrary delivery order.
    import random

    random.Random(shuffle_seed).shuffle(events)
    for off, e in enumerate(events):
        e["kafka_offset"] = off

    expected = {k: v["username"] for k, v in replay_oracle(events).items()}
    got = {
        r["id"]: r["username"]
        for r in latest_by_key(
            unwrap(changelog_df(spark, ChangeLogFixture(events=events)), keep_deletes=True)
        ).collect()
    }
    assert got == expected
