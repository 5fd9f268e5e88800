"""CDC semantic tests (SURVEY.md §5.2): latest-by-key upsert vs replay
oracle on adversarial change logs; envelope unwrap parity with the
reference SMT behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.operators.upsert import (
    apply_changes,
    latest_by_key,
    replay_oracle,
)
from python_cdc_postgres_to_clickhouse_spark.sources.cdc import (
    OP_DELETE,
    changelog_df,
    generate_changelog,
    unwrap,
    with_event_time,
)


def _final_state(df, cols=("id", "username", "email", "created_at_us")):
    return {r["id"]: {c: r[c] for c in cols} for r in df.select(*cols).collect()}


def test_latest_by_key_matches_replay_oracle(spark):
    fx = generate_changelog(n_keys=50, n_ops=400, seed=42)
    env = changelog_df(spark, fx)
    flat = unwrap(env, keep_deletes=True)
    got = _final_state(latest_by_key(flat))
    assert got == fx.expected_final
    assert got == replay_oracle(fx.events)


def test_latest_by_key_other_seeds(spark):
    for seed in (7, 13, 99):
        fx = generate_changelog(n_keys=30, n_ops=250, seed=seed, dup_rate=0.25)
        env = changelog_df(spark, fx)
        got = _final_state(latest_by_key(unwrap(env, keep_deletes=True)))
        assert got == fx.expected_final, f"seed={seed}"


def test_unwrap_reference_parity_drops_deletes(spark):
    """Reference SMT default: deletes dropped, flat new-row records."""
    fx = generate_changelog(n_keys=20, n_ops=100, seed=3)
    env = changelog_df(spark, fx)
    flat = unwrap(env)  # keep_deletes=False — reference parity
    assert flat.filter(F.col("op") == OP_DELETE).count() == 0
    assert {"id", "username", "email", "created_at_us", "op", "source_lsn"} <= set(
        flat.columns
    )
    n_non_delete = env.filter(F.col("op") != OP_DELETE).count()
    assert flat.count() == n_non_delete


def test_apply_changes_snapshot_union(spark):
    """D1: snapshot ⊎ changelog == full replay."""
    fx = generate_changelog(n_keys=40, n_ops=300, seed=11)
    env = changelog_df(spark, fx)
    flat = unwrap(env, keep_deletes=True)
    # Split: snapshot = state after first 100 lsns; changelog = the rest.
    cut = sorted(e["source_lsn"] for e in fx.events)[100]
    snap_events = [e for e in fx.events if e["source_lsn"] <= cut]
    snapshot = latest_by_key(
        unwrap(changelog_df(spark, type(fx)(events=snap_events)), keep_deletes=True)
    ).drop("op", "source_lsn", "kafka_offset")
    changes = flat.filter(F.col("source_lsn") > cut)
    got = _final_state(apply_changes(snapshot, changes))
    assert got == fx.expected_final


def test_micro_timestamp_mapping(spark):
    fx = generate_changelog(n_keys=5, n_ops=20, seed=1)
    df = with_event_time(unwrap(changelog_df(spark, fx)))
    row = df.select("created_at_us", "created_at").first()
    assert row["created_at"] is not None
    # µs-since-epoch → UTC timestamp, exact microsecond fidelity.
    import datetime as dt

    expected = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=row["created_at_us"])
    assert row["created_at"] == expected
