"""Behavior-family invariants against brute-force Python replays on small
randomized event tables — independent of the DuckDB oracle (which shares
SQL semantics and could share a misconception)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import types as T

from python_cdc_postgres_to_clickhouse_spark.queries.behavior import (
    x_funnel_steps,
    x_retention_cohort,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TYPES = ["signup", "view", "purchase", "click", "error"]


def _random_events(seed: int, n_users: int = 12, n_events: int = 150):
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(n_events):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=rng.randrange(0, 60 * 24 * 20)),
                rng.randrange(1, n_users + 1),
                rng.choice(TYPES),
                round(rng.uniform(0, 100), 2),
                "{}",
            )
        )
    return rows


def _brute_funnel(rows):
    """Reference semantics: earliest signup, then earliest view strictly
    after it, then earliest purchase strictly after that — per user."""
    by_user: dict = {}
    for _eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, etype))
    s1 = s2 = s3 = 0
    for evs in by_user.values():
        evs.sort()
        t1 = min((ts for ts, e in evs if e == "signup"), default=None)
        if t1 is None:
            continue
        s1 += 1
        t2 = min((ts for ts, e in evs if e == "view" and ts > t1), default=None)
        if t2 is None:
            continue
        s2 += 1
        if any(ts > t2 for ts, e in evs if e == "purchase"):
            s3 += 1
    return s1, s2, s3

def _write_and_point(spark, tmp_path, rows, name):
    """Materialize a synthetic events table and register it as the view the
    query reads (the queries call load_tables, which re-points views — so
    instead run against a scratch sf_dir containing only events)."""
    import shutil

    sf_dir = tmp_path / name
    sf_dir.mkdir()
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(sf_dir / "events.parquet")
    )
    # The other tables aren't read by the behavior queries, but load_tables
    # loads the full dict — give it the real fixture files via symlinks.
    from .conftest import SF_SMOKE

    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ]:
        (sf_dir / f"{t}.parquet").symlink_to(f"{SF_SMOKE}/{t}.parquet")
    return str(sf_dir)


def test_funnel_matches_brute_force_on_random_tables(spark, tmp_path):
    for seed in (7, 23, 99):
        rows = _random_events(seed)
        sf = _write_and_point(spark, tmp_path, rows, f"f{seed}")
        got = x_funnel_steps(spark, sf).collect()[0]
        s1, s2, s3 = _brute_funnel(rows)
        assert (
            got["users_signup"], got["users_viewed"], got["users_purchased"]
        ) == (s1, s2, s3), seed


def test_retention_matches_brute_force_on_random_tables(spark, tmp_path):
    for seed in (11, 42):
        rows = _random_events(seed)
        sf = _write_and_point(spark, tmp_path, rows, f"r{seed}")
        got = {
            (r["cohort_day"], r["day_offset"]): r["n_users"]
            for r in x_retention_cohort(spark, sf).collect()
        }
        first: dict = {}
        for _eid, ts, uid, _e, _v, _p in rows:
            day = dt.datetime(ts.year, ts.month, ts.day)
            first[uid] = min(first.get(uid, day), day)
        exp: dict = {}
        seen = set()
        for _eid, ts, uid, _e, _v, _p in rows:
            day = dt.datetime(ts.year, ts.month, ts.day)
            off = (day - first[uid]).days
            if off <= 14 and (first[uid], off, uid) not in seen:
                seen.add((first[uid], off, uid))
                exp[(first[uid], off)] = exp.get((first[uid], off), 0) + 1
        assert got == exp, seed


def test_rfm_distributed_ntile_equals_global_window(spark, monkeypatch):
    """The size-gated distributed NTILE path (range-partitioned two-phase
    rank) is bit-equal to the default global-window path: force the gate
    to 0 and compare full segment censuses at fixture scale."""
    from python_cdc_postgres_to_clickhouse_spark.queries import behavior

    from .conftest import SF_ORACLE

    baseline = sorted(
        tuple(r) for r in behavior.x_rfm_segments(spark, SF_ORACLE).collect()
    )
    monkeypatch.setattr(behavior, "RFM_NTILE_GATE", 0)
    gated = sorted(
        tuple(r) for r in behavior.x_rfm_segments(spark, SF_ORACLE).collect()
    )
    assert baseline == gated
    assert baseline  # non-degenerate: the fixture has purchase events
