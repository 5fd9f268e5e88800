"""MergeTree PROJECTION analog: state re-merge correctness at every key
granularity, materialized routing that never touches the base table,
incremental maintenance ≡ rebuild, and loud non-coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.operators.projection import (
    Projection,
    build_projection,
    route,
)
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE

KEYS = lambda: {  # noqa: E731 - tiny fixture factory
    "event_type": F.col("event_type"),
    "day": F.to_date("ts"),
}
MEASURES = lambda: {  # noqa: E731
    "n": ("count", F.lit(1)),
    "cents": ("sum", F.round(F.col("value") * 100).cast("bigint")),
    "mn": ("min", F.col("value")),
    "mx": ("max", F.col("value")),
    "u": ("uniq", F.col("user_id")),
}


def _events(spark):
    return load_tables(spark, SF_ORACLE)["events"]


def _direct(events, keys):
    """Ground truth straight off the base table, keyed by ``keys`` (may be
    empty: global aggregate, single () key)."""
    agg = events.withColumn("day", F.to_date("ts")).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count_distinct("user_id").alias("exact_u"),
    )
    return {tuple(r[k] for k in keys): r for r in agg.collect()}


ASKED = {
    "n_events": ("count", "n"),
    "total_cents": ("sum", "cents"),
    "min_value": ("min", "mn"),
    "max_value": ("max", "mx"),
    "uniq_users": ("uniq", "u"),
    "avg_cents": ("avg", "cents", "n"),
}


@pytest.mark.parametrize("group_keys", [["event_type", "day"], ["event_type"], []])
def test_answer_remerges_exactly_at_every_granularity(spark, group_keys):
    events = _events(spark)
    proj = build_projection(events, KEYS(), MEASURES())
    got = {
        tuple(r[k] for k in group_keys): r
        for r in proj.answer(group_keys, ASKED).collect()
    }
    want = _direct(events, group_keys)
    assert set(got) == set(want)
    for key, g in got.items():
        w = want[key]
        assert g["n_events"] == w["n_events"], key
        assert g["total_cents"] == w["total_cents"], key
        assert g["min_value"] == w["min_value"], key
        assert g["max_value"] == w["max_value"], key
        assert g["avg_cents"] == pytest.approx(
            w["total_cents"] / w["n_events"]
        ), key
        # HLL estimate within the sketch's standard error (lgK=12 → ~1.6%·4σ)
        assert abs(g["uniq_users"] - w["exact_u"]) <= max(
            4, 0.07 * w["exact_u"]
        ), key


def test_routed_scan_reads_projection_not_base(spark, tmp_path):
    events = _events(spark)
    proj = build_projection(events, KEYS(), MEASURES())
    path = str(tmp_path / "proj")
    proj.write(path)
    stored = Projection.read(spark, path, ["event_type", "day"], proj.kinds)

    routed = route(stored, ["event_type"], ASKED, base_plan=lambda: None)
    assert routed is not None
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "proj" in plan and "events.parquet" not in plan
    # The projection IS small: one row per (type, day) key
    n_keys = (
        events.select("event_type", F.to_date("ts").alias("day"))
        .distinct().count()
    )
    assert stored.df.count() == n_keys


def test_route_falls_back_when_not_covered(spark):
    events = _events(spark)
    proj = build_projection(events, KEYS(), MEASURES())
    sentinel = events.limit(1)

    # key outside the projection
    got = route(proj, ["user_id"], {"n_events": ("count", "n")},
                base_plan=lambda: sentinel)
    assert got is sentinel
    # measure kind mismatch (asking a sum of the count state)
    got = route(proj, ["event_type"], {"x": ("sum", "n")},
                base_plan=lambda: sentinel)
    assert got is sentinel
    # avg needs a (sum, count) state pair
    got = route(proj, ["event_type"], {"x": ("avg", "mn", "n")},
                base_plan=lambda: sentinel)
    assert got is sentinel
    with pytest.raises(ValueError, match="does not cover"):
        proj.answer(["user_id"], {"n_events": ("count", "n")})


def test_incremental_update_equals_rebuild(spark):
    events = _events(spark)
    old = events.filter(F.dayofmonth("ts") <= 15)
    new = events.filter(F.dayofmonth("ts") > 15)
    incr = build_projection(old, KEYS(), MEASURES()).updated(
        build_projection(new, KEYS(), MEASURES())
    )
    full = build_projection(events, KEYS(), MEASURES())
    asked = dict(ASKED)
    a = {tuple(r)[:1]: r for r in incr.answer(["event_type"], asked).collect()}
    b = {tuple(r)[:1]: r for r in full.answer(["event_type"], asked).collect()}
    assert set(a) == set(b)
    for k in a:
        # value states bit-exact; the HLL union is register-max so the
        # chunked estimate equals the monolithic one exactly too
        assert a[k] == b[k], k


def test_build_rejects_unknown_kind(spark):
    events = _events(spark)
    with pytest.raises(ValueError, match="unknown measure kinds"):
        build_projection(events, KEYS(), {"z": ("p99", F.col("value"))})
    with pytest.raises(ValueError, match="specs differ"):
        build_projection(events, KEYS(), MEASURES()).updated(
            build_projection(events, {"event_type": F.col("event_type")},
                             {"n": ("count", F.lit(1))})
        )
