"""As-of join: both implementations agree with each other and with the
declared oracle query's semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.operators.asof import asof_join_composed, asof_join_pandas
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


def _frames(spark):
    """Left = events (2024), right = orders (1997-2001): orders precede
    events so genuine matches exist; per-user first events may still
    pre-date nothing (null path also covered via users with no orders)."""
    t = load_tables(spark, SF_ORACLE)
    events = (
        t["events"]
        .filter(F.col("event_id") % 5 == 0)
        .select("event_id", "user_id", "ts")
    )
    orders = t["orders"].select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ots"),
        "o_orderkey",
        "o_totalprice",
    )
    return events, orders


def test_asof_implementations_agree(spark):
    events, orders = _frames(spark)
    composed = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join_composed(events, orders, "user_id", "ts", "ots").collect()
    }
    cogrouped = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join_pandas(events, orders, "user_id", "ts", "ots").collect()
    }
    assert composed == cogrouped
    assert len(composed) == events.count()
    matched = sum(1 for v in composed.values() if v is not None)
    assert matched > 0, "fixture must produce real matches"


def test_asof_pandas_carries_right_payload(spark):
    events, orders = _frames(spark)
    out = asof_join_pandas(
        events, orders, "user_id", "ts", "ots",
        right_value_cols=["o_orderkey", "o_totalprice"],
    )
    rows = out.collect()
    matched = [r for r in rows if r["asof_ts"] is not None]
    assert matched
    # The carried payload must correspond to a real order of that user at
    # the matched date.
    od = {
        (r["user_id"], r["ots"], r["o_orderkey"]): r["o_totalprice"]
        for r in orders.collect()
    }
    for r in matched[:200]:
        key = (r["user_id"], r["asof_ts"], r["asof_o_orderkey"])
        assert key in od
        assert od[key] == r["asof_o_totalprice"]


def _event_frames(spark):
    t = load_tables(spark, SF_ORACLE)
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    return clicks, purchases


def test_asof_forward_tolerance_implementations_agree(spark):
    clicks, purchases = _event_frames(spark)
    kw = dict(direction="forward", tolerance_us=30 * 60 * 1_000_000)
    composed = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join_composed(
            clicks, purchases, "user_id", "ts", "ts", **kw
        ).collect()
    }
    cogrouped = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join_pandas(
            clicks, purchases, "user_id", "ts", "ts", **kw
        ).collect()
    }
    assert composed == cogrouped
    matched = [v for v in composed.values() if v is not None]
    assert matched and len(matched) < len(composed), (
        "tolerance band must both match and miss at this sf"
    )


def test_asof_tolerance_is_a_band_not_a_hint(spark):
    """Every forward match must fall inside [ts, ts + tol]; shrinking the
    band can only null-out or keep each match, never change it to an
    earlier one (min is monotone in the band)."""
    clicks, purchases = _event_frames(spark)
    wide = {
        r["event_id"]: (r["ts"], r["asof_ts"])
        for r in asof_join_composed(
            clicks, purchases, "user_id", "ts", "ts",
            direction="forward", tolerance_us=30 * 60 * 1_000_000,
        ).collect()
    }
    for ts, m in wide.values():
        if m is not None:
            delta = (m - ts).total_seconds()
            assert 0 <= delta <= 1800, (ts, m)
    narrow = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join_composed(
            clicks, purchases, "user_id", "ts", "ts",
            direction="forward", tolerance_us=5 * 60 * 1_000_000,
        ).collect()
    }
    for eid, m in narrow.items():
        assert m is None or m == wide[eid][1]


def test_asof_rejects_bad_direction(spark):
    clicks, purchases = _event_frames(spark)
    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join_composed(clicks, purchases, "user_id", "ts", "ts", direction="nearest")
    with pytest.raises(ValueError, match="direction"):
        asof_join_pandas(clicks, purchases, "user_id", "ts", "ts", direction="nearest")
