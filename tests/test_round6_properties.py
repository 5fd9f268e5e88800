"""Round-6 invariants: projection state algebra, ANY JOIN cardinality,
bracket/subscript semantics, interval-floor consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.dialect import clickhouse_sql, translate
from python_cdc_postgres_to_clickhouse_spark.operators.projection import (
    build_projection,
)
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_SMOKE

# Column exprs need an active SparkContext — build lazily inside tests.
KEYS = lambda: {"event_type": F.col("event_type")}  # noqa: E731
MEASURES = lambda: {  # noqa: E731
    "n": ("count", F.lit(1)),
    "cents": ("sum", F.round(F.col("value") * 100).cast("bigint")),
    "mn": ("min", F.col("value")),
    "mx": ("max", F.col("value")),
    "u": ("uniq", F.col("user_id")),
}
ASKED = {
    "n": ("count", "n"),
    "cents": ("sum", "cents"),
    "mn": ("min", "mn"),
    "mx": ("max", "mx"),
    "u": ("uniq", "u"),
}


def _rows(proj):
    return {
        r["event_type"]: tuple(r)[1:]
        for r in proj.answer(["event_type"], ASKED).collect()
    }


def test_projection_merge_is_associative_and_order_free(spark):
    """updated() must be order-insensitive and associative: any merge tree
    over any partitioning of the rows yields the same states (bit-exact
    values, register-max-identical HLL estimates)."""
    events = load_tables(spark, SF_SMOKE)["events"]
    parts = [
        events.filter(F.crc32(F.col("event_id").cast("string")) % 3 == i)
        for i in range(3)
    ]
    p0, p1, p2 = (build_projection(p, KEYS(), MEASURES()) for p in parts)
    # two different merge orders + a nested tree + the monolithic build
    order_a = p0.updated(p1).updated(p2)
    order_b = p2.updated(p0).updated(p1)
    tree = p1.updated(p2.updated(p0))
    mono = build_projection(events, KEYS(), MEASURES())
    assert _rows(order_a) == _rows(order_b) == _rows(tree) == _rows(mono)


def test_any_join_equals_explicit_dedup_join(spark):
    """The ANY JOIN rewrite must produce exactly one right row per key —
    equal to an explicit distinct-first join when right rows are identical
    per key, and |left| rows total (no fan-out)."""
    load_tables(spark, SF_SMOKE)
    got = clickhouse_sql(
        spark,
        "SELECT doc_id, tag FROM documents ANY LEFT JOIN "
        "(SELECT user_id % 40 AS doc_id, 'x' AS tag FROM events) AS e "
        "USING (doc_id) ORDER BY doc_id",
    )
    docs = spark.table("documents")
    assert got.count() == docs.count()
    explicit = (
        docs.join(
            spark.table("events")
            .select((F.col("user_id") % 40).alias("doc_id"), F.lit("x").alias("tag"))
            .distinct(),
            "doc_id", "left",
        ).select("doc_id", "tag").orderBy("doc_id")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in explicit.collect()]


def test_bracket_and_retention_constant_semantics(spark):
    """CH 1-based subscripts, negative indexing, out-of-range NULL, and the
    retention() expansion — evaluated as constants against ground truth."""
    row = spark.sql(translate(
        "SELECT [10, 20, 30][1] AS a, [10, 20, 30][-1] AS b, "
        "[10, 20, 30][7] AS c, arrayCumSum([1, 2, 3])[3] AS d, "
        "arrayDifference([5, 9, 4])[2] AS e, "
        "arrayCompact([1, 1, 2, 2, 1])[3] AS f, "
        "countEqual([1, 2, 1], 1) AS g"
    )).collect()[0]
    assert tuple(row) == (10, 30, None, 6, 4, 1, 2)


def test_limit_offset_runs_on_spark(spark):
    """Spark must accept the LIMIT n OFFSET m rewrite at runtime and skip
    exactly m rows of the total order."""
    load_tables(spark, SF_SMOKE)
    full = [r[0] for r in spark.sql(
        "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 15"
    ).collect()]
    page = [r[0] for r in clickhouse_sql(
        spark, "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5, 10"
    ).collect()]
    assert page == full[5:15]


def test_interval_floor_matches_named_shorthand(spark):
    """toStartOfInterval(ts, INTERVAL 5 MINUTE) ≡ toStartOfFiveMinutes(ts)
    on real data — the two rules must share one alignment grid."""
    load_tables(spark, SF_SMOKE)
    n = clickhouse_sql(
        spark,
        "SELECT count() AS bad FROM events WHERE "
        "toStartOfInterval(ts, INTERVAL 5 MINUTE) != toStartOfFiveMinutes(ts)",
    ).collect()[0]["bad"]
    assert n == 0


def test_sketch_rolling_mau_tracks_exact(spark):
    """x_active_users_sketch: every DAU/WAU/MAU estimate within HLL error
    of the exact rolling counts, same day set."""
    from python_cdc_postgres_to_clickhouse_spark.queries.behavior import (
        x_active_users_rolling,
        x_active_users_sketch,
    )

    exact = {r["day"]: r for r in x_active_users_rolling(spark, SF_SMOKE).collect()}
    est = {r["day"]: r for r in x_active_users_sketch(spark, SF_SMOKE).collect()}
    assert set(exact) == set(est)
    for day, e in exact.items():
        s = est[day]
        for a, b in (("dau", "dau_est"), ("wau", "wau_est"), ("mau", "mau_est")):
            assert abs(s[b] - e[a]) <= max(4, 0.05 * e[a]), (day, a, e[a], s[b])
