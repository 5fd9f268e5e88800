"""Join surface (SURVEY.md §2.4): equi / broadcast / outer / semi / anti /
theta / as-of.

Scale notes: the star join broadcasts the fixed-size dims (region, nation)
unconditionally; sf-scaled dims (customer, supplier) are left to AQE, which
switches sort-merge → broadcast at runtime when the built side fits. The
as-of join is the SURVEY §4 composition (range-join + per-key max) because
Spark SQL has no native as-of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables
from ._exprs import SQL_DISC_PRICE, disc_price, dsum, sql_dsum


@query(
    "j_inner_equi",
    oracle=f"""
    SELECT o_orderstatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("join",),
)
def j_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact inner equi-join (shuffle join on the orderkey)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "j_star_broadcast",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("join", "flagship"),
)
def j_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact → dims, fixed-size dims broadcast.

    Round 14 (verdict item 1): the round-13 unconditional fact widen was
    flat-at-best in the driver's measurements (and its q1 sibling a ×1.44
    regression); the widen is now bytes-scaled (``WIDEN_SCAN``: one task
    per 1 MB above a 2 MB floor — sweep-measured optimum at both core
    counts, see tables.py): ~10 tasks at sf0.1 (32c 1.62→0.90 s vs
    0.98 s at the old 32-way; 8-vs-32 ratio 1.10), no-op at sf0.01 and at
    real scale. The broadcast dim sides stay un-shuffled at every
    scale."""
    from ..tables import WIDEN_SCAN, _table_bytes, widen_small_scan

    t = load_tables(spark, sf_dir)
    fact = widen_small_scan(
        t["lineitem"],
        input_bytes=_table_bytes(sf_dir, "lineitem"),
        profile=WIDEN_SCAN,
    )
    return (
        fact
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "j_left_outer",
    oracle="""
    SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    tags=("join",),
)
def j_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (NULL-extended side)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", "total_spend"),
        )
    )


@query(
    "j_full_outer",
    oracle="""
    SELECT n_nationkey, cust_nations.ck AS cust_nation, supp_nations.sk AS supp_nation
    FROM (SELECT DISTINCT c_nationkey AS ck FROM customer) cust_nations
    FULL OUTER JOIN (SELECT DISTINCT s_nationkey AS sk FROM supplier) supp_nations
      ON cust_nations.ck = supp_nations.sk
    FULL OUTER JOIN nation ON COALESCE(cust_nations.ck, supp_nations.sk) = n_nationkey
    """,
    tags=("join",),
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations seen by customers vs by suppliers."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(F.col("c_nationkey").alias("ck")).distinct()
    supp = t["supplier"].select(F.col("s_nationkey").alias("sk")).distinct()
    both = cust.join(supp, cust.ck == supp.sk, "full_outer")
    return both.join(
        t["nation"],
        F.coalesce(both.ck, both.sk) == F.col("n_nationkey"),
        "full_outer",
    ).select(
        "n_nationkey",
        F.col("ck").alias("cust_nation"),
        F.col("sk").alias("supp_nation"),
    )


@query(
    "j_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join",),
)
def j_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having ≥1 order."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


@query(
    "j_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def j_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "j_theta_band",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_cheap_large
    FROM part p JOIN lineitem l
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    GROUP BY p_brand
    """,
    tags=("join",),
)
def j_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + non-equi residual predicate."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .join(
            t["lineitem"],
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_quantity") > F.col("p_size")),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_cheap_large"))
    )


@query(
    "j_asof_latest_event",
    oracle="""
    SELECT event_id, user_id,
           (SELECT max(o_orderdate) FROM orders o
             WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof_ts
    FROM events e
    WHERE event_id % 7 = 0
    """,
    tags=("join", "asof"),
)
def j_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event enriched with the user's latest order
    at-or-before the event time (the fixture's time ranges put orders
    before events, so matches genuinely exist — the reverse direction only
    exercises the no-match path).

    Spark SQL has no native ASOF JOIN; this is the SURVEY §4 composition —
    range join on (key, ts ≤ t) then per-left-row max, re-joined left to
    preserve rows with no match. At 100 TB the range join is keyed on
    user_id so it shuffles once on the key; the per-key aggregation is
    map-side combinable. The cogrouped merge_asof variant lives in
    operators/asof.py (equivalence tested in tests/test_asof.py).
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("event_id") % 7 == 0).select(
        "event_id", "user_id", "ts"
    )
    orders = t["orders"].select(
        F.col("o_custkey").alias("_ok"), F.col("o_orderdate").alias("_od")
    )
    matched = (
        ev.join(
            orders,
            (F.col("_ok") == F.col("user_id")) & (F.col("_od") <= F.col("ts")),
        )
        .groupBy("event_id")
        .agg(F.max("_od").alias("asof_ts"))
    )
    return ev.join(matched, "event_id", "left").select(
        "event_id", "user_id", "asof_ts"
    )


_SESS_GAP_US = 1_800_000_000  # 30 min, matches the sessionization family
_OVERLAP_BUCKET_US = 900_000_000  # 15-min blocking granularity (measured:
# vs 1 h buckets at sf0.1, candidate pairs drop 13.1M -> 3.6M for +3.5% explode)

INTERVAL_OVERLAP_SQL = f"""
WITH base AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts)
                   - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                   <= {_SESS_GAP_US}
              THEN 0 ELSE 1 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM base),
s AS (
  SELECT user_id, sess_id,
         MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
  FROM sess GROUP BY user_id, sess_id),
ov AS (
  SELECT a.user_id, a.sess_id, CAST(COUNT(*) AS BIGINT) AS n_concurrent
  FROM s a JOIN s b
    ON a.user_id <> b.user_id
   AND a.start_us <= b.end_us AND b.start_us <= a.end_us
  GROUP BY a.user_id, a.sess_id)
SELECT s.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN ov.n_concurrent IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlapped_sessions,
       CAST(COALESCE(MAX(ov.n_concurrent), 0) AS BIGINT) AS max_concurrent
FROM s LEFT JOIN ov ON s.user_id = ov.user_id AND s.sess_id = ov.sess_id
GROUP BY s.user_id
"""


@query(
    "j_interval_overlap",
    oracle=INTERVAL_OVERLAP_SQL,
    tags=("join", "interval", "behavior"),
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: sessionize each user's events (30-min
    gap), then count for every session the concurrent sessions of OTHER
    users (intervals intersecting it), reported per user as session counts
    and peak concurrency. The general shape is the temporal/range overlap
    join (validity intervals, meeting calendars, resource booking) that
    Spark has no native operator for.

    Scale shape: the oracle's theta self-join (DuckDB runs an IEJoin) is
    replaced Spark-side by **bucket blocking** — each interval explodes to
    the 15-min epochs it touches (intervals are gap-bounded, so the
    explode factor is small) and candidates meet through a bucket
    equi-join with the exact overlap predicate as residual. A pair that
    shares k buckets would match k times, so the residual additionally
    pins the join to the ONE bucket containing the overlap start
    (``floor(max(start_a, start_b) / bucket)``) — every overlapping pair
    meets exactly once and the pair-distinct exchange disappears
    entirely. Per-user rollups then combine two already-tiny aggregates
    (total sessions from the session table, overlap stats from the pair
    counts) instead of left-joining pair counts back onto every session.
    Candidate volume is Σ_bucket n_a·n_b — the bucket width trades
    explode factor against candidate density, and a skewed bucket (a
    flash-crowd hour) is ordinary equi-join skew that AQE splits. No
    CartesianProduct anywhere in the plan (the global sweep test pins
    this).

    All arithmetic is int64 epochs — exact on both engines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    from pyspark.sql import Window as W

    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wo))
    new_sess = F.when(gap <= _SESS_GAP_US, F.lit(0)).otherwise(F.lit(1))
    sess_id = F.sum("new_sess").over(wo.rowsBetween(W.unboundedPreceding, 0))
    s = (
        ev.select("user_id", "ts", "event_id", new_sess.alias("new_sess"))
        .withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
        )
        # Feeds BOTH explode sides and the per-user total — persisted so the
        # sessionize window+agg runs once, not three times (the partitioning
        # is already session-parallel: it comes out of the user_id shuffle).
        .persist()
    )
    bucket = F.explode(
        F.sequence(
            (F.col("start_us") / _OVERLAP_BUCKET_US).cast("long"),
            (F.col("end_us") / _OVERLAP_BUCKET_US).cast("long"),
        )
    ).alias("bucket")
    ea = s.select(
        F.col("user_id").alias("a_user"),
        F.col("sess_id").alias("a_sess"),
        F.col("start_us").alias("a_start"),
        F.col("end_us").alias("a_end"),
        bucket,
    )
    eb = s.select(
        F.col("user_id").alias("b_user"),
        F.col("sess_id").alias("b_sess"),
        F.col("start_us").alias("b_start"),
        F.col("end_us").alias("b_end"),
        bucket,
    )
    meet_bucket = (
        F.greatest("a_start", "b_start") / _OVERLAP_BUCKET_US
    ).cast("long")
    pairs = ea.join(eb, "bucket").filter(
        (F.col("a_user") != F.col("b_user"))
        & (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end"))
        & (F.col("bucket") == meet_bucket)
    )
    ov = pairs.groupBy("a_user", "a_sess").agg(
        F.count(F.lit(1)).alias("n_concurrent")
    )
    per_user_ov = ov.groupBy(F.col("a_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_overlapped_sessions"),
        F.max("n_concurrent").alias("max_concurrent"),
    )
    per_user_sessions = s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return per_user_sessions.join(per_user_ov, "user_id", "left").select(
        "user_id",
        "n_sessions",
        F.coalesce(F.col("n_overlapped_sessions"), F.lit(0).cast("long")).alias(
            "n_overlapped_sessions"
        ),
        F.coalesce(F.col("max_concurrent"), F.lit(0).cast("long")).alias(
            "max_concurrent"
        ),
    )


@query(
    "j_asof_forward_tolerance",
    oracle="""
    SELECT event_id, user_id,
           (SELECT min(p.ts) FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 30 MINUTE) AS asof_ts
    FROM events e
    WHERE e.event_type = 'click'
    """,
    tags=("join", "asof"),
)
def j_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction with a tolerance band: each click
    paired with the user's next purchase within 30 minutes (NULL when none
    follows in the band) — the attribution-window join.

    Exercises operators/asof.asof_join_composed(direction='forward',
    tolerance_us=...): the pandas merge_asof surface (direction +
    tolerance) expressed as a pure-JVM range join. The tolerance is not
    just semantics — it BOUNDS the range-join amplification to the rows
    inside the band (compare j_asof_latest_event, whose unbounded ≤ side
    grows with history), which is what keeps the composed plan viable at
    100 TB; the shuffle stays keyed on user_id.
    """
    from ..operators.asof import asof_join_composed

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join_composed(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        direction="forward",
        tolerance_us=30 * 60 * 1_000_000,
    )
    return out.select("event_id", "user_id", "asof_ts")
