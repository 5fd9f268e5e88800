"""Behavioral / event-stream analytics (funnel, retention, gap-fill,
outliers) plus deterministic weighted sampling.

The reference ships its events into ClickHouse and leaves this analysis to
the warehouse (reference docker-compose.yml:155-174 provisions the server;
main.py:1-58 only delivers rows). These queries are that downstream surface,
native in Spark over the same `events` / `documents` tables.

Scale notes (100 TB):
- Funnel and retention shuffle on ``user_id`` once per step; every
  subsequent join/agg reuses the same key, so AQE keeps the exchanges
  co-partitioned. No per-user state exceeds the user's own event count.
- Gap-fill explodes a per-user day spine bounded by the observation window
  (days, not events), then fills with one bounded per-user window.
- The z-score pass is two scans: a 5-row stats aggregate (decimal-exact,
  map-side combinable) broadcast back over the fact table — never a
  re-shuffle of events on a non-key.
- Weighted sampling is a narrow keying expression + ``TakeOrdered(k)`` —
  no global sort, no driver collect.

Float determinism: means/variances are derived from exact integer-cent sums
(see OUTLIER_SQL comment) surfaced as DOUBLE, then combined with the *same* IEEE754 expression tree on both
engines, so every derived double is bit-identical. The weighted-sample ln()
key is libm-evaluated on both engines; it ranks rows but is deliberately NOT
an output column (transcendental ulp differences would break value hashing,
see scalars.c_math_funcs) — orderings flip only if two keys collide within
~1e-16 relative, which the md5-uniform construction makes vanishingly rare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables

FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS users_signup,
       (SELECT count(*) FROM s2) AS users_viewed,
       (SELECT count(*) FROM s3) AS users_purchased,
       CAST((SELECT count(*) FROM s2) AS DOUBLE)
         / CAST((SELECT count(*) FROM s1) AS DOUBLE) AS view_rate,
       CAST((SELECT count(*) FROM s3) AS DOUBLE)
         / CAST((SELECT count(*) FROM s2) AS DOUBLE) AS purchase_rate
"""


@query("x_funnel_steps", oracle=FUNNEL_SQL, tags=("ext", "behavior", "events"))
def x_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel signup → view → purchase.

    Each step keeps users whose earliest qualifying event is strictly
    after their previous step's timestamp. Every aggregate and join keys
    on ``user_id``, so the three steps ride one hash partitioning; the
    final counts are 1-row aggregates combined via broadcast — the scalar
    pattern tpch_q15 uses. Reference analog: warehouse-side funnel over
    the CDC-delivered events table.
    """
    ev = load_tables(spark, sf_dir)["events"].select("user_id", "ts", "event_type")

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    c1 = s1.agg(F.count("*").alias("users_signup"))
    c2 = s2.agg(F.count("*").alias("users_viewed"))
    c3 = s3.agg(F.count("*").alias("users_purchased"))
    return (
        c1.crossJoin(c2)
        .crossJoin(c3)
        .select(
            "users_signup",
            "users_viewed",
            "users_purchased",
            (
                F.col("users_viewed").cast("double")
                / F.col("users_signup").cast("double")
            ).alias("view_rate"),
            (
                F.col("users_purchased").cast("double")
                / F.col("users_viewed").cast("double")
            ).alias("purchase_rate"),
        )
    )


RETENTION_SQL = """
WITH first_seen AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS BIGINT)
           AS day_offset,
         e.user_id
  FROM events e JOIN first_seen f USING (user_id)
)
SELECT cohort_day, day_offset, count(*) AS n_users
FROM activity WHERE day_offset <= 14
GROUP BY cohort_day, day_offset
"""


@query("x_retention_cohort", oracle=RETENTION_SQL, tags=("ext", "behavior", "events"))
def x_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle: users active N days after first event.

    First-seen agg and the activity join both key on ``user_id`` (one
    partitioning reused); the distinct + final agg shuffle carries only
    (cohort, offset, user) triples capped at 15 offsets per user-day.
    """
    ev = load_tables(spark, sf_dir)["events"].select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
            "user_id",
        )
        .where(F.col("day_offset") <= 14)
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_users")
    )


GAP_FILL_SQL = """
WITH ranked AS (
  SELECT user_id, date_trunc('day', ts) AS day, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), daily AS (
  SELECT user_id, day, value FROM ranked WHERE rn = 1
), bounds AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
)
SELECT s.user_id, s.day,
       last_value(d.value IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.day) AS value_filled,
       d.value IS NOT NULL AS is_observed
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


@query("x_gap_fill_locf", oracle=GAP_FILL_SQL, tags=("ext", "behavior", "timeseries"))
def x_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample per user with last-observation-carried-forward.

    The per-day representative is a ``max_by`` over (ts, event_id) — one
    hash aggregate, no per-day sort (the oracle's row_number form is
    order-equivalent). The spine is ``sequence(d0, d1)`` exploded per
    user — its size is the observation window in days, independent of
    event volume — and the LOCF window is bounded per user. The double
    ``value`` passes through untouched, so parity is bit-exact.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "value"
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("value"))

    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("value", ignorenulls=True).over(w).alias("value_filled"),
            F.col("value").isNotNull().alias("is_observed"),
        )
    )


# Stats from exact integer-cent sums, recombined with an identical IEEE754
# expression tree on both engines — see module docstring. Cents, not
# DECIMAL(18,6): Spark's decimal→double cast is correctly rounded (Java
# BigDecimal) while DuckDB's scaled-int128 path can be 1 ulp off at high
# scales; integer sums < 2^53 convert exactly on both, and the final
# division by an exactly-representable power of ten rounds identically.
OUTLIER_SQL = """
WITH stats AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(CAST(round(value * 100) AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS s1,
         CAST(SUM(CAST(round(value * 100) AS DECIMAL(18,0))
                  * CAST(round(value * 100) AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS s2
  FROM events GROUP BY event_type
), derived AS (
  SELECT event_type, n,
         s1 / CAST(n AS DOUBLE) AS mean,
         sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS sd
  FROM stats
)
SELECT e.event_type, d.n, d.mean, d.sd,
       COUNT(CASE WHEN abs((e.value - d.mean) / d.sd) > 2.5 THEN 1 END) AS n_outliers,
       MAX(abs((e.value - d.mean) / d.sd)) AS max_abs_z
FROM events e JOIN derived d USING (event_type)
GROUP BY e.event_type, d.n, d.mean, d.sd
"""


@query("x_outlier_zscore", oracle=OUTLIER_SQL, tags=("ext", "behavior", "quality"))
def x_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier census (two-pass, broadcast stats).

    Pass 1 reduces events to a 5-row decimal-exact stats table (count,
    Σv, Σv² — map-side combinable); pass 2 broadcasts it back over the
    fact table and counts |z| > 2.5. At 100 TB this is two scans and one
    5-row broadcast — events are never shuffled on a non-key.
    """
    ev = load_tables(spark, sf_dir)["events"].select("event_type", "value")
    cents = F.round(F.col("value") * 100).cast("decimal(18,0)")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(cents).cast("double") / 100.0).alias("s1"),
        (F.sum(cents * cents).cast("double") / 10000.0).alias("s2"),
    )
    nd = F.col("n").cast("double")
    derived = stats.select(
        "event_type",
        "n",
        (F.col("s1") / nd).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / nd)
            / (F.col("n") - F.lit(1)).cast("double")
        ).alias("sd"),
    )
    z = F.abs((F.col("value") - F.col("mean")) / F.col("sd"))
    return (
        ev.join(F.broadcast(derived), "event_type")
        .groupBy("event_type", "n", "mean", "sd")
        .agg(
            F.count(F.when(z > 2.5, 1)).alias("n_outliers"),
            F.max(z).alias("max_abs_z"),
        )
    )


WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT doc_id, source, lang, n_chars,
         ln((CAST(CAST(concat('0x', substr(md5(concat('wsamp', CAST(doc_id AS VARCHAR))), 1, 8))
                   AS BIGINT) AS DOUBLE) + 1) / 4294967296.0)
           / CAST(n_chars AS DOUBLE) AS k
  FROM documents
)
SELECT doc_id, source, lang, n_chars
FROM keyed ORDER BY k DESC, doc_id LIMIT 50
"""


@query(
    "x_weighted_sample",
    oracle=WEIGHTED_SAMPLE_SQL,
    tags=("ext", "sampling", "pipeline"),
)
def x_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis–
    Spirakis A-Res), weight = ``n_chars``.

    Key = ln(u)/w with u a salted-md5 uniform in (0,1] — maximizing it is
    the classic u^(1/w) reservoir draw, but seedable and replayable on any
    engine. The key is a narrow row-local expression; selection is a
    ``TakeOrdered(50)`` (no global sort, no driver collect). The key
    itself is NOT output — see module docstring on libm ulp parity.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("wsamp"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    key = F.log((h.cast("double") + 1) / F.lit(4294967296.0)) / F.col("n_chars").cast(
        "double"
    )
    return (
        docs.select("doc_id", "source", "lang", "n_chars", key.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(50)
        .drop("k")
    )


INTERP_SQL = """
WITH ranked AS (
  SELECT user_id, date_trunc('day', ts) AS day, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), daily AS (
  SELECT user_id, day, value FROM ranked WHERE rn = 1
), bounds AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
), ctx AS (
  SELECT s.user_id, s.day, d.value,
         last_value(d.value IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.day) AS pv,
         last_value(d.day IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.day) AS pd,
         first_value(d.value IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(d.day IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
)
SELECT user_id, day,
       CASE WHEN value IS NOT NULL THEN value
            ELSE pv + (nv - pv)
                 * (CAST(date_diff('day', pd, day) AS DOUBLE)
                    / CAST(date_diff('day', pd, nd) AS DOUBLE))
       END AS value_interp,
       value IS NOT NULL AS is_observed
FROM ctx
"""


@query(
    "x_interpolate_linear", oracle=INTERP_SQL, tags=("ext", "behavior", "timeseries")
)
def x_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with LINEAR interpolation between observations (the
    numeric sibling of x_gap_fill_locf's step fill).

    Same bounded day-spine shape as the LOCF query; two extra bounded
    per-user windows carry the (previous, next) observed (day, value)
    context, and the interpolation weight is one fixed-order IEEE
    division — bit-identical across engines given identical day offsets.
    The spine never extends past a user's first/last observation, so
    every gap has both endpoints (no extrapolation branch).
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "value"
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("value"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            "value",
            F.last("value", ignorenulls=True).over(back).alias("pv"),
            F.last(F.when(F.col("value").isNotNull(), F.col("day")), True)
            .over(back)
            .alias("pd"),
            F.first("value", ignorenulls=True).over(fwd).alias("nv"),
            F.first(F.when(F.col("value").isNotNull(), F.col("day")), True)
            .over(fwd)
            .alias("nd"),
        )
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff("nd", "pd").cast(
        "double"
    )
    return ctx.select(
        "user_id",
        "day",
        F.when(F.col("value").isNotNull(), F.col("value"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("value_interp"),
        F.col("value").isNotNull().alias("is_observed"),
    )


OUTLIER_MAD_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
), m AS (
  SELECT event_type, cents, n,
         MAX(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
             THEN cents END) OVER (PARTITION BY event_type) AS med_cents
  FROM r
), d AS (
  SELECT event_type, n, med_cents, abs(cents - med_cents) AS adev,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(cents - med_cents)) AS drn
  FROM m
), mm AS (
  SELECT event_type, n, med_cents, adev,
         MAX(CASE WHEN drn = CAST(floor((n + 1) / 2.0) AS BIGINT)
             THEN adev END) OVER (PARTITION BY event_type) AS mad_cents
  FROM d
)
SELECT event_type, CAST(n AS BIGINT) AS n, med_cents, mad_cents,
       CAST(COUNT(CASE WHEN adev > 3 * mad_cents THEN 1 END) AS BIGINT)
         AS n_outliers,
       MAX(adev) AS max_adev
FROM mm
GROUP BY event_type, n, med_cents, mad_cents
ORDER BY event_type
"""


@query("x_outlier_mad", oracle=OUTLIER_MAD_SQL, tags=("ext", "behavior", "quality"))
def x_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median absolute deviation
    (lower-median order statistic), flagging |v - median| > 3 * MAD.

    The robust companion to x_outlier_zscore: a few extreme values move
    mean/sd but not median/MAD, so contaminated telemetry doesn't mask its
    own outliers. All arithmetic is integer cents (the exact cross-engine
    pattern); medians are rank-⌈n/2⌉ element SELECTION via row_number +
    windowed MAX(CASE ...), never an interpolating percentile (Spark and
    DuckDB interpolate differently — the known median gotcha).

    Plan: both median selections, the deviation ranking, and the final
    census all ride ONE event_type hash exchange — every window spec and
    the closing aggregate share hash(event_type), which satisfies the
    extended grouping key (event_type, n, med, mad) with zero extra
    exchanges (plan-asserted). At 100 TB the per-type sort is the only
    super-linear term; with |event_type| small, AQE's skew handling or a
    two-level rank (bucketed pre-rank) would be the next step — documented
    trade, exact ranks need the per-key order.
    """
    ev = load_tables(spark, sf_dir)["events"].select("event_type", "value")
    c = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    wp = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(wp.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    med_rank = F.floor((F.col("n") + 1) / F.lit(2.0)).cast("long")
    m = r.select(
        "event_type",
        "cents",
        "n",
        F.max(F.when(F.col("rn") == med_rank, F.col("cents"))).over(wp).alias(
            "med_cents"
        ),
    )
    adev = F.abs(F.col("cents") - F.col("med_cents"))
    d = m.select(
        "event_type",
        "n",
        "med_cents",
        adev.alias("adev"),
        F.row_number().over(wp.orderBy(adev)).alias("drn"),
    )
    mm = d.select(
        "event_type",
        "n",
        "med_cents",
        "adev",
        F.max(F.when(F.col("drn") == med_rank, F.col("adev"))).over(wp).alias(
            "mad_cents"
        ),
    )
    return (
        mm.groupBy("event_type", "n", "med_cents", "mad_cents")
        .agg(
            F.count(
                F.when(F.col("adev") > 3 * F.col("mad_cents"), 1)
            ).alias("n_outliers"),
            F.max("adev").alias("max_adev"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "med_cents",
            "mad_cents",
            "n_outliers",
            "max_adev",
        )
        .orderBy("event_type")
    )


ATTRIBUTION_SQL = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                    THEN event_type END IGNORE NULLS)
           OVER w AS touch_type,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                    THEN ts END IGNORE NULLS)
           OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), attributed AS (
  SELECT CASE WHEN touch_ts IS NOT NULL
                   AND touch_ts >= ts - INTERVAL 7 DAY
              THEN touch_type ELSE 'direct' END AS channel,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM seq WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM attributed GROUP BY channel ORDER BY channel
"""


@query(
    "x_attribution_last_touch",
    oracle=ATTRIBUTION_SQL,
    tags=("ext", "behavior", "attribution"),
)
def x_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the user's
    most recent preceding click/view within 7 days, else 'direct'; revenue
    rolls up per attributed channel.

    The "most recent touch" is a running LOCF over (ts, event_id)-ordered
    rows — an IGNORE-NULLS last over a ROWS frame, so it is exactly
    deterministic (a purchase row itself is never a touch, so including
    the current row is harmless). The 7-day lookback is enforced as a
    filter on the carried touch timestamp, not a frame bound — RANGE
    frames would forfeit the event_id tie-break.

    Plan: ONE user_id exchange for the window; the channel rollup's second
    exchange carries ≤|channels|+1 partially-aggregated rows. At 100 TB
    the state per user is one (type, ts) pair — the same linear shape as
    the funnel/session family.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type").isin("click", "view")
    seq = ev.select(
        "ts",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    channel = F.when(
        F.col("touch_ts").isNotNull()
        & (F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
        F.col("touch_type"),
    ).otherwise(F.lit("direct"))
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            channel.alias("channel"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
        .orderBy("channel")
    )


RFM_SQL = """
WITH per_user AS (
  SELECT user_id,
         MAX(ts) AS last_ts,
         COUNT(*) AS freq,
         SUM(CAST(round(value * 100) AS BIGINT)) AS monetary_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), scored AS (
  SELECT user_id, last_ts, freq, monetary_cents,
         NTILE(4) OVER (ORDER BY last_ts, user_id) AS r_score,
         NTILE(4) OVER (ORDER BY freq, user_id) AS f_score,
         NTILE(4) OVER (ORDER BY monetary_cents, user_id) AS m_score
  FROM per_user
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


# Above this many purchasing users the global-window NTILE path would
# single-partition the per-user frame; the swap-in computes the SAME exact
# quartiles fully distributed (range-partitioned two-phase rank, the
# packing prefix-sum pattern). Tests monkeypatch this to 0 to force the
# distributed path and assert bit-equal output.
RFM_NTILE_GATE = 5_000_000


def _ntile4_distributed(df: DataFrame, order_cols: list[str], out: str) -> DataFrame:
    """Exact global NTILE(4) without a single-partition window.

    Range-partition on the (total) ordering, per-partition row_number,
    O(#parts) driver offsets (operators/packing.py's two-phase prefix-sum
    shape), then Spark's own ntile bucket arithmetic — first (n mod 4)
    buckets hold (n div 4 + 1) rows — applied to the exact global rank.
    Output is bit-identical to F.ntile(4) over the global window."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # Persist the range-partitioned frame: the counts job materializes it
    # once and the rank/bucket pass (plus any CHAINED ntile stage's range
    # sampling) reads the materialization instead of re-executing the
    # upstream lineage — three chained stages otherwise recompute each
    # other O(stages²) (round-13 bench: 6.3 s → ~1 s at sf0.1).
    d = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = d.groupBy("_pid").count().collect()
    acc, base_by_pid = 0, {}
    for r in sorted(counts, key=lambda r: r["_pid"]):
        base_by_pid[r["_pid"]] = acc
        acc += r["count"]
    n = acc
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    size, rem = divmod(n, 4)
    cums = [b * size + min(b, rem) for b in (1, 2, 3)]
    # O(#parts) offsets ride as an array literal indexed by _pid — no
    # broadcast join, no extra exchange.
    base_arr = F.array(
        *[F.lit(base_by_pid.get(p, 0)) for p in range(n_parts)]
    )
    rank = F.element_at(base_arr, F.col("_pid") + 1) + F.row_number().over(w)
    bucket = (
        F.when(rank <= cums[0], 1)
        .when(rank <= cums[1], 2)
        .when(rank <= cums[2], 3)
        .otherwise(4)
    )
    return d.withColumn(out, bucket).drop("_pid")


def _rfm_segments(spark: SparkSession, sf_dir: str, gate: int) -> DataFrame:
    """Shared RFM pipeline; ``gate`` picks the NTILE strategy (see
    x_rfm_segments / x_rfm_segments_dist — bit-equal outputs)."""
    ev = load_tables(spark, sf_dir)["events"]
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
    )
    # Persist BEFORE the gate count so the count action materializes the
    # frame every later pass reuses — the events scan runs exactly once.
    per_user = per_user.persist()
    cnt = per_user.count()
    if cnt > gate:
        scored = per_user
        for cols, name in [
            (["last_ts", "user_id"], "r_score"),
            (["freq", "user_id"], "f_score"),
            (["monetary_cents", "user_id"], "m_score"),
        ]:
            scored = _ntile4_distributed(scored, cols, name)
        scored = scored.select("monetary_cents", "r_score", "f_score", "m_score")
    else:
        scored = per_user.select(
            "monetary_cents",
            F.ntile(4).over(Window.orderBy("last_ts", "user_id")).alias("r_score"),
            F.ntile(4).over(Window.orderBy("freq", "user_id")).alias("f_score"),
            F.ntile(4)
            .over(Window.orderBy("monetary_cents", "user_id"))
            .alias("m_score"),
        )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("monetary_cents").alias("segment_cents"),
        )
        .select(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
            "n_users",
            "segment_cents",
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query("x_rfm_segments", oracle=RFM_SQL, tags=("ext", "behavior", "segmentation"))
def x_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-user recency/frequency/monetary from
    purchase events, quartile-scored with NTILE, rolled up to the 4x4x4
    segment census.

    Determinism: every NTILE ordering carries user_id as the tie-break, so
    quartile membership is exact on both engines (NTILE's
    floor-division bucket formula is engine-identical given a total
    order). Monetary is integer cents.

    Scale: below RFM_NTILE_GATE purchasing users the three NTILEs run as
    global windows over the already-reduced per-user frame (bounded by the
    user population, not event volume). Above the gate the swap-in
    computes the SAME exact quartiles distributed — three range-
    partitioned two-phase ranks (O(#parts) driver offsets each, no
    single-partition stage); the two paths are bit-equal (equality-tested
    locally AND driver-checked via x_rfm_segments_dist, which forces the
    distributed path against the SAME oracle), so the driver hash is
    path-independent.
    """
    return _rfm_segments(spark, sf_dir, RFM_NTILE_GATE)


@query(
    "x_rfm_segments_dist",
    oracle=RFM_SQL,
    tags=("ext", "behavior", "segmentation"),
)
def x_rfm_segments_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x_rfm_segments with the distributed-NTILE swap-in FORCED (gate=0) —
    the path a >{RFM_NTILE_GATE}-user corpus takes, exercised at fixture
    scale under the driver tier against the SAME RFM_SQL oracle (round-13
    verdict item: the swap-in previously had only the local bit-equality
    test). Three range-partitioned two-phase ranks replace the
    single-partition global windows; outputs are bit-equal by
    construction (exact global rank + Spark's own ntile bucket
    arithmetic), so both variants hash-match one oracle."""
    return _rfm_segments(spark, sf_dir, 0)


COHORT_LTV_SQL = """
WITH firsts AS (
  SELECT user_id, ts, value,
         MIN(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort_week
  FROM events
), rev AS (
  SELECT cohort_week,
         CAST(floor(datediff('day', cohort_week, date_trunc('week', ts)) / 7.0)
              AS BIGINT) AS week_offset,
         CAST(round(value * 100) AS BIGINT) AS cents,
         user_id
  FROM firsts
)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM rev
WHERE week_offset <= 8
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@query("x_cohort_ltv", oracle=COHORT_LTV_SQL, tags=("ext", "behavior", "cohort"))
def x_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users cohorted by first-activity week,
    revenue and active users per (cohort_week, week_offset) cell, first 9
    weekly offsets — the standard LTV triangle.

    The cohort assignment is a MIN window over the same user_id
    partitioning the distinct-count aggregate needs, so cohorting and the
    matrix rollup share ONE user-keyed exchange lineage; the final
    (cohort, offset) aggregate is a second, matrix-sized exchange.
    Week offsets are integer day arithmetic on week-truncated timestamps
    (engine-identical), money is integer cents.
    """
    ev = load_tables(spark, sf_dir)["events"].select("user_id", "ts", "value")
    wu = Window.partitionBy("user_id")
    firsts = ev.select(
        "user_id",
        "ts",
        "value",
        F.min(F.date_trunc("week", "ts")).over(wu).alias("cohort_week"),
    )
    week_offset = F.floor(
        F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week")) / 7.0
    ).cast("long")
    rev = firsts.select(
        "cohort_week",
        week_offset.alias("week_offset"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "user_id",
    )
    return (
        rev.filter(F.col("week_offset") <= 8)
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.sum("cents").alias("revenue_cents"),
        )
        .orderBy("cohort_week", "week_offset")
    )


ACTIVE_USERS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), mx AS (
  SELECT MAX(day) AS max_day FROM days
), cover AS (
  SELECT d.user_id, d.day,
         d.day + o * INTERVAL 1 DAY AS cday,
         o
  FROM (SELECT user_id, day, unnest(generate_series(0, 29)) AS o
        FROM days) d, mx
  WHERE d.day + o * INTERVAL 1 DAY <= mx.max_day
)
SELECT cday AS day,
       CAST(COUNT(DISTINCT CASE WHEN o = 0 THEN user_id END) AS BIGINT) AS dau,
       CAST(COUNT(DISTINCT CASE WHEN o <= 6 THEN user_id END) AS BIGINT) AS wau,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
FROM cover
GROUP BY cday
ORDER BY cday
"""


@query(
    "x_active_users_rolling",
    oracle=ACTIVE_USERS_SQL,
    tags=("ext", "behavior", "engagement"),
)
def x_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: exact DAU / trailing-7-day WAU / trailing-30-day
    MAU per day.

    Shape: dedup to (user, active-day) pairs (one exchange, the frame a
    100 TB event log reduces to), EXPLODE each pair onto the ≤30 future
    days it keeps the user "active" for (constant fan-out — the rolling
    window becomes a plain GROUP BY; no per-day self-join, no
    quadratic-in-window-length range join), cap at the corpus max day via
    a broadcast 1-row scalar, then ONE aggregate computes all three
    tiers as conditional distinct counts (offset 0 / ≤6 / ≤29). The
    DuckDB oracle is the same explode written with generate_series — an
    independent formulation of the same closed form.

    The 30× shuffle multiplier is the price of EXACT counts; when
    approximate MAU suffices, the sketch path computes it with NO
    multiplier — store one HLL per (day) and union 30 stored sketches per
    serving-day (x_sketch_distinct_rollup / streaming/sketch_sink.py).
    """
    ev = load_tables(spark, sf_dir)["events"]
    # NULL user_ids must not count: the r13 min-offset rewrite replaced
    # countDistinct(user_id) — which silently skipped NULLs — with plain
    # counts over the per-user aggregate, where a NULL group would
    # inflate every tier by 1 (round-14 advice item). The oracle's
    # COUNT(DISTINCT user_id) formulation skips NULLs; filter explicitly.
    days = (
        ev.filter(F.col("user_id").isNotNull())
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    mx = days.agg(F.max("day").alias("max_day"))
    cover = (
        days.select(
            "user_id",
            "day",
            F.explode(F.sequence(F.lit(0), F.lit(29))).alias("o"),
        )
        .withColumn("cday", F.expr("timestampadd(DAY, o, day)"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("cday") <= F.col("max_day"))
    )
    # Optimization round 13 (guide §2.3 "aggregate before you shuffle"):
    # three conditional countDistincts compiled to an Expand that
    # TRIPLED the exploded rows feeding the exchange, plus the
    # distinct-aggregate machinery. A (day, user) min-offset aggregate is
    # exactly equivalent — a user is distinct-active at offset 0 / ≤6 /
    # ≤29 iff min(o) over that (day, user) is 0 / ≤6 / present — and
    # turns the plan into two plain hash aggregates (the second one
    # day-keyed and tiny). Oracle re-verified (rows+schema+hash) at
    # sf0.01 and sf0.1; bench 1.25 → 0.66 s.
    per_user = cover.groupBy(F.col("cday").alias("day"), "user_id").agg(
        F.min("o").alias("mo")
    )
    return (
        per_user.groupBy("day")
        .agg(
            F.count(F.when(F.col("mo") == 0, 1)).alias("dau"),
            F.count(F.when(F.col("mo") <= 6, 1)).alias("wau"),
            F.count(F.lit(1)).alias("mau"),
        )
        .orderBy("day")
    )


@query(
    "x_active_users_sketch",
    tags=("ext", "behavior", "sketch", "timeseries"),
)
def x_active_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate rolling DAU/WAU/MAU — the no-multiplier path
    x_active_users_rolling's docstring promises for 100 TB: the event log
    shuffles ONCE into |days| HLL sketches (KB register files), and the
    rolling window fans out only those |days|x30 SKETCH rows — a
    broadcast-scale frame — never the events. Per serving day, DAU/WAU/MAU
    are register-max unions of the <=1/7/30 contributing day-sketches;
    associativity makes each union bit-identical to sketching that window
    directly, so accuracy equals a direct HLL estimate (~1.6% typical at
    the default lgK, bound pinned vs the exact query in
    tests/test_round6_properties.py). Rows-only driver row: the estimates
    are engine-internal sketch values DuckDB cannot replay."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    mx = daily.agg(F.max("day").alias("max_day"))
    fan = (
        daily.select(
            "day", "sk",
            F.explode(F.sequence(F.lit(0), F.lit(29))).alias("o"),
        )
        .withColumn("cday", F.expr("timestampadd(DAY, o, day)"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("cday") <= F.col("max_day"))
    )
    return (
        fan.groupBy(F.col("cday").alias("day"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.when(F.col("o") == 0, F.col("sk")))
            ).alias("dau_est"),
            F.hll_sketch_estimate(
                F.hll_union_agg(F.when(F.col("o") <= 6, F.col("sk")))
            ).alias("wau_est"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("mau_est"),
        )
        .orderBy("day")
    )


# Holt recurrence with dyadic α=β=0.5: every step is two exact
# multiplies-by-0.5 plus IEEE additions in a fixed order, so a DuckDB
# recursive CTE replaying the identical op sequence is BIT-EXACT against
# the Arrow-fold Spark path (round-11 promotion from rows-only). The
# textual repetition of the level expression inside the trend update is
# deliberate — identical expression ⇒ identical bits.
HOLT_SQL = """
WITH RECURSIVE s AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), cnt AS (
  SELECT user_id, MAX(rn) AS n FROM s GROUP BY user_id
), h AS (
  SELECT user_id, 1 AS rn, value AS level, CAST(0.0 AS DOUBLE) AS trend
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn,
         0.5 * s.value + 0.5 * (h.level + h.trend) AS level,
         0.5 * ((0.5 * s.value + 0.5 * (h.level + h.trend)) - h.level)
           + 0.5 * h.trend AS trend
  FROM h JOIN s ON s.user_id = h.user_id AND s.rn = h.rn + 1
)
SELECT h.user_id, CAST(cnt.n AS BIGINT) AS n_points, h.level, h.trend,
       h.level + h.trend AS forecast_1
FROM h JOIN cnt USING (user_id) WHERE h.rn = cnt.n
ORDER BY h.user_id
"""


@query(
    "x_holt_trend",
    oracle=HOLT_SQL,
    tags=("ext", "behavior", "timeseries", "iterative"),
)
def x_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt linear trend (double exponential smoothing) over the
    value series — the sequential recurrence the relational surface can't
    unroll (each step consumes the previous step's OUTPUT; contrast
    x_ewma_trailing's fixed-weight form, which lag-unrolls to pure SQL).

    One user_id grouped-map Arrow pass, numpy fold inside the worker,
    two-float state, one output row per user (operators/forecast.py has
    the full scale contract). Full oracle since round 11: the dyadic
    α=β=0.5 recurrence is bit-exact, so a DuckDB recursive CTE replaying
    the identical IEEE op sequence hash-matches; bit-exact numpy replay,
    determinism, and single-point degenerate tests in
    tests/test_forecast.py.
    """
    from ..operators.forecast import holt_linear

    ev = load_tables(spark, sf_dir)["events"]
    return holt_linear(
        ev, key="user_id", ts_col="ts", value_col="value", order_col="event_id"
    ).orderBy("user_id")


SEASONAL_SQL = """
SELECT isodow(ts) AS dow, hour(ts) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
         AS purchases,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("x_seasonal_profile", oracle=SEASONAL_SQL, tags=("ext", "behavior"))
def x_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality heatmap source: activity, purchases, and cents
    volume per (ISO day-of-week, hour-of-day) cell — 168 rows out.

    ONE partial-aggregated hash exchange whose key space is fixed at 168
    cells regardless of event volume (the ideal map-side combine case);
    dow uses the Monday=1 ISO convention, computed with the same integer
    expression the dialect shim uses for ``toDayOfWeek``.
    """
    ev = load_tables(spark, sf_dir)["events"].select("ts", "event_type", "value")
    dow = (((F.dayofweek("ts") + 5) % 7) + 1).cast("long")
    return (
        ev.groupBy(dow.alias("dow"), F.hour("ts").cast("long").alias("hod"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "purchases"
            ),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .orderBy("dow", "hod")
    )
