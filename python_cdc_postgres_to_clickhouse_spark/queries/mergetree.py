"""MergeTree-family destination semantics + event-sequence analytics.

The reference provisions ClickHouse as the CDC destination (reference
docker-compose.yml:155-174) and leaves the warehouse-side behaviors to the
MergeTree engine family and ClickHouse's sequence functions:

- **CollapsingMergeTree**: state rows carry ``sign = +1`` and cancel rows
  ``sign = -1``; reading collapses each key with ``SUM(sign)`` /
  ``SUM(metric * sign) ... HAVING SUM(sign) > 0``.
- **windowFunnel(window)(cond1, cond2, ...)**: the max funnel depth a user
  reaches with all steps inside a sliding time window from the first step.
- **Session path analysis** (``neighbor`` / window functions): top event
  transitions within a session gap.

These queries are that surface, native in Spark over the driver's ``events``
table (`user_id` keys, `ts`/`event_id` total order — same stand-in mapping
as queries/cdc_queries.py).

Scale notes (100 TB):
- The collapsing read is ONE hash aggregate on the key — map-side partial
  sums of ``sign``/``sign*value`` combine associatively, exactly like the
  MergeTree background merge it models.
- windowFunnel groups a user's (bounded) step events into one sorted array
  and folds it with a linear DP — the same per-user memory model ClickHouse
  uses. No self-join: compute is O(events), never O(events²)
  (the EXISTS-chain formulation is kept only as the DuckDB oracle, where
  the fixture is small).
- Session paths is one window shuffle on ``user_id`` (lead over the user's
  timeline — a session id is deliberately never materialized: a transition
  is any consecutive pair with gap ≤ the session gap, so a second
  (user, session) shuffle would be pure waste) + one agg + TakeOrdered(k).

Float determinism: the collapsing balance is an exact DECIMAL(18,6) sum
surfaced as DOUBLE (see queries/_exprs.py); the funnel and path queries are
integer/count-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables
from ._exprs import DEC

COLLAPSING_SQL = """
SELECT user_id, net_rows, n_deliveries, balance FROM (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) AS BIGINT)
           AS net_rows,
         COUNT(*) AS n_deliveries,
         CAST(SUM(CASE WHEN event_type = 'error'
                       THEN -CAST(value AS DECIMAL(18,6))
                       ELSE CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
           AS balance
  FROM events
  GROUP BY user_id) t
WHERE net_rows > 0
"""


@query("cdc_collapsing_state", oracle=COLLAPSING_SQL, tags=("cdc", "mergetree"))
def cdc_collapsing_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree read semantics: signed rows collapsed per key.

    ``event_type = 'error'`` stands in for the cancel rows (``sign = -1``);
    everything else is a state row (``sign = +1``). The live view is the
    classic ClickHouse collapsing read: ``SUM(sign)`` as the net row count,
    ``SUM(sign * value)`` as the net balance, keys with non-positive net
    dropped. The reference's provisioned destination would run exactly this
    against a CollapsingMergeTree table (docker-compose.yml:155-174).

    One hash aggregate on the key; partial aggregation IS the background
    merge. Decimal-exact sum → bit-identical DOUBLE on both engines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    sign_val = F.when(
        F.col("event_type") == "error", -F.col("value").cast(DEC)
    ).otherwise(F.col("value").cast(DEC))
    sign = F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(sign).alias("net_rows"),
            F.count(F.lit(1)).alias("n_deliveries"),
            F.sum(sign_val).cast("double").alias("balance"),
        )
        .filter(F.col("net_rows") > 0)
    )


# EXISTS-chain oracle: depth ≥ 2 iff some view follows a signup within the
# window; depth 3 iff a purchase follows that view inside the SAME window
# (anchored at the signup). Row-value comparisons give the strict
# (ts, event_id) event order the Spark fold uses.
WINDOW_FUNNEL_SQL = """
WITH s AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'),
d2 AS (
  SELECT DISTINCT s.user_id
  FROM s JOIN events v
    ON v.user_id = s.user_id AND v.event_type = 'view'
   AND (v.ts, v.event_id) > (s.ts, s.event_id)
   AND v.ts <= s.ts + INTERVAL 1 HOUR
),
d3 AS (
  SELECT DISTINCT s.user_id
  FROM s
  JOIN events v
    ON v.user_id = s.user_id AND v.event_type = 'view'
   AND (v.ts, v.event_id) > (s.ts, s.event_id)
   AND v.ts <= s.ts + INTERVAL 1 HOUR
  JOIN events p
    ON p.user_id = s.user_id AND p.event_type = 'purchase'
   AND (p.ts, p.event_id) > (v.ts, v.event_id)
   AND p.ts <= s.ts + INTERVAL 1 HOUR
)
SELECT depth, COUNT(*) AS n_users FROM (
  SELECT u.user_id,
         CASE WHEN u.user_id IN (SELECT user_id FROM d3) THEN 3
              WHEN u.user_id IN (SELECT user_id FROM d2) THEN 2
              ELSE 1 END AS depth
  FROM (SELECT DISTINCT user_id FROM s) u) t
GROUP BY depth
"""

_FUNNEL_WINDOW_US = 3_600_000_000  # 1 hour, µs


@query("x_window_funnel", oracle=WINDOW_FUNNEL_SQL, tags=("behavior", "mergetree"))
def x_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(3600)('signup','view','purchase')``: per
    user, the deepest signup → view → purchase chain whose every step falls
    within 1 hour of the chain's signup; output is users per max depth.

    Unlike x_funnel_steps (unbounded time, queries/behavior.py), the window
    constraint anchors at the FIRST step — ClickHouse's windowFunnel
    contract. Spark side runs ClickHouse's actual algorithm: per user, sort
    the (bounded) step events once and fold linearly, keeping per depth the
    LATEST chain-start timestamp (later starts are strictly easier to
    extend, so max is lossless). Compute is O(user's events) — the
    EXISTS-chain form is kept only as the DuckDB oracle.

    One shuffle on user_id (the groupBy); the fold is a JVM higher-order
    function over the sorted array — no UDF, no self-join, state = 2
    timestamps + a depth per user.
    """
    ev = load_tables(spark, sf_dir)["events"]
    steps = ev.filter(F.col("event_type").isin("signup", "view", "purchase")).select(
        "user_id",
        F.unix_micros("ts").alias("tus"),
        "event_id",
        "event_type",
    )
    seq = steps.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("tus", "event_id", "event_type"))).alias(
            "seq"
        )
    )
    w = F.lit(_FUNNEL_WINDOW_US)
    # State: s1/s2 = latest chain-start (signup tus) achieving depth 1/2;
    # d = max depth reached. greatest() skips nulls, so "no chain yet" and
    # "new candidate" merge in one expression.
    init = F.struct(
        F.lit(None).cast("long").alias("s1"),
        F.lit(None).cast("long").alias("s2"),
        F.lit(0).alias("d"),
    )

    def step(acc, e):
        is_signup = e["event_type"] == F.lit("signup")
        view_ok = (
            (e["event_type"] == F.lit("view"))
            & acc["s1"].isNotNull()
            & (e["tus"] <= acc["s1"] + w)
        )
        purchase_ok = (
            (e["event_type"] == F.lit("purchase"))
            & acc["s2"].isNotNull()
            & (e["tus"] <= acc["s2"] + w)
        )
        s1 = F.when(is_signup, F.greatest(acc["s1"], e["tus"])).otherwise(acc["s1"])
        s2 = F.when(view_ok, F.greatest(acc["s2"], acc["s1"])).otherwise(acc["s2"])
        d = F.greatest(
            acc["d"],
            F.when(purchase_ok, F.lit(3))
            .when(view_ok, F.lit(2))
            .when(is_signup, F.lit(1))
            .otherwise(F.lit(0)),
        )
        return F.struct(s1.alias("s1"), s2.alias("s2"), d.alias("d"))

    depth = F.aggregate(F.col("seq"), init, step)["d"]
    return (
        seq.select("user_id", depth.alias("depth"))
        .filter(F.col("depth") >= 1)
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SESSION_PATHS_SQL = """
SELECT src, dst, n_transitions FROM (
  SELECT event_type AS src, next_type AS dst, COUNT(*) AS n_transitions
  FROM (
    SELECT event_type,
           LEAD(event_type) OVER w AS next_type,
           LEAD(ts) OVER w AS next_ts,
           ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) t
  WHERE next_type IS NOT NULL AND next_ts <= ts + INTERVAL 30 MINUTE
  GROUP BY event_type, next_type) g
ORDER BY n_transitions DESC, src, dst
LIMIT 20
"""


@query("x_session_paths", oracle=SESSION_PATHS_SQL, tags=("behavior", "mergetree"))
def x_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top in-session event transitions (Markov bigrams): consecutive event
    pairs on a user's timeline with gap ≤ 30 min, counted and top-20 ranked —
    the ClickHouse ``neighbor()``/window path-analysis pattern the reference
    leaves to the warehouse.

    A session id is deliberately never materialized: a transition exists iff
    two events are adjacent for the user AND within the session gap, so one
    ``lead`` window on ``user_id`` suffices — sessionizing first would add a
    second (user, session) shuffle for the same answer. One window shuffle +
    one small agg + TakeOrdered(20); no global sort.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1_800_000_000  # 30 min
    pairs = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("gap"),
    ).filter(F.col("dst").isNotNull() & (F.col("gap") <= gap_us))
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.desc("n_transitions"), "src", "dst")
        .limit(20)
    )


TWA_SQL = """
SELECT user_id, sum_wv, sum_dur_us, twa FROM (
  SELECT user_id,
         CAST(SUM(cents * dur_us) AS BIGINT) AS sum_wv,
         CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us,
         CAST(SUM(cents * dur_us) AS DOUBLE)
           / CAST(SUM(dur_us) AS DOUBLE) / 100.0 AS twa
  FROM (
    SELECT user_id,
           CAST(round(value * 100) AS BIGINT) AS cents,
           epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             - epoch_us(ts) AS dur_us
    FROM events
  ) t
  WHERE dur_us IS NOT NULL AND dur_us > 0
  GROUP BY user_id) g
"""


@query("x_time_weighted_avg", oracle=TWA_SQL, tags=("behavior", "timeseries"))
def x_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user: each reading holds until
    the next one, so its weight is the µs until the user's next event — the
    TSDB/ClickHouse ``avgWeighted(value, dt)`` pattern for irregularly
    sampled series (a last-value-holds step function, the same LOCF reading
    x_gap_fill_locf materializes day-by-day).

    One lead window on the user timeline (single user_id shuffle) + one hash
    aggregate on the same key. Zero-duration samples drop (they hold for no
    time); the last reading has no successor and drops likewise.

    Float determinism: value is cents-exact (≤2dp) → ``round(value*100)``
    is integer on both engines; weighted sums are pure int64 arithmetic
    (bounded: max_cents · observation_window_µs ≈ 2.6e17 ≪ 2^63). The
    sums surface as BIGINT (hash-exact), and the served ratio divides
    their doubles — an int64→float64 cast is round-to-nearest on both
    engines, so even sums past 2^53 produce the identical double and the
    division is then bit-identical IEEE754.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    cents = F.round(F.col("value") * 100).cast("long")
    t = ev.select(
        "user_id", cents.alias("cents"), dur.alias("dur_us")
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    return t.groupBy("user_id").agg(
        F.sum(F.col("cents") * F.col("dur_us")).alias("sum_wv"),
        F.sum("dur_us").alias("sum_dur_us"),
        (
            F.sum(F.col("cents") * F.col("dur_us")).cast("double")
            / F.sum("dur_us").cast("double")
            / F.lit(100.0)
        ).alias("twa"),
    )


SESSION_STATS_SQL = """
SELECT user_id,
       CAST(COUNT(DISTINCT sess_id) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(sess_events) AS BIGINT) AS longest_session_events,
       CAST(SUM(dur_contrib) AS BIGINT) AS total_in_session_dur_us
FROM (
  SELECT user_id, sess_id,
         COUNT(*) OVER (PARTITION BY user_id, sess_id) AS sess_events,
         COALESCE(
           CASE WHEN LEAD(new_sess) OVER w = 0
                THEN epoch_us(LEAD(ts) OVER w) - epoch_us(ts) END, 0)
           AS dur_contrib
  FROM (
    SELECT user_id, ts, event_id, new_sess,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))
                       <= 1800000000
                  THEN 0 ELSE 1 END AS new_sess
      FROM events) a) b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
) s
GROUP BY user_id
"""


@query("x_session_stats", oracle=SESSION_STATS_SQL, tags=("behavior", "timeseries"))
def x_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sessionization (30-min inactivity gap) with per-user session
    statistics: session count, events, longest session, total in-session
    dwell time — the batch analog of T4's event-time session windows,
    materialized with the classic gap-flag + running-sum session id.

    Plan shape: every window partitions on ``user_id`` (the sess_id suffix
    on the count window is a sort-extension of the same shuffle — one
    exchange feeds all three window specs), then one per-user aggregate.
    Dwell time sums consecutive-pair gaps *within* a session, so a
    one-event session contributes 0 — durations and counts stay pure
    integers (no float hashing concerns).
    """
    ev = load_tables(spark, sf_dir)["events"]
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wo))
    new_sess = F.when(gap <= 1_800_000_000, F.lit(0)).otherwise(F.lit(1))
    a = ev.select("user_id", "ts", "event_id", new_sess.alias("new_sess"))
    b = a.withColumn(
        "sess_id",
        F.sum("new_sess").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "sess_id")
    dur_contrib = F.coalesce(
        F.when(
            F.lead("new_sess").over(wo) == 0,
            F.unix_micros(F.lead("ts").over(wo)) - F.unix_micros("ts"),
        ),
        F.lit(0),
    )
    s = b.select(
        "user_id",
        "sess_id",
        F.count(F.lit(1)).over(ws).alias("sess_events"),
        dur_contrib.alias("dur_contrib"),
    )
    return s.groupBy("user_id").agg(
        F.countDistinct("sess_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("sess_events").alias("longest_session_events"),
        F.sum("dur_contrib").alias("total_in_session_dur_us"),
    )


COUNTER_RATE_SQL = """
SELECT user_id, n_samples, n_resets, increase_cents, rate_cps FROM (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resets,
         CAST(SUM(CASE WHEN delta IS NULL THEN 0
                       WHEN delta >= 0 THEN delta
                       ELSE cents END) AS BIGINT) AS increase_cents,
         CAST(SUM(CASE WHEN delta IS NULL THEN 0
                       WHEN delta >= 0 THEN delta
                       ELSE cents END) AS DOUBLE)
           / (CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE) / 1e6)
           AS rate_cps
  FROM (
    SELECT user_id, ts, cents,
           cents - LAG(cents) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta
    FROM (SELECT user_id, ts, event_id,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events) c) t
  GROUP BY user_id
  HAVING COUNT(*) >= 2 AND epoch_us(MAX(ts)) > epoch_us(MIN(ts))) g
"""


@query("x_counter_rate", oracle=COUNTER_RATE_SQL, tags=("behavior", "timeseries"))
def x_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter rate with reset detection — the ClickHouse
    ``deltaSumTimestamp`` / PromQL ``increase()``/``rate()`` reading of a
    gauge series: per user, sum the positive sample-to-sample deltas; a
    negative delta is a counter reset, contributing the post-reset value
    (the counter restarted from zero and climbed back). Rate divides the
    total increase by the observed time span.

    One lag window on the user timeline + one hash aggregate on the SAME
    key — the aggregate's exchange is satisfied by the window's existing
    hash(user_id) partitioning, so sessionizing 100 TB of samples costs
    exactly one shuffle of four narrow columns.

    Float determinism: samples are cents-exact (≤2dp) so deltas and
    increases are pure int64; the served rate divides two doubles cast
    from int64 (round-to-nearest on both engines) — bit-identical IEEE754.
    Users with one sample or a zero time-span have no defined rate and drop.
    """
    ev = load_tables(spark, sf_dir)["events"]
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    t = ev.select("user_id", "ts", "event_id", cents.alias("cents"))
    delta = F.col("cents") - F.lag("cents").over(wo)
    d = t.select("user_id", "ts", delta.alias("delta"), "cents")
    inc = F.when(F.col("delta").isNull(), 0).when(
        F.col("delta") >= 0, F.col("delta")
    ).otherwise(F.col("cents"))
    span_us = F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_resets"),
            F.sum(inc).alias("increase_cents"),
            (
                F.sum(inc).cast("double")
                / (span_us.cast("double") / F.lit(1e6))
            ).alias("rate_cps"),
            span_us.alias("_span_us"),
        )
        .filter((F.col("n_samples") >= 2) & (F.col("_span_us") > 0))
        .drop("_span_us")
    )


_DOWNSAMPLE_HOT_DAYS = 7

DOWNSAMPLE_TIERS_SQL = f"""
WITH cutoff AS (
  SELECT max(ts) - INTERVAL {_DOWNSAMPLE_HOT_DAYS} DAY AS hot_from FROM events)
SELECT resolution, bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (
  SELECT CASE WHEN ts >= (SELECT hot_from FROM cutoff) THEN '1h'
              ELSE '1d' END AS resolution,
         CASE WHEN ts >= (SELECT hot_from FROM cutoff)
              THEN date_trunc('hour', ts)
              ELSE date_trunc('day', ts) END AS bucket_ts,
         value
  FROM events) t
GROUP BY resolution, bucket_ts
"""


@query(
    "x_downsample_tiers", oracle=DOWNSAMPLE_TIERS_SQL, tags=("timeseries", "mergetree")
)
def x_downsample_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Age-tiered downsampling — the GraphiteMergeTree / TSDB retention
    policy read: samples younger than {_DOWNSAMPLE_HOT_DAYS} days (relative
    to the stream's watermark, max ts) roll up at hour resolution, older
    ones at day resolution. The served table is what a retention-tiered
    store physically keeps: recent data fine-grained, history coarse.

    The watermark is a 1-row aggregate cross-broadcast onto the scan (the
    Q15 scalar pattern — never an unpartitioned window); tier assignment is
    then a narrow CASE, and the whole query is ONE hash aggregate with
    map-side partials. As a retention job at 100 TB, the CASE keys the
    rewrite so only old partitions are rewritten — partition pruning on
    ingestion date bounds the touched bytes.

    Decimal-exact sums → bit-identical DOUBLE on both engines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    cutoff = ev.agg(
        (
            F.max("ts") - F.expr(f"INTERVAL {_DOWNSAMPLE_HOT_DAYS} DAYS")
        ).alias("hot_from")
    )
    hot = F.col("ts") >= F.col("hot_from")
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .select(
            F.when(hot, F.lit("1h")).otherwise(F.lit("1d")).alias("resolution"),
            F.when(hot, F.date_trunc("hour", "ts"))
            .otherwise(F.date_trunc("day", "ts"))
            .alias("bucket_ts"),
            "value",
        )
        .groupBy("resolution", "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


SEQUENCE_COUNT_SQL = """
SELECT user_id, n_signups, n_purchases, n_matched FROM (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_signups,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              - GREATEST(MAX(excess), 0) AS BIGINT) AS n_matched
  FROM (
    SELECT user_id, event_type,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS excess
    FROM events WHERE event_type IN ('signup', 'purchase')) t
  GROUP BY user_id) g
WHERE n_matched > 0
"""


@query("x_sequence_count", oracle=SEQUENCE_COUNT_SQL, tags=("behavior", "mergetree"))
def x_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy signup → purchase PAIRING: per user, how many DISTINCT
    chains complete, with each signup redeeming at most one later
    purchase and vice versa (parenthesis matching on the event timeline).
    Deliberately a different contract from ClickHouse's ``sequenceCount``
    (non-overlapping resume-after-match scan — [s,s,p,p] counts 1 there,
    2 here); the dialect translates ``sequenceCount`` to CH's exact scan,
    while this query keeps the pairing count a funnel analyst usually
    wants (how many redemptions, not how many scan passes).

    The count has a closed form that needs no iteration and no join:
    treating purchases as '+1' and signups as '-1',

        matched = #purchases − max(0, max running excess of purchases)

    — the running maximum counts exactly the purchases that arrive with no
    open signup to redeem (the greedy algorithm's unmatched set). One
    running-sum window + one aggregate on the SAME user_id key: a single
    exchange, O(events) compute, state-free — contrast the naive
    sequential-scan UDF or an O(n²) pairing join.

    Pure integer arithmetic — bit-identical on both engines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    steps = ev.filter(F.col("event_type").isin("signup", "purchase")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    wo = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_b = F.when(F.col("event_type") == "purchase", 1).otherwise(-1)
    t = steps.withColumn("excess", F.sum(is_b).over(wo))
    return (
        t.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            .cast("long")
            .alias("n_signups"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
            (
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
                - F.greatest(F.max("excess"), F.lit(0))
            )
            .cast("long")
            .alias("n_matched"),
        )
        .filter(F.col("n_matched") > 0)
    )


# ---------------------------------------------------------------------------
# Map-combinator aggregation: ClickHouse sumMap / minMap / maxMap. Metric
# dictionaries (per-status counters, per-type gauges) are stored as map
# columns and aggregated KEY-WISE per group; the reference's destination
# exposes exactly this combinator family for such columns. Rendered as
# deterministic "k:v,..." strings so the oracle hash covers the map values
# without depending on either engine's native map ordering/encoding.
# ---------------------------------------------------------------------------

MAP_COMBINATORS_SQL = """
WITH ev AS (
  SELECT user_id % 10 AS ugrp, event_type AS k,
         CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT) AS v
  FROM events),
per_key AS (
  SELECT ugrp, k, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM ev GROUP BY ugrp, k)
SELECT ugrp,
       string_agg(k || ':' || s,  ',' ORDER BY k) AS sum_map,
       string_agg(k || ':' || mn, ',' ORDER BY k) AS min_map,
       string_agg(k || ':' || mx, ',' ORDER BY k) AS max_map
FROM per_key GROUP BY ugrp
"""


def _render_map(col: str) -> F.Column:
    """map<string,long> -> canonical "k:v,..." string, entries sorted by key."""
    return F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.map_entries(F.col(col))),
            lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
        ),
    ).alias(col)


@query("a_map_combinators", oracle=MAP_COMBINATORS_SQL, tags=("agg", "mergetree", "map"))
def a_map_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse Map-combinator family (sumMap/minMap/maxMap) over a
    metric-dictionary column: per user-group, aggregate map values key-wise
    and emit one map per combinator, rendered canonically for the oracle.

    Uses operators.mapagg.map_agg_multi: ONE narrow map explode feeds ONE
    (group, key) hash aggregate computing all three combinators side by
    side (map-side partials — the shuffle carries one (sum,min,max) triple
    per (task, group, key), the exact state the ClickHouse combinator
    keeps), then ONE group-level reassembly; the combinators share every
    exchange instead of one pipeline each. Values are exact integer cents
    (lossless DECIMAL route), so sums are order-independent and the
    rendered strings are engine-identical.
    """
    from ..operators.mapagg import map_agg_multi

    ev = load_tables(spark, sf_dir)["events"]
    rows = ev.select(
        (F.col("user_id") % 10).alias("ugrp"),
        F.create_map(
            F.col("event_type"),
            (F.col("value").cast(DEC) * 100).cast("long"),
        ).alias("m"),
    )
    out = map_agg_multi(rows, ["ugrp"], "m", aggs=("sum", "min", "max"))
    return out.select(
        "ugrp",
        _render_map("sum_map"),
        _render_map("min_map"),
        _render_map("max_map"),
    )


# ---------------------------------------------------------------------------
# sequenceMatch: the third of ClickHouse's sequence-function trio
# (windowFunnel above bounds chains by a time window; sequenceCount counts
# greedy non-overlapping chains; sequenceMatch answers the boolean "does the
# pattern occur as a subsequence at all"). Pattern '(?1).*(?2)[.*(?3)]' with
# no time constraint — pure event-order subsequence matching.
# ---------------------------------------------------------------------------

SEQUENCE_MATCH_SQL = """
WITH m2 AS (
  SELECT DISTINCT a.user_id
  FROM events a JOIN events b
    ON b.user_id = a.user_id
   AND a.event_type = 'signup' AND b.event_type = 'purchase'
   AND (b.ts, b.event_id) > (a.ts, a.event_id)),
m3 AS (
  SELECT DISTINCT a.user_id
  FROM events a
  JOIN events b
    ON b.user_id = a.user_id AND b.event_type = 'click'
   AND (b.ts, b.event_id) > (a.ts, a.event_id)
  JOIN events c
    ON c.user_id = a.user_id AND c.event_type = 'purchase'
   AND (c.ts, c.event_id) > (b.ts, b.event_id)
  WHERE a.event_type = 'signup')
SELECT 'signup.*purchase' AS pattern,
       CAST((SELECT COUNT(*) FROM m2) AS BIGINT) AS n_matched
UNION ALL
SELECT 'signup.*click.*purchase' AS pattern,
       CAST((SELECT COUNT(*) FROM m3) AS BIGINT) AS n_matched
"""


@query("x_sequence_match", oracle=SEQUENCE_MATCH_SQL, tags=("behavior", "mergetree"))
def x_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)')`` / ``('(?1).*(?2).*(?3)')``:
    per user, does the event stream contain the step pattern as an ordered
    subsequence (no time bound)? Output: users matched per pattern.

    Spark side runs the greedy linear scan (earliest-first subsequence
    matching is exact for existence): per user, ONE sorted array of the
    step events folded by a JVM higher-order function whose state is just
    the depth reached per pattern — both patterns share the same sorted
    array and the same fold pass. One shuffle on user_id, compute
    O(user's step events); the EXISTS-chain form (which a hash join would
    evaluate as a per-user cross product) is kept only as the DuckDB
    oracle. The count rollup is a partial-aggregated global sum.
    """
    ev = load_tables(spark, sf_dir)["events"]
    steps = ev.filter(
        F.col("event_type").isin("signup", "click", "purchase")
    ).select("user_id", F.unix_micros("ts").alias("tus"), "event_id", "event_type")
    seq = steps.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("tus", "event_id", "event_type"))).alias(
            "seq"
        )
    )
    # Shared fold: d2 tracks 'signup then purchase', d3 tracks
    # 'signup then click then purchase'. Greedy depth advance on the next
    # wanted type; depth never retreats, so reaching the end == match.
    init = F.struct(F.lit(0).alias("d2"), F.lit(0).alias("d3"))

    def step(acc, e):
        t = e["event_type"]
        d2 = F.when(
            (acc["d2"] == 0) & (t == F.lit("signup")), F.lit(1)
        ).when(
            (acc["d2"] == 1) & (t == F.lit("purchase")), F.lit(2)
        ).otherwise(acc["d2"])
        d3 = F.when(
            (acc["d3"] == 0) & (t == F.lit("signup")), F.lit(1)
        ).when(
            (acc["d3"] == 1) & (t == F.lit("click")), F.lit(2)
        ).when(
            (acc["d3"] == 2) & (t == F.lit("purchase")), F.lit(3)
        ).otherwise(acc["d3"])
        return F.struct(d2.alias("d2"), d3.alias("d3"))

    st = F.aggregate(F.col("seq"), init, step)
    flags = seq.select(
        (st["d2"] == 2).cast("long").alias("m2"),
        (st["d3"] == 3).cast("long").alias("m3"),
    )
    tot = flags.agg(
        F.sum("m2").alias("n2"), F.sum("m3").alias("n3")
    )
    return tot.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("signup.*purchase").alias("pattern"),
                    F.col("n2").alias("n_matched"),
                ),
                F.struct(
                    F.lit("signup.*click.*purchase").alias("pattern"),
                    F.col("n3").alias("n_matched"),
                ),
            )
        ).alias("r")
    ).select("r.pattern", "r.n_matched")


# ---------------------------------------------------------------------------
# ClickHouse retention(cond1, ..., condN): per-user condition flags where
# flag k (k > 1) counts only when cond1 also held, then summed over users.
# Completes the behavioral-aggregate trio next to windowFunnel and
# sequenceMatch above. Conditions here are weekly activity windows — the
# canonical retention() example shape.
# ---------------------------------------------------------------------------

RETENTION_WEEKS = (
    ("2024-01-01", "2024-01-08"),
    ("2024-01-08", "2024-01-15"),
    ("2024-01-15", "2024-01-22"),
    ("2024-01-22", "2024-01-29"),
)

RETENTION_FLAGS_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         {", ".join(
             f"MAX(CASE WHEN ts >= TIMESTAMP '{lo} 00:00:00'"
             f" AND ts < TIMESTAMP '{hi} 00:00:00' THEN 1 ELSE 0 END) AS c{i + 1}"
             for i, (lo, hi) in enumerate(RETENTION_WEEKS)
         )}
  FROM events GROUP BY user_id
)
SELECT CAST(SUM(c1) AS BIGINT) AS r1,
       {", ".join(
           f"CAST(SUM(c1 * c{k}) AS BIGINT) AS r{k}"
           for k in range(2, len(RETENTION_WEEKS) + 1)
       )},
       {", ".join(
           f"CAST(SUM(c1 * c{k}) AS DOUBLE) / CAST(SUM(c1) AS DOUBLE) AS ratio{k}"
           for k in range(2, len(RETENTION_WEEKS) + 1)
       )}
FROM per_user
"""


@query("x_retention_flags", oracle=RETENTION_FLAGS_SQL, tags=("behavior", "mergetree"))
def x_retention_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(cond1..cond4)`` analog: per-user boolean
    flags for four weekly activity windows, where flag k (k>1) counts only
    if the user also satisfied cond1, summed over users — week-over-week
    retention counts plus ratios off one aggregate.

    Scale shape: ONE hash aggregate on ``user_id`` with map-side partials
    (each partial is 4 bits per user — conditional MAX combines
    associatively, exactly the ClickHouse retention() combinator state),
    then a 1-row final aggregate. No joins, no windows, no second pass —
    per-user state is constant-size regardless of event count, so the
    shuffle carries |users| 4-flag rows at any corpus size. The weekly
    predicates fold to timestamp-range filters evaluated in the scan
    stage. Float determinism: ratios are single fixed-order divisions of
    exact integer counts."""
    t = load_tables(spark, sf_dir)
    conds = [
        F.max(
            F.when(
                (F.col("ts") >= F.lit(f"{lo} 00:00:00").cast("timestamp"))
                & (F.col("ts") < F.lit(f"{hi} 00:00:00").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias(f"c{i + 1}")
        for i, (lo, hi) in enumerate(RETENTION_WEEKS)
    ]
    per_user = t["events"].groupBy("user_id").agg(*conds)
    n = len(RETENTION_WEEKS)
    aggs = [F.sum("c1").cast("long").alias("r1")] + [
        F.sum(F.col("c1") * F.col(f"c{k}")).cast("long").alias(f"r{k}")
        for k in range(2, n + 1)
    ]
    out = per_user.agg(*aggs)
    ratios = [
        (F.col(f"r{k}").cast("double") / F.col("r1").cast("double")).alias(f"ratio{k}")
        for k in range(2, n + 1)
    ]
    return out.select("r1", *[f"r{k}" for k in range(2, n + 1)], *ratios)


PROJECTION_ROUTE_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / COUNT(*)
           AS avg_cents
FROM events
GROUP BY 1
ORDER BY 1
"""


@query("x_projection_route", oracle=PROJECTION_ROUTE_SQL,
       tags=("mergetree", "layout", "agg"))
def x_projection_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MergeTree PROJECTION read path (`operators/projection.py`): a
    (event_type, day)-keyed pre-aggregate answers the coarser per-type
    report by re-merging its states — counts re-merge by sum, sums by sum,
    min/max by themselves, and avg derives from the (sum, count) state
    pair, exactly ClickHouse's AggregateFunction decomposition. Declared
    in-memory (build + answer = a two-level partial-aggregated hash
    aggregate, no extra exchange class); the materialized path — parquet
    projection scanned INSTEAD of the base, incremental `updated()`
    maintenance, fall-back routing — is pinned in tests/test_projection.py.
    Scale: a routed query reads |distinct keys| rows however large the
    base; maintenance is one map-side-combined exchange per chunk."""
    from ..operators.projection import build_projection

    events = load_tables(spark, sf_dir)["events"]
    proj = build_projection(
        events,
        keys={"event_type": F.col("event_type"), "day": F.to_date("ts")},
        measures={
            "n": ("count", F.lit(1)),
            "cents": ("sum", F.round(F.col("value") * 100).cast("bigint")),
            "mn": ("min", F.col("value")),
            "mx": ("max", F.col("value")),
        },
    )
    return proj.answer(
        ["event_type"],
        {
            "n_events": ("count", "n"),
            "total_cents": ("sum", "cents"),
            "min_value": ("min", "mn"),
            "max_value": ("max", "mx"),
            "avg_cents": ("avg", "cents", "n"),
        },
    ).orderBy("event_type")


# strict_order oracle: a depth-d chain's consecutive steps must be ADJACENT
# in the user's full (ts, event_id) timeline — NOT EXISTS any event of any
# type strictly between them. Window still anchors at the chain's signup.
WINDOW_FUNNEL_STRICT_SQL = """
WITH s AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'),
d2 AS (
  SELECT DISTINCT s.user_id
  FROM s JOIN events v
    ON v.user_id = s.user_id AND v.event_type = 'view'
   AND (v.ts, v.event_id) > (s.ts, s.event_id)
   AND v.ts <= s.ts + INTERVAL 1 HOUR
  WHERE NOT EXISTS (
    SELECT 1 FROM events x
    WHERE x.user_id = s.user_id
      AND (x.ts, x.event_id) > (s.ts, s.event_id)
      AND (x.ts, x.event_id) < (v.ts, v.event_id))
),
d3 AS (
  SELECT DISTINCT s.user_id
  FROM s
  JOIN events v
    ON v.user_id = s.user_id AND v.event_type = 'view'
   AND (v.ts, v.event_id) > (s.ts, s.event_id)
   AND v.ts <= s.ts + INTERVAL 1 HOUR
  JOIN events p
    ON p.user_id = s.user_id AND p.event_type = 'purchase'
   AND (p.ts, p.event_id) > (v.ts, v.event_id)
   AND p.ts <= s.ts + INTERVAL 1 HOUR
  WHERE NOT EXISTS (
    SELECT 1 FROM events x
    WHERE x.user_id = s.user_id
      AND (x.ts, x.event_id) > (s.ts, s.event_id)
      AND (x.ts, x.event_id) < (v.ts, v.event_id))
    AND NOT EXISTS (
    SELECT 1 FROM events y
    WHERE y.user_id = s.user_id
      AND (y.ts, y.event_id) > (v.ts, v.event_id)
      AND (y.ts, y.event_id) < (p.ts, p.event_id))
)
SELECT depth, COUNT(*) AS n_users FROM (
  SELECT u.user_id,
         CASE WHEN u.user_id IN (SELECT user_id FROM d3) THEN 3
              WHEN u.user_id IN (SELECT user_id FROM d2) THEN 2
              ELSE 1 END AS depth
  FROM (SELECT DISTINCT user_id FROM s) u) t
GROUP BY depth
"""


@query(
    "x_window_funnel_strict",
    oracle=WINDOW_FUNNEL_STRICT_SQL,
    tags=("behavior", "mergetree"),
)
def x_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(3600, 'strict_order')``: like
    x_window_funnel, but NO other event may interleave between consecutive
    chain steps — in A→B→D→C the D kills the A→B chain at depth 2 (CH's
    own strict_order example). Steps must therefore be ADJACENT in the
    user's full (ts, event_id) timeline.

    Documented divergence from CH's scan: CH breaks processing at the
    first NO-CONDITION event after a step-1 match (condition events never
    interrupt there — they re-anchor or pass through), while this query
    requires strict step ADJACENCY but takes the max over ALL such runs
    (a later clean signup→view→purchase run still counts) — the
    declarative reading, and the one a per-chain SQL oracle can verify
    (adjacency = NOT EXISTS an event strictly between the steps). For
    bit-parity with CH's scan use x_window_funnel_freeze;
    tests/test_mergetree_properties.py pins the exact frames the two
    readings disagree on.

    The fold now consumes the user's FULL event array (interruption needs
    to see every event, not just step events): state is one active run
    (start, depth) + the frozen max — any event that is neither the
    expected next step nor a fresh signup kills the active run. Still one
    user_id shuffle, still O(events) per user, no self-join (the
    EXISTS/NOT-EXISTS formulation is only the fixture-scale oracle).
    """
    ev = load_tables(spark, sf_dir)["events"]
    seq = (
        ev.select("user_id", F.unix_micros("ts").alias("tus"), "event_id",
                  "event_type")
        .groupBy("user_id")
        .agg(F.array_sort(
            F.collect_list(F.struct("tus", "event_id", "event_type"))
        ).alias("seq"))
    )
    w = F.lit(_FUNNEL_WINDOW_US)
    init = F.struct(
        F.lit(None).cast("long").alias("s"),   # active run's signup tus
        F.lit(0).alias("c"),                    # active run depth
        F.lit(0).alias("m"),                    # frozen max depth
    )

    def step(acc, e):
        et = e["event_type"]
        in_window = acc["s"].isNotNull() & (e["tus"] <= acc["s"] + w)
        advance2 = (acc["c"] == 1) & (et == F.lit("view")) & in_window
        advance3 = (acc["c"] == 2) & (et == F.lit("purchase")) & in_window
        restart = et == F.lit("signup")
        c = (
            F.when(advance2, F.lit(2))
            .when(advance3, F.lit(3))
            .when(restart, F.lit(1))
            .otherwise(F.lit(0))
        )
        s = F.when(restart & ~advance2 & ~advance3, e["tus"]).otherwise(
            F.when(advance2 | advance3, acc["s"]).otherwise(
                F.lit(None).cast("long")
            )
        )
        return F.struct(
            s.alias("s"), c.alias("c"), F.greatest(acc["m"], c).alias("m")
        )

    depth = F.aggregate(F.col("seq"), init, step)["m"]
    return (
        seq.select("user_id", depth.alias("depth"))
        .filter(F.col("depth") >= 1)
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# Timed sequenceMatch oracle: EXISTS-chains with per-gap time bounds.
SEQUENCE_MATCH_TIMED_SQL = """
WITH m2 AS (
  SELECT DISTINCT a.user_id
  FROM events a JOIN events b
    ON b.user_id = a.user_id
   AND a.event_type = 'signup' AND b.event_type = 'purchase'
   AND (b.ts, b.event_id) > (a.ts, a.event_id)
   AND b.ts <= a.ts + INTERVAL 4 HOUR),
m3 AS (
  SELECT DISTINCT a.user_id
  FROM events a
  JOIN events b
    ON b.user_id = a.user_id AND b.event_type = 'click'
   AND (b.ts, b.event_id) > (a.ts, a.event_id)
   AND b.ts <= a.ts + INTERVAL 4 HOUR
  JOIN events c
    ON c.user_id = a.user_id AND c.event_type = 'purchase'
   AND (c.ts, c.event_id) > (b.ts, b.event_id)
   AND c.ts <= b.ts + INTERVAL 4 HOUR
  WHERE a.event_type = 'signup')
SELECT 'signup(?t<=14400)purchase' AS pattern,
       CAST((SELECT COUNT(*) FROM m2) AS BIGINT) AS n_matched
UNION ALL
SELECT 'signup(?t<=14400)click(?t<=14400)purchase' AS pattern,
       CAST((SELECT COUNT(*) FROM m3) AS BIGINT) AS n_matched
"""

_SEQ_GAP_US = 14_400_000_000  # 4 h, µs — wide enough that the
# 3-step pattern has matches at sf0.01 (30 min gave n_matched = 0, a
# non-discriminating driver check)


@query(
    "x_sequence_match_timed",
    oracle=SEQUENCE_MATCH_TIMED_SQL,
    tags=("behavior", "mergetree"),
)
def x_sequence_match_timed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t<=14400)(?2)')`` (and the 3-step
    form): does the user's stream contain the pattern with EVERY gap
    between consecutive matched steps at most 4 hours?

    Greedy earliest-first matching (x_sequence_match) is NOT exact once
    gaps are bounded — an early anchor can time out a chain a later anchor
    completes. The exact linear rule: per pattern level, keep the LATEST
    event that validly reaches that level (a later anchor strictly
    shrinks the next gap, so it dominates — exchange argument). The fold
    tracks one timestamp per level; compute stays O(user's step events)
    with the same single user_id shuffle as the untimed query; the
    EXISTS-chain joins remain oracle-only.
    """
    ev = load_tables(spark, sf_dir)["events"]
    steps = ev.filter(
        F.col("event_type").isin("signup", "click", "purchase")
    ).select("user_id", F.unix_micros("ts").alias("tus"), "event_id",
             "event_type")
    seq = steps.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("tus", "event_id", "event_type"))
        ).alias("seq")
    )
    g = F.lit(_SEQ_GAP_US)
    # s1 = latest signup; p2 = flag for pattern-2 match; c2 = latest click
    # within the gap of some earlier signup; p3 = flag for pattern-3 match.
    init = F.struct(
        F.lit(None).cast("long").alias("s1"),
        F.lit(None).cast("long").alias("c2"),
        F.lit(False).alias("p2"),
        F.lit(False).alias("p3"),
    )

    def step(acc, e):
        t, tus = e["event_type"], e["tus"]
        is_signup = t == F.lit("signup")
        click_ok = (
            (t == F.lit("click"))
            & acc["s1"].isNotNull() & (tus - acc["s1"] <= g)
        )
        purch2 = (
            (t == F.lit("purchase"))
            & acc["s1"].isNotNull() & (tus - acc["s1"] <= g)
        )
        purch3 = (
            (t == F.lit("purchase"))
            & acc["c2"].isNotNull() & (tus - acc["c2"] <= g)
        )
        return F.struct(
            F.when(is_signup, F.greatest(acc["s1"], tus))
            .otherwise(acc["s1"]).alias("s1"),
            F.when(click_ok, F.greatest(acc["c2"], tus))
            .otherwise(acc["c2"]).alias("c2"),
            (acc["p2"] | purch2).alias("p2"),
            (acc["p3"] | purch3).alias("p3"),
        )

    st = F.aggregate(F.col("seq"), init, step)
    flags = seq.select(
        st["p2"].cast("long").alias("m2"), st["p3"].cast("long").alias("m3")
    )
    tot = flags.agg(F.sum("m2").alias("n2"), F.sum("m3").alias("n3"))
    return tot.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("signup(?t<=14400)purchase").alias("pattern"),
                    F.col("n2").alias("n_matched"),
                ),
                F.struct(
                    F.lit("signup(?t<=14400)click(?t<=14400)purchase")
                    .alias("pattern"),
                    F.col("n3").alias("n_matched"),
                ),
            )
        ).alias("r")
    ).select("r.pattern", "r.n_matched")


# strict_dedup oracle: a depth-d chain dies when an event REPEATS an
# already-matched condition inside the active span — so between consecutive
# chain steps there may be clicks/errors (unlike strict_order) but never
# another signup or view. Purchases before their turn are no-ops.
WINDOW_FUNNEL_DEDUP_SQL = """
WITH s AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'),
sv AS (SELECT user_id, ts, event_id FROM events
       WHERE event_type IN ('signup', 'view')),
d2 AS (
  SELECT DISTINCT s.user_id
  FROM s JOIN events v
    ON v.user_id = s.user_id AND v.event_type = 'view'
   AND (v.ts, v.event_id) > (s.ts, s.event_id)
   AND v.ts <= s.ts + INTERVAL 1 HOUR
  WHERE NOT EXISTS (
    SELECT 1 FROM sv x
    WHERE x.user_id = s.user_id
      AND (x.ts, x.event_id) > (s.ts, s.event_id)
      AND (x.ts, x.event_id) < (v.ts, v.event_id))
),
d3 AS (
  SELECT DISTINCT s.user_id
  FROM s
  JOIN events v
    ON v.user_id = s.user_id AND v.event_type = 'view'
   AND (v.ts, v.event_id) > (s.ts, s.event_id)
   AND v.ts <= s.ts + INTERVAL 1 HOUR
  JOIN events p
    ON p.user_id = s.user_id AND p.event_type = 'purchase'
   AND (p.ts, p.event_id) > (v.ts, v.event_id)
   AND p.ts <= s.ts + INTERVAL 1 HOUR
  WHERE NOT EXISTS (
    SELECT 1 FROM sv x
    WHERE x.user_id = s.user_id
      AND (x.ts, x.event_id) > (s.ts, s.event_id)
      AND (x.ts, x.event_id) < (v.ts, v.event_id))
    AND NOT EXISTS (
    SELECT 1 FROM sv y
    WHERE y.user_id = s.user_id
      AND (y.ts, y.event_id) > (v.ts, v.event_id)
      AND (y.ts, y.event_id) < (p.ts, p.event_id))
)
SELECT depth, COUNT(*) AS n_users FROM (
  SELECT u.user_id,
         CASE WHEN u.user_id IN (SELECT user_id FROM d3) THEN 3
              WHEN u.user_id IN (SELECT user_id FROM d2) THEN 2
              ELSE 1 END AS depth
  FROM (SELECT DISTINCT user_id FROM s) u) t
GROUP BY depth
"""


@query(
    "x_window_funnel_dedup",
    oracle=WINDOW_FUNNEL_DEDUP_SQL,
    tags=("behavior", "mergetree"),
)
def x_window_funnel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(3600, 'strict_deduplication')``: a repeat
    of an ALREADY-MATCHED condition inside the active chain kills it — a
    second view after the chain reached depth 2 interrupts, a second
    signup restarts the chain at the newer anchor — while unrelated events
    (clicks, errors) pass through freely, the middle ground between the
    default mode (everything passes) and strict_order (nothing passes).
    Unmatched later-step events (a purchase before any view) are no-ops.

    Same documented divergence as x_window_funnel_strict: max over all
    surviving chains rather than CH's single-scan semantics — the
    declarative reading a per-chain SQL oracle can verify (NOT EXISTS a
    signup/view strictly between consecutive steps). CH's exact
    strict_deduplication scan (step-1 events re-anchor without
    deduplicating; a repeated recorded step k ends the scan with RESULT
    k) is what the dialect's ``windowFunnel(W, 'strict_deduplication')``
    generates since round 9; the frame the two readings disagree on is
    pinned in test_mergetree_properties.py.

    Plan contract unchanged: the fold consumes the step-relevant events in
    one sorted array per user — one user_id exchange, O(events) per user,
    no self-joins."""
    ev = load_tables(spark, sf_dir)["events"]
    seq = (
        ev.filter(F.col("event_type").isin("signup", "view", "purchase"))
        .select("user_id", F.unix_micros("ts").alias("tus"), "event_id",
                "event_type")
        .groupBy("user_id")
        .agg(F.array_sort(
            F.collect_list(F.struct("tus", "event_id", "event_type"))
        ).alias("seq"))
    )
    w = F.lit(_FUNNEL_WINDOW_US)
    init = F.struct(
        F.lit(None).cast("long").alias("s"),
        F.lit(0).alias("c"),
        F.lit(0).alias("m"),
    )

    def step(acc, e):
        et = e["event_type"]
        in_window = acc["s"].isNotNull() & (e["tus"] <= acc["s"] + w)
        advance2 = (acc["c"] == 1) & (et == F.lit("view")) & in_window
        advance3 = (acc["c"] == 2) & (et == F.lit("purchase")) & in_window
        restart = et == F.lit("signup")  # dup of cond1 kills + re-anchors
        dup_view = (et == F.lit("view")) & (acc["c"] >= 2)
        c = (
            F.when(advance2, F.lit(2))
            .when(advance3, F.lit(0))       # chain completed and consumed
            .when(restart, F.lit(1))
            .when(dup_view, F.lit(0))
            .otherwise(acc["c"])            # unrelated / unmatched: no-op
        )
        s = (
            F.when(restart, e["tus"])
            .when(advance2, acc["s"])
            .when(advance3 | dup_view, F.lit(None).cast("long"))
            .otherwise(acc["s"])
        )
        m = F.greatest(
            acc["m"],
            F.when(advance3, F.lit(3)).when(advance2, F.lit(2))
            .when(restart, F.lit(1)).otherwise(F.lit(0)),
        )
        return F.struct(s.alias("s"), c.alias("c"), m.alias("m"))

    depth = F.aggregate(F.col("seq"), init, step)["m"]
    return (
        seq.select("user_id", depth.alias("depth"))
        .filter(F.col("depth") >= 1)
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# Freeze-parity strict_order funnel oracle. CH's scan (round-9 reading,
# from AggregateFunctionWindowFunnel.h's else-if chain): only an event
# matching NO funnel condition breaks the scan, and only after the first
# step-1 event; condition events never interrupt — a signup re-anchors
# level 1 and a non-advancing/out-of-window step event simply passes
# through. The oracle therefore (a) truncates each user's timeline at the
# first no-condition event after the first signup, then (b) replays the
# re-anchoring chain with correlated "latest valid predecessor" lookups:
# a view is valid against the LATEST signup before it, a purchase against
# the LATEST valid view before it, window always vs the chain's signup.
WINDOW_FUNNEL_FREEZE_SQL = """
WITH o AS (
  SELECT user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
fs AS (
  SELECT user_id, MIN(rn) AS rn0
  FROM o WHERE event_type = 'signup' GROUP BY user_id),
brk AS (
  SELECT o.user_id, MIN(o.rn) AS rnb
  FROM o JOIN fs ON fs.user_id = o.user_id
  WHERE o.event_type NOT IN ('signup', 'view', 'purchase')
    AND o.rn > fs.rn0
  GROUP BY o.user_id),
pfx AS (
  SELECT o.* FROM o
  JOIN fs ON fs.user_id = o.user_id
  LEFT JOIN brk ON brk.user_id = o.user_id
  WHERE brk.rnb IS NULL OR o.rn < brk.rnb),
vv AS (
  SELECT v.user_id, v.rn, v.ts,
         (SELECT MAX(s.ts) FROM pfx s
          WHERE s.user_id = v.user_id AND s.event_type = 'signup'
            AND s.rn < v.rn) AS anchor
  FROM pfx v WHERE v.event_type = 'view'),
valid_v AS (
  SELECT * FROM vv
  WHERE anchor IS NOT NULL AND ts <= anchor + INTERVAL 1 HOUR),
pp AS (
  SELECT p.user_id, p.ts,
         (SELECT v.anchor FROM valid_v v
          WHERE v.user_id = p.user_id AND v.rn < p.rn
          ORDER BY v.rn DESC LIMIT 1) AS anchor
  FROM pfx p WHERE p.event_type = 'purchase'),
l3 AS (SELECT DISTINCT user_id FROM pp
       WHERE anchor IS NOT NULL AND ts <= anchor + INTERVAL 1 HOUR),
l2 AS (SELECT DISTINCT user_id FROM valid_v)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
  SELECT f.user_id,
         CASE WHEN f.user_id IN (SELECT user_id FROM l3) THEN 3
              WHEN f.user_id IN (SELECT user_id FROM l2) THEN 2
              ELSE 1 END AS depth
  FROM fs f) t
GROUP BY depth
"""


@query(
    "x_window_funnel_freeze",
    oracle=WINDOW_FUNNEL_FREEZE_SQL,
    tags=("behavior", "mergetree"),
)
def x_window_funnel_freeze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(3600, 'strict_order')`` with CH's exact
    FREEZE semantics (AggregateFunctionWindowFunnel.h, the strict-order
    arm of getEventLevel's else-if chain): only an event that matches NO
    funnel condition breaks the scan, and only once a step-1 event has
    been seen (``first_event``). Condition events never interrupt — a
    repeated signup RE-ANCHORS level 1 (signup,signup,view,purchase → 3),
    a repeated or out-of-window step event passes through
    (signup,view,view,purchase → 3) — and levels already recorded survive
    the break (A→B→D→C freezes at 2; a later clean run after a break does
    NOT count). This is the bit-parity companion to
    x_window_funnel_strict, which keeps the (documented, deliberately
    divergent) max-over-all-adjacent-runs reading; a migrating CH user
    picks by which contract they relied on.

    The fold mirrors x_window_funnel's anchor-propagating state plus a
    first-event flag and a dead bit: s1 = latest signup ts (CH's
    events_timestamp[0]), s2 = chain anchor of the latest valid view
    (events_timestamp[1].first — the overwrite equals a running max, as
    latest-signup-before is monotone in event order), d = max level
    recorded. Window checks are always against the chain's signup anchor,
    exactly CH's ``timestamp <= first_timestamp + window``. Same shape at
    scale: one user_id exchange, O(events) fold per user, no self-join;
    the correlated-subquery oracle is fixture-scale only.
    """
    ev = load_tables(spark, sf_dir)["events"]
    seq = (
        ev.select("user_id", F.unix_micros("ts").alias("tus"), "event_id",
                  "event_type")
        .groupBy("user_id")
        .agg(F.array_sort(
            F.collect_list(F.struct("tus", "event_id", "event_type"))
        ).alias("seq"))
    )
    w = F.lit(_FUNNEL_WINDOW_US)
    init = F.struct(
        F.lit(None).cast("long").alias("s1"),  # latest signup (level-1 anchor)
        F.lit(None).cast("long").alias("s2"),  # level-2 chain anchor
        F.lit(0).alias("d"),                    # max level recorded
        F.lit(False).alias("f"),                # first step-1 event seen
        F.lit(False).alias("k"),                # dead: scan broken
    )

    def step(acc, e):
        et = e["event_type"]
        live = ~acc["k"]
        is1 = et == F.lit("signup")
        adv2 = (
            live & (et == F.lit("view"))
            & acc["s1"].isNotNull() & (e["tus"] <= acc["s1"] + w)
        )
        adv3 = (
            live & (et == F.lit("purchase"))
            & acc["s2"].isNotNull() & (e["tus"] <= acc["s2"] + w)
        )
        nocond = (
            ~is1 & (et != F.lit("view")) & (et != F.lit("purchase"))
        )
        s1 = F.when(live & is1, F.greatest(acc["s1"], e["tus"])).otherwise(
            acc["s1"]
        )
        s2 = F.when(adv2, F.greatest(acc["s2"], acc["s1"])).otherwise(
            acc["s2"]
        )
        d = F.greatest(
            acc["d"],
            F.when(adv3, F.lit(3))
            .when(adv2, F.lit(2))
            .when(live & is1, F.lit(1))
            .otherwise(F.lit(0)),
        )
        return F.struct(
            s1.alias("s1"), s2.alias("s2"), d.alias("d"),
            (acc["f"] | is1).alias("f"),
            (acc["k"] | (acc["f"] & nocond)).alias("k"),
        )

    depth = F.aggregate(F.col("seq"), init, step)["d"]
    return (
        seq.select("user_id", depth.alias("depth"))
        .filter(F.col("depth") >= 1)
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
