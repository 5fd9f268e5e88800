"""ClickHouse scalar/aggregate function analogs the reference's warehouse
exposes but earlier families did not yet declare: ``exponentialMovingAverage``
(x_ewma_trailing), ``largestTriangleThreeBuckets`` (x_lttb_downsample),
``dictGetOrDefault`` (x_dict_enrich), ``multiSearchAny`` /
``multiSearchFirstIndex`` (c_multi_search).

The reference (main.py:1-58) only delivers CDC rows into ClickHouse; these
are the ClickHouse-side functions a user of that stack runs on the delivered
tables, re-expressed as native Spark plans.

Scale notes (100 TB):
- EWMA keeps the trailing-K recurrence as K fixed ``lag`` columns over ONE
  user_id window shuffle — no per-row UDF state, no iterative pass; state per
  user is its own event list, and the final per-user reduction rides the same
  exchange (window + filter, key unchanged).
- LTTB aggregates each (series, bucket) to a 4-number summary (one hash
  aggregate with map-side partials), runs the neighbor-anchor windows over the
  summary frame (|series|x|buckets| rows — KBs at any corpus size), then
  broadcasts it back over the points. Points are shuffled ONCE (the per-bucket
  argmax window); no all-pairs, no global sort.
- dictGet is the ClickHouse external-dictionary pattern: the dict is a
  broadcast hash map built from a filtered dimension join; the fact table is
  never shuffled (plan-asserted broadcast).
- multiSearch is pure whole-stage-codegen string scalar work — zero
  exchanges beyond the scan.

Float determinism (see behavior.py's module docstring for the full story):
EWMA weights are dyadic (0.5^j), so every product is an exact exponent
shift and both engines sum the identical term sequence left-to-right.
LTTB anchor coordinates derive from exact integer sums (cents / relative
microseconds) recombined with one fixed IEEE754 expression tree; ranking
compares bit-identical doubles. Neither query outputs a transcendental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables

# ---------------------------------------------------------------------------
# X61: exponentialMovingAverage analog — trailing-K EWMA, last value per user
# ---------------------------------------------------------------------------

EWMA_K = 8
# 0.5^j for j = 0..7: exact dyadic doubles; value * w is an exponent shift
# (no mantissa rounding), so the numerator terms are exact and the two
# engines' left-to-right sums round identically at every step.
EWMA_WEIGHTS = [0.5**j for j in range(EWMA_K)]


def _ewma_terms(cols: list[str]) -> tuple[str, str]:
    num = " + ".join(
        f"CASE WHEN {c} IS NULL THEN 0.0 ELSE {c} * {w!r} END"
        for c, w in zip(cols, EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN {c} IS NULL THEN 0.0 ELSE {w!r} END"
        for c, w in zip(cols, EWMA_WEIGHTS)
    )
    return num, den


_EWMA_LAG_COLS = ["value"] + [f"l{j}" for j in range(1, EWMA_K)]
_EWMA_NUM, _EWMA_DEN = _ewma_terms(_EWMA_LAG_COLS)

EWMA_SQL = f"""
WITH t AS (
  SELECT user_id, ts, event_id, value,
         {", ".join(f"LAG(value, {j}) OVER w AS l{j}" for j in range(1, EWMA_K))},
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       ({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma8,
       value AS last_value
FROM t WHERE rn = 1 ORDER BY user_id
"""


@query("x_ewma_trailing", oracle=EWMA_SQL, tags=("behavior", "timeseries", "chfunc"))
def x_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage`` analog: per-user EWMA of
    ``value`` at the user's latest event, decay 0.5 per step over the
    trailing 8 events (the adjusted/weighted-mean form:
    sum(v_j*0.5^j)/sum(0.5^j) over present lags).

    The recurrence is unrolled to 8 ``lag`` columns so the whole
    computation is one user_id window shuffle + a same-key latest-row
    filter — no UDF, no iterative state; at 100 TB the per-user work is
    bounded by the user's own timeline and the exchange count is one.
    The fixed-order scalar sum is the bit-exact cross-engine pattern
    x_keyword_bm25 established.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wp = Window.partitionBy("user_id")
    lagged = ev.select(
        "user_id",
        "value",
        *[F.lag("value", j).over(w).alias(f"l{j}") for j in range(1, EWMA_K)],
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_events"),
    )
    return (
        lagged.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            (F.expr(_EWMA_NUM) / F.expr(_EWMA_DEN)).alias("ewma8"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# X62: largestTriangleThreeBuckets analog — per-series visual downsampling
# ---------------------------------------------------------------------------

LTTB_SQL = """
WITH pts AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         epoch_us(ts) AS x_us, value, event_id
  FROM events
), b AS (
  SELECT event_type, day, COUNT(*) AS n_pts,
         SUM(x_us - epoch_us(day)) AS sum_off,
         SUM(CAST(round(value * 100) AS BIGINT)) AS sum_cents
  FROM pts GROUP BY event_type, day
), based AS (
  SELECT event_type, day, n_pts, sum_off, sum_cents,
         epoch_us(MIN(day) OVER (PARTITION BY event_type)) AS base_us
  FROM b
), anch AS (
  SELECT event_type, day, n_pts, base_us,
         CAST(epoch_us(day) - base_us AS DOUBLE)
           + CAST(sum_off AS DOUBLE) / CAST(n_pts AS DOUBLE) AS ax,
         (CAST(sum_cents AS DOUBLE) / CAST(n_pts AS DOUBLE)) / 100.0 AS ay
  FROM based
), bs AS (
  SELECT event_type, day, n_pts, base_us,
         LAG(ax)  OVER w AS pax, LAG(ay)  OVER w AS pay,
         LEAD(ax) OVER w AS nax, LEAD(ay) OVER w AS nay
  FROM anch
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), sel AS (
  SELECT p.event_type, p.day, s.n_pts, p.event_id, p.value,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_type, p.day
           ORDER BY
             CASE WHEN s.pax IS NULL THEN CAST(p.x_us - s.base_us AS DOUBLE)
                  WHEN s.nax IS NULL THEN -CAST(p.x_us - s.base_us AS DOUBLE)
                  ELSE -abs((s.pax - s.nax) * (p.value - s.pay)
                            - (s.pax - CAST(p.x_us - s.base_us AS DOUBLE))
                              * (s.nay - s.pay)) END,
             p.event_id) AS rn
  FROM pts p JOIN bs s USING (event_type, day)
)
SELECT event_type, day, CAST(n_pts AS BIGINT) AS n_pts, event_id, value
FROM sel WHERE rn = 1 ORDER BY event_type, day
"""


@query("x_lttb_downsample", oracle=LTTB_SQL, tags=("behavior", "timeseries", "chfunc"))
def x_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets`` analog: downsample each
    event_type's (ts, value) series to one representative point per day,
    keeping the point forming the largest triangle with the neighboring
    buckets' centroids.

    Divergence from exact LTTB (documented, deliberate): canonical LTTB
    anchors bucket i on the point SELECTED in bucket i-1, a sequential
    dependency; this uses both neighbors' centroids (the standard
    parallel relaxation), so every bucket decides independently — the
    shape that distributes. Edge buckets keep their first/last point,
    matching LTTB's endpoint pinning.

    Plan: one hash aggregate builds the per-(series, day) summary
    (map-side combinable; |series|x|days| rows — KBs regardless of event
    volume), neighbor anchors come from lag/lead windows over that tiny
    frame, and the summary broadcasts back onto the points, which shuffle
    exactly once for the per-bucket argmax window.

    Determinism: anchor coords are exact integer sums (intra-day µs
    offsets, value cents) recombined in one fixed double expression tree;
    µs are measured relative to each series' first day so both engines
    work on identical small integers (absolute epochs would differ by the
    session-timezone offset and re-round the anchor sums). The triangle
    area is the same IEEE754 expression on bit-identical inputs; ties
    break on event_id.
    """
    ev = load_tables(spark, sf_dir)["events"]
    pts = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.unix_micros("ts").alias("x_us"),
        "value",
        "event_id",
    )
    b = pts.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(F.col("x_us") - F.unix_micros("day")).alias("sum_off"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )
    wt = Window.partitionBy("event_type")
    based = b.withColumn("base_us", F.unix_micros(F.min("day").over(wt)))
    ax = (F.unix_micros("day") - F.col("base_us")).cast("double") + F.col(
        "sum_off"
    ).cast("double") / F.col("n_pts").cast("double")
    ay = (F.col("sum_cents").cast("double") / F.col("n_pts").cast("double")) / 100.0
    anch = based.select(
        "event_type", "day", "n_pts", "base_us", ax.alias("ax"), ay.alias("ay")
    )
    wb = Window.partitionBy("event_type").orderBy("day")
    bs = anch.select(
        "event_type",
        "day",
        "n_pts",
        "base_us",
        F.lag("ax").over(wb).alias("pax"),
        F.lag("ay").over(wb).alias("pay"),
        F.lead("ax").over(wb).alias("nax"),
        F.lead("ay").over(wb).alias("nay"),
    )
    j = pts.join(F.broadcast(bs), ["event_type", "day"])
    xr = (F.col("x_us") - F.col("base_us")).cast("double")
    area2 = F.abs(
        (F.col("pax") - F.col("nax")) * (F.col("value") - F.col("pay"))
        - (F.col("pax") - xr) * (F.col("nay") - F.col("pay"))
    )
    skey = (
        F.when(F.col("pax").isNull(), xr)
        .when(F.col("nax").isNull(), -xr)
        .otherwise(-area2)
    )
    ww = Window.partitionBy("event_type", "day").orderBy("skey", "event_id")
    sel = (
        j.select("event_type", "day", "n_pts", "event_id", "value", skey.alias("skey"))
        .withColumn("rn", F.row_number().over(ww))
        .filter(F.col("rn") == 1)
    )
    return sel.select(
        "event_type", "day", F.col("n_pts").cast("long").alias("n_pts"),
        "event_id", "value"
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# X63: dictGetOrDefault analog — broadcast dictionary enrichment
# ---------------------------------------------------------------------------

DICT_ENRICH_SQL = """
WITH dict AS (
  SELECT c.c_custkey AS k, n.n_name AS v
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE c.c_acctbal > 0
)
SELECT COALESCE(d.v, 'UNKNOWN') AS nation_name,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e LEFT JOIN dict d ON e.user_id = d.k
GROUP BY COALESCE(d.v, 'UNKNOWN')
ORDER BY nation_name
"""


@query("x_dict_enrich", oracle=DICT_ENRICH_SQL, tags=("join", "chfunc"))
def x_dict_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGetOrDefault('users', 'nation', user_id, 'UNKNOWN')``
    analog: enrich the event stream through an in-memory dictionary
    (positive-balance customers -> nation name), defaulting misses, then
    aggregate per resolved value.

    The dictionary is exactly what ClickHouse materializes host-side: a
    small filtered dimension join, here built once and broadcast — the
    fact table is never shuffled for the lookup (left broadcast hash
    join), and the rollup's cents sums are exact int64. At 100 TB the
    dict is |customers-with-balance| rows, still broadcastable; if a dim
    ever outgrew broadcast the same plan degrades to a shuffled hash
    join with no semantic change.
    """
    t = load_tables(spark, sf_dir)
    dict_df = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("k"), F.col("n_name").alias("v"))
    )
    ev = t["events"].select("user_id", "value")
    return (
        ev.join(F.broadcast(dict_df), ev.user_id == F.col("k"), "left")
        .groupBy(F.coalesce(F.col("v"), F.lit("UNKNOWN")).alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("nation_name")
    )


# ---------------------------------------------------------------------------
# X64: multiSearchAny / multiSearchFirstIndex analog
# ---------------------------------------------------------------------------

NEEDLES = ("window", "stream", "quantum", "spark")

_POS_SQL = ", ".join(
    f"CAST(strpos(text, '{n}') AS BIGINT) AS p{i}"
    for i, n in enumerate(NEEDLES, start=1)
)
_LEFTMOST_SQL = (
    "COALESCE(LEAST("
    + ", ".join(f"NULLIF(p{i}, 0)" for i in range(1, len(NEEDLES) + 1))
    + "), 0)"
)
_FIRST_IDX_SQL = (
    "CASE WHEN leftmost_pos = 0 THEN 0 "
    + " ".join(
        f"WHEN p{i} = leftmost_pos THEN {i}"
        for i in range(1, len(NEEDLES) + 1)
    )
    + " END"
)
_NHITS_SQL = " + ".join(
    f"CASE WHEN p{i} > 0 THEN 1 ELSE 0 END" for i in range(1, len(NEEDLES) + 1)
)

MULTI_SEARCH_SQL = f"""
WITH p AS (
  SELECT doc_id, {_POS_SQL} FROM documents
), m AS (
  SELECT doc_id, p1, p2, p3, p4, {_LEFTMOST_SQL} AS leftmost_pos FROM p
)
SELECT doc_id,
       leftmost_pos > 0 AS any_hit,
       CAST({_NHITS_SQL} AS BIGINT) AS n_hits,
       CAST({_FIRST_IDX_SQL} AS BIGINT) AS first_needle_idx,
       leftmost_pos
FROM m ORDER BY doc_id
"""


@query("c_multi_search", oracle=MULTI_SEARCH_SQL, tags=("scalar", "text", "chfunc"))
def c_multi_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``multiSearchAny`` / ``multiSearchFirstIndex`` /
    ``multiSearchFirstPosition`` analogs over a fixed needle set: per
    document, whether any needle occurs, how many distinct needles occur,
    the 1-based index of the needle whose occurrence is leftmost in the
    haystack (ties -> lowest needle index, 0 = none), and that position.

    Pure JVM string scalars (``instr``/``least``/``nullif``) inside one
    whole-stage-codegen projection — zero exchanges beyond the scan, the
    cheapest possible shape at any corpus size. ClickHouse implements
    these with Volnitsky multi-pattern search; k independent instr scans
    are the Spark-native equivalent for small fixed k (a regex
    alternation would defeat per-needle positions).
    """
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    pos = [
        F.instr(F.col("text"), F.lit(n)).cast("long").alias(f"p{i}")
        for i, n in enumerate(NEEDLES, start=1)
    ]
    p = docs.select("doc_id", *pos)
    leftmost = F.coalesce(
        F.least(
            *[F.nullif(F.col(f"p{i}"), F.lit(0)) for i in range(1, len(NEEDLES) + 1)]
        ),
        F.lit(0),
    ).alias("leftmost_pos")
    m = p.select("doc_id", *[f"p{i}" for i in range(1, len(NEEDLES) + 1)], leftmost)
    first_idx = F.when(F.col("leftmost_pos") == 0, F.lit(0))
    for i in range(1, len(NEEDLES) + 1):
        first_idx = first_idx.when(F.col(f"p{i}") == F.col("leftmost_pos"), F.lit(i))
    n_hits = None
    for i in range(1, len(NEEDLES) + 1):
        term = F.when(F.col(f"p{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        n_hits = term if n_hits is None else n_hits + term
    return m.select(
        "doc_id",
        (F.col("leftmost_pos") > 0).alias("any_hit"),
        n_hits.cast("long").alias("n_hits"),
        first_idx.cast("long").alias("first_needle_idx"),
        "leftmost_pos",
    ).orderBy("doc_id")
