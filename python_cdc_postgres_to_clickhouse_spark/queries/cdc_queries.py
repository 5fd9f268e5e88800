"""CDC-state queries (SURVEY.md §2.3) expressed over the driver tables.

The `events` table stands in for a change stream: `user_id` is the key,
`ts`/`event_id` the LSN-like total order. These queries declare the
latest-by-key upsert materialization (D3) — what ClickHouse would do with
ReplacingMergeTree + FINAL — and the snapshot ⊎ changelog union (D1), both
as pure window/join compositions (no custom rules; SURVEY §4).

The real CDC path over Debezium envelopes (with op routing, deletes,
duplicate deliveries) lives in ``operators/upsert.py`` and is exercised by
tests/test_cdc.py on generated envelope fixtures; these declared queries
give the driver an oracle-checkable projection of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables

LATEST_SQL = """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
"""


@query("cdc_latest_by_key", oracle=LATEST_SQL, tags=("cdc",))
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key (D3): newest event per user, LSN-ordered with a
    unique tiebreaker — the upsert materialization of a change stream.

    At 100 TB this is one hash-shuffle on the key + per-key top-1; AQE
    handles skewed keys. Streaming form: operators/upsert.py.
    """
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


SNAPSHOT_UNION_SQL = """
SELECT user_id, event_id, event_type, src FROM (
  SELECT u.user_id, u.event_id, u.event_type, u.src,
         ROW_NUMBER() OVER (PARTITION BY u.user_id
                            ORDER BY u.ts DESC, u.event_id DESC) AS rn
  FROM (
    SELECT user_id, event_id, ts, event_type, 'snapshot' AS src
    FROM events WHERE event_id <= 5000
    UNION ALL
    SELECT user_id, event_id, ts, event_type, 'changelog' AS src
    FROM events WHERE event_id > 5000
  ) u) t
WHERE rn = 1
"""


@query("cdc_snapshot_union_changelog", oracle=SNAPSHOT_UNION_SQL, tags=("cdc",))
def cdc_snapshot_union_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot ⊎ changelog (D1): initial snapshot unioned with subsequent
    changes, materialized to current state — `snapshot.mode: initial`
    semantics (reference debezium.json:18)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    snapshot = ev.filter(F.col("event_id") <= 5000).select(
        "user_id", "event_id", "ts", "event_type", F.lit("snapshot").alias("src")
    )
    changelog = ev.filter(F.col("event_id") > 5000).select(
        "user_id", "event_id", "ts", "event_type", F.lit("changelog").alias("src")
    )
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        snapshot.unionByName(changelog)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "src")
    )


@query(
    "cdc_op_routing",
    oracle="""
    SELECT event_type AS op, COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_keys,
           min(ts) AS first_ts, max(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
    tags=("cdc",),
)
def cdc_op_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-type routing (D2): per-op statistics of the change stream —
    the engine keeps `op` instead of dropping it like the reference's
    unwrap default (reference debezium.json:27-28)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.col("event_type").alias("op"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_keys"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@query(
    "cdc_changes_per_key_topn",
    oracle="""
    SELECT user_id, n_changes, last_ts FROM (
      SELECT user_id, COUNT(*) AS n_changes, max(ts) AS last_ts,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rn
      FROM events GROUP BY user_id) t
    WHERE rn <= 20
    """,
    tags=("cdc", "topk"),
)
def cdc_changes_per_key_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hottest keys in the change stream (ORDER BY + LIMIT with a unique
    tiebreak): skew diagnostics for the upsert path."""
    t = load_tables(spark, sf_dir)
    agg = (
        t["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_changes"), F.max("ts").alias("last_ts"))
    )
    return (
        agg.orderBy(F.desc("n_changes"), F.asc("user_id"))
        .limit(20)
        .select("user_id", "n_changes", "last_ts")
    )
