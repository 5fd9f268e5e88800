"""Event-time window queries (SURVEY.md §2.5 T3/T4) declared over the
`events` table in batch mode — the same ``streaming.windows`` builders run
unchanged over the file-based change stream (tests/test_streaming.py); batch
mode is what the DuckDB oracle can check.

Oracle notes: Spark aligns windows to the epoch; DuckDB's ``time_bucket``
origin (2000-01-03) is day-aligned with the epoch, so all sub-day bucket
widths produce identical boundaries. A sliding window of width W slide S
assigns each event to W/S buckets — the oracle expands them with a UNION ALL
of shifted time_buckets. Session semantics: a new session starts when the
gap is ≥ the timeout (Spark extends a session only while the next event is
strictly inside end = last + gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..streaming import windows as SW
from ..tables import load_tables

TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '12 hours', ts) AS window_start,
       time_bucket(INTERVAL '12 hours', ts) + INTERVAL '12 hours' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY window_start, window_end, event_type
"""


@query("t_tumbling_window", oracle=TUMBLING_SQL, tags=("streaming", "window"))
def t_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 12h windows per event type."""
    t = load_tables(spark, sf_dir)
    return SW.tumbling(t["events"], width="12 hours")


SLIDING_SQL = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, event_type, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '6 hours', ts) - INTERVAL '6 hours' AS window_start,
         event_type, value FROM events
)
SELECT window_start, window_start + INTERVAL '12 hours' AS window_end, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM expanded
GROUP BY window_start, event_type
"""


@query("t_sliding_window", oracle=SLIDING_SQL, tags=("streaming", "window"))
def t_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 12h windows every 6h (each event in 2 windows)."""
    t = load_tables(spark, sf_dir)
    return SW.sliding(t["events"], width="12 hours", slide="6 hours")


SESSION_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM g
)
SELECT user_id,
       min(ts) AS window_start,
       max(ts) + INTERVAL '6 hours' AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sess
"""


@query("t_session_window", oracle=SESSION_SQL, tags=("streaming", "window"))
def t_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 6h inactivity gap."""
    t = load_tables(spark, sf_dir)
    return SW.session(t["events"], gap="6 hours")
