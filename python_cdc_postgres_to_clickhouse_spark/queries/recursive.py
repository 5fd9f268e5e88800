"""Recursive CTE surface (SQL:1999 WITH RECURSIVE, Spark 4.x).

The reference's warehouse (ClickHouse) and the oracle engine both speak
recursive CTEs; Spark gained them in 4.0. One query demonstrates the
surface with the SAME SQL text executed on both engines — the Spark side
is literally ``spark.sql(SQL)`` over the registered temp views, and the
oracle is the identical string. (The iterative operators —
``operators/clusters.connected_components`` — remain the scale path for
unbounded-depth recursion; a recursive CTE re-joins the full working set
per level, which is the right tool for bounded, data-small recursions
like calendar spines and shallow hierarchies.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import load_tables

# Calendar-dimension generation: a day spine from the first to the last
# event day built by recursion (≤ observation-window iterations), then
# zero-filled daily counts. Engine-portable SQL — no dialect branches.
DATE_SPINE_SQL = """
WITH RECURSIVE bounds AS (
  SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
  FROM events
), spine(day, d1) AS (
  SELECT d0, d1 FROM bounds
  UNION ALL
  SELECT day + INTERVAL 1 DAY, d1 FROM spine
  WHERE day + INTERVAL 1 DAY <= d1
), daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY date_trunc('day', ts)
)
SELECT s.day, COALESCE(d.n_events, CAST(0 AS BIGINT)) AS n_events
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@query(
    "sql_recursive_date_spine",
    oracle=DATE_SPINE_SQL,
    tags=("sql", "recursive", "timeseries"),
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled daily event counts over a WITH RECURSIVE calendar spine.

    The recursion depth is the observation window in days (bounded, tiny
    working set per level); the corpus bounds are computed ONCE in a
    non-recursive CTE and threaded through the recursion as a carried
    column — a termination check written as a scalar subquery would
    re-scan events at every level. The daily aggregate is one hash agg
    with map-side partials; the spine joins it broadcast-small. The exact
    SQL text the oracle runs is what Spark executes — the strongest
    possible dialect-parity statement for the recursive surface. (Not a
    bench headline entry: each recursion level is a scheduled job, so the
    query measures Spark's per-level latency, not a data-path design.)
    """
    load_tables(spark, sf_dir)  # registers the temp views spark.sql reads
    return spark.sql(DATE_SPINE_SQL)
