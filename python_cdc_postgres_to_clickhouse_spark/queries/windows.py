"""Window-function surface (SURVEY.md §2.4): ranking, analytic, frames.

Every orderBy carries a unique tiebreaker so frame contents are a total
order — without it, running aggregates are nondeterministic under ties on
both engines. Running/moving sums accumulate in DECIMAL (exact under any
association order; DuckDB's segment-tree evaluation and Spark's incremental
evaluation would disagree on doubles).

Scale: window partitions shuffle on their partition key; the keys here
(custkey, suppkey) are high-cardinality and unskewed, so state per key is
tiny — this pattern holds at 100 TB. An ORDER BY over the whole table with
no PARTITION BY would single-task; none is declared here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables
from ._exprs import dec


@query(
    "w_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (row_number ≤ k)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "w_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
    FROM part
    """,
    tags=("window",),
)
def w_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with ties (deterministic: equal keys share a rank)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return t["part"].select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
    )


@query(
    "w_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           CAST(CAST(o_totalprice AS DECIMAL(18,6))
                - CAST(LAG(o_totalprice) OVER w AS DECIMAL(18,6)) AS DOUBLE) AS delta_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def w_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead along each customer's order timeline + exact delta."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (dec("o_totalprice") - dec(prev)).cast("double").alias("delta_price"),
    )


@query(
    "w_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem
    """,
    tags=("window",),
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per supplier (cumulative ROWS frame, exact decimal)."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t["lineitem"].select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("double").alias("running_qty"),
    )


@query(
    "w_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / CAST(COUNT(o_totalprice) OVER w AS DOUBLE) AS moving_avg_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row moving average (exact decimal sum ÷ count in double space)."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, W.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count("o_totalprice").over(w).cast("double")
        ).alias("moving_avg_price"),
    )


@query(
    "w_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS balance_quartile,
           FIRST_VALUE(c_custkey) OVER w AS seg_first_cust,
           LAST_VALUE(c_custkey) OVER w AS seg_last_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def w_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing + first/last value over an unbounded frame.

    The global NTILE window is a deliberate single-partition case — fine on
    dimension-sized inputs, never used on facts (see module docstring).
    """
    t = load_tables(spark, sf_dir)
    wq = W.orderBy("c_acctbal", "c_custkey")
    wseg = (
        W.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return t["customer"].select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(wq).cast("long").alias("balance_quartile"),
        F.first("c_custkey").over(wseg).alias("seg_first_cust"),
        F.last("c_custkey").over(wseg).alias("seg_last_cust"),
    )


@query(
    "w_percent_rank_cume",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def w_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank analytics: percent_rank = (rank−1)/(n−1) and
    cume_dist = rank_of_last_peer/n are double divisions of exact ints —
    engine-identical, unlike value-interpolating percentile functions."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_mktsegment",
        "c_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "w_range_frame",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    """,
    tags=("window",),
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a numeric offset (peers included → tie-safe)."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, W.currentRow)
    )
    return t["orders"].select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_in_band"),
    )


@query(
    "w_forward_fill",
    oracle="""
    SELECT event_id, user_id, v,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
          FROM events) e
    """,
    tags=("window", "nulls"),
)
def w_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill / last-observation-carried-forward: IGNORE NULLS window
    semantics (gap-filling sensor/CDC streams — carry each user's last
    non-null reading forward). Nulls are injected deterministically
    (event_id % 7) so the fill actually exercises skipping. One shuffle on
    user_id; the running frame is incremental state per partition, and
    (ts, event_id) gives a total order so results are engine-identical —
    values pass through unaggregated, so doubles stay bit-exact."""
    t = load_tables(spark, sf_dir)
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t["events"]
        .select("event_id", "user_id", "ts", v.alias("v"))
        .select(
            "event_id",
            "user_id",
            "v",
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
    )
