"""Remaining classic TPC-H shapes, adapted to the fixture schema.

Rounds 1-3 covered Q1/Q2/Q3/Q4/Q5/Q6/Q7/Q17/Q19 shapes (pricing.py, misc.py,
joins.py, subqueries.py). This module closes the rest of the canonical suite
against the columns the fixtures actually carry:

- Q8  market share            → tpch_q8_market_share
- Q10 returned-item reporting → tpch_q10_returned_items
- Q12 late shipments          → tpch_q12_late_lines   (no l_shipmode /
  l_commitdate / l_receiptdate in the fixtures: "late" is l_shipdate more
  than 60 days after o_orderdate, grouped by l_linestatus)
- Q13 customer distribution   → tpch_q13_custdist     (no o_comment: the
  exclusion filter is an o_orderpriority predicate instead)
- Q14 promo revenue share     → tpch_q14_promo_share
- Q15 top supplier            → tpch_q15_top_supplier
- Q18 large-volume customers  → tpch_q18_large_orders
- Q21 suppliers who kept orders waiting → tpch_q21_waiting_supplier
  (lateness adapted as in Q12; the EXISTS / NOT EXISTS double-correlation
  shape is preserved exactly)
- Q22 lapsed-customer opportunity → tpch_q22_lapsed_customers (no c_phone:
  the country-code set is a c_nationkey IN-list; "no orders" relaxed to "no
  orders since 2000" because the synthetic fixtures give every customer at
  least one order)

Float determinism: every money aggregate goes through the exact-decimal
scheme in ``_exprs`` (sum DECIMAL(18,6), cast DOUBLE, divide in double
space), so Spark and the DuckDB oracle produce bit-identical doubles.

Scale notes are per-query docstrings; the common rules: nation/region are
fixed-size (25/5 rows) and always broadcast; part/supplier/customer grow
with scale and take shuffle equi-joins that AQE may demote to broadcast at
small SF; lineitem⋈orders is the big-big join and always shuffles on the
order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables
from ._exprs import DEC, SQL_DEC, SQL_DISC_PRICE, disc_price

_HIGH_PRIO = ("1-URGENT", "2-HIGH")


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN volume
                         ELSE CAST(0 AS {SQL_DEC}) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {SQL_DISC_PRICE} AS volume, l_suppkey, o_custkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
    ) v
    JOIN supplier ON v.l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN customer ON v.o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY o_year ORDER BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's yearly share of PROMO-part volume sold to
    ASIA-region customers. 8-way join: lineitem⋈orders shuffles on the
    order key; part and supplier/customer are shuffle equi-joins (they grow
    with SF); nation×2 and region are fixed-size broadcasts. The conditional
    share is two exact-decimal sums divided in double space — one hash
    aggregate on the 7-ish distinct years, partials map-side."""
    t = load_tables(spark, sf_dir)
    vol = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["part"].filter(F.col("p_type") == "PROMO"),
              F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            disc_price().alias("volume"),
            "l_suppkey",
            "o_custkey",
        )
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    asia = t["region"].filter(F.col("r_name") == "ASIA")
    df = (
        vol.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(asia), F.col("n1_rkey") == F.col("r_regionkey"))
    )
    zero = F.lit(0).cast(DEC)
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)
    return (
        df.groupBy("o_year")
        .agg(
            (
                F.sum(nation_vol).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a half-year
    window. Both selective filters (date range on orders, returnflag on
    lineitem) push to the parquet scans before the big-big join; nation is a
    fixed-size broadcast. The global top-20 is a TakeOrderedAndProject —
    per-partition heaps, only 20 rows reach the driver. c_custkey breaks
    revenue ties deterministically."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(returned, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "tpch_q12_late_lines",
    oracle=f"""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: count late lines split by order priority, grouped by
    l_linestatus (the fixtures carry no l_shipmode). The lateness predicate
    compares columns of both join sides, so it cannot push below the join —
    it runs as a post-join filter inside the same codegen stage; the
    aggregate reduces to 2 groups with map-side partials."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin(*_HIGH_PRIO)
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey) co
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "outer", "tpch"),
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, zero-order
    customers included via the left outer join (the join-side filter keeps
    them, a WHERE would not; no o_comment column, so the exclusion predicate
    is on o_orderpriority). Two chained aggregations: the first shuffles on
    c_custkey (same key as the join — AQE reuses the exchange), the second
    reduces to the handful of distinct counts."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q14_promo_share",
    oracle=f"""
    SELECT CAST(100 AS DOUBLE) *
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                         ELSE CAST(0 AS {SQL_DEC}) END) AS DOUBLE)
           / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' percentage of one month's revenue. The
    one-month shipdate range pushes to the lineitem scan (≈1/80 of the
    table survives); part joins on partkey only for the surviving lines.
    Global aggregate → one partial row per task."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    zero = F.lit(0).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(zero)
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(promo).cast("double")
                / F.sum(disc_price()).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue. The
    revenue "view" aggregates the date-pruned lineitem scan on suppkey; the
    scalar max is a 1-row aggregate broadcast back onto it (no windowing —
    a Window over an unpartitioned frame would funnel every supplier row
    through one task at scale). Equality on total_revenue is safe: both
    sides come from the same exact-decimal sum, so the doubles are
    bit-identical. The revenue subtree is evaluated twice (once for rows,
    once for the max) exactly as the SQL's view is."""
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(disc_price()).cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100
    """,
    tags=("join", "agg", "subquery", "topk", "tpch"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders totalling >300 units. The qty
    aggregate runs once (groupBy l_orderkey, map-side partials) and its
    filtered survivors — a tiny fraction of orders — carry total_qty into
    the joins directly, instead of the SQL's IN-subquery + re-aggregation
    (same result, one shuffle fewer). Join order: survivors ⋈ orders on the
    order key, then ⋈ customer on custkey; top-100 via per-partition heaps.
    o_orderkey breaks (price, date) ties."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select("l_orderkey", F.col("_qty").cast("double").alias("total_qty"))
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_name, COUNT(*) AS numwait
    FROM flagged l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM flagged l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25
    """,
    tags=("join", "semi", "anti", "agg", "tpch"),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the sole late supplier on a finished
    multi-supplier order ("late" = shipped >90 days after the order date —
    the fixtures carry no commit/receipt dates). The correlated EXISTS /
    NOT EXISTS pair becomes a left-semi then left-anti self-join of the
    flagged lineitem⋈orders view, both equi-keyed on l_orderkey with the
    supplier-inequality as a join residual — three shuffles on the same
    key, which AQE plans as one exchange reused. Supplier join is
    equi-keyed; the count groups by s_name with s_name as tiebreak."""
    t = load_tables(spark, sf_dir)
    flagged = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
        )
    )
    l1 = flagged.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    other = flagged.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp"), "late"
    )
    has_other = l1.join(
        other,
        (F.col("l_orderkey") == F.col("o_key")) & (F.col("l_suppkey") != F.col("o_supp")),
        "left_semi",
    )
    sole_late = has_other.join(
        other.filter(F.col("late")),
        (F.col("l_orderkey") == F.col("o_key")) & (F.col("l_suppkey") != F.col("o_supp")),
        "left_anti",
    )
    return (
        sole_late.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


@query(
    "tpch_q22_lapsed_customers",
    oracle="""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(c_acctbal) AS DOUBLE)
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=("agg", "subquery", "anti", "tpch"),
)
def tpch_q22_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: positive-balance-above-average customers in a nation set
    with no recent orders (country codes adapted to c_nationkey; "no orders
    ever" relaxed to "none since 2000-01-01" — the synthetic fixtures give
    every customer at least one order). The scalar average is a 1-row
    aggregate broadcast onto the filtered customer scan; the NOT EXISTS is
    a left-anti join against the date-pruned orders scan. Deterministic
    average: exact decimal sum ÷ count, divided as doubles."""
    t = load_tables(spark, sf_dir)
    codes = [1, 3, 5, 7, 9, 11, 13]
    in_set = t["customer"].filter(F.col("c_nationkey").isin(codes))
    avg_bal = in_set.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count("c_acctbal").cast("double")
        ).alias("_avg")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        in_set.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Second wave: Q9/Q11/Q16/Q20 — the four shapes whose canonical form needs
# the partsupp table the fixtures don't carry. Each keeps its defining
# structure (multi-way profit rollup; value-share HAVING against a global
# scalar; NOT-IN + count-distinct; nested-IN chain) with partsupp-derived
# quantities re-expressed over lineitem/part/supplier. With these, all 22
# canonical TPC-H shapes are declared and oracle-checked.
# ---------------------------------------------------------------------------

_SYNTH_COST = (
    "CAST(CAST(p_retailprice AS DECIMAL(9,2)) * CAST(0.6 AS DECIMAL(3,2))"
    " * CAST(l_quantity AS DECIMAL(9,2)) AS DECIMAL(18,6))"
)


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
             {SQL_DISC_PRICE} - {_SYNTH_COST} AS amount
      FROM lineitem JOIN part ON l_partkey = p_partkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN orders ON l_orderkey = o_orderkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%a%'
    ) profit GROUP BY n_name, o_year ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation × order year. No partsupp, so
    supply cost is synthesized as 60% of retail price × quantity — exact
    decimal arithmetic end to end, preserving the defining shape: a 5-way
    join fanning lineitem out to part/supplier/orders/nation with a LIKE
    filter on part, rolled up on two dimensions. nation broadcasts; the
    other joins shuffle on their keys; the (25 nations × ~7 years) group-by
    is map-side partial."""
    t = load_tables(spark, sf_dir)
    cost = (
        F.col("p_retailprice").cast("decimal(9,2)")
        * F.lit(0.6).cast("decimal(3,2)")
        * F.col("l_quantity").cast("decimal(9,2)")
    ).cast(DEC)
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_name").like("%a%")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (disc_price() - cost).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q11_FRACTION = 0.0007


@query(
    "tpch_q11_value_share",
    oracle=f"""
    WITH pv AS (SELECT l_partkey, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS value
                FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, value FROM pv
    WHERE value > (SELECT CAST(SUM(CAST(value AS {SQL_DEC})) AS DOUBLE) * {Q11_FRACTION}
                   FROM pv)
    ORDER BY value DESC, l_partkey
    """,
    tags=("agg", "subquery", "tpch"),
)
def tpch_q11_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts carrying an outsized share of total value — a
    per-key aggregate filtered against a SCALAR of the same aggregate
    (HAVING value > fraction × Σvalue), re-based from partsupp stock value
    to lineitem revenue. The per-part table aggregates once; the global
    scalar re-aggregates its (part-cardinality) output and broadcasts —
    two aggregations, not two corpus scans; the value subtree is computed
    twice exactly as the SQL's CTE is referenced twice."""
    t = load_tables(spark, sf_dir)
    pv = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.sum(disc_price()).cast("double").alias("value"))
    )
    threshold = pv.agg(
        (F.sum(F.col("value").cast(DEC)).cast("double") * F.lit(Q11_FRACTION)).alias("_thr")
    )
    return (
        pv.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_thr"))
        .orderBy(F.desc("value"), "l_partkey")
        .select("l_partkey", "value")
    )


@query(
    "tpch_q16_supplier_counts",
    oracle="""
    SELECT p_brand, p_type,
           CASE WHEN p_size < 15 THEN 'small' ELSE 'large' END AS size_band,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      AND p_brand <> 'Brand#5'
    GROUP BY p_brand, p_type, CASE WHEN p_size < 15 THEN 'small' ELSE 'large' END
    ORDER BY supplier_cnt DESC, p_brand, p_type, size_band
    """,
    tags=("join", "agg", "anti", "tpch"),
)
def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct-supplier counts per part segment, excluding a
    NOT-IN supplier set (negative balances standing in for the complaint
    filter). NOT IN becomes a left-anti join (s_suppkey is non-null, so
    the two are equivalent); the distinct count shuffles on the group key
    with the supplier id as the distinct dimension."""
    t = load_tables(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    band = F.when(F.col("p_size") < 15, "small").otherwise("large")
    return (
        t["lineitem"]
        .join(
            t["part"].filter(
                F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
                & (F.col("p_brand") != "Brand#5")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", band.alias("size_band"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "size_band")
    )


@query(
    "tpch_q20_promo_suppliers",
    oracle="""
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
    ORDER BY s_name
    """,
    tags=("join", "semi", "subquery", "tpch"),
)
def tpch_q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: the nested-IN chain — suppliers IN (high-volume shippers
    of parts IN (PROMO parts)) over one shipping year. Each IN becomes a
    left-semi join: parts filter → semi into lineitem, the HAVING
    aggregate's survivors → semi into supplier. Date range pushes to the
    lineitem scan; every join is equi-keyed."""
    t = load_tables(spark, sf_dir)
    promo = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    big = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(promo, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_name")
        .select("s_name", "s_acctbal")
    )
