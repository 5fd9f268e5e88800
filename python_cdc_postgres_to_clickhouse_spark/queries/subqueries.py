"""Subquery surface (SURVEY.md §2.4): scalar, IN, correlated EXISTS.

Declared through ``spark.sql`` in the shared ANSI dialect — Catalyst
decorrelates the correlated forms into joins (RewriteCorrelatedScalarQuery /
RewritePredicateSubquery), so the physical plans are the same joins the
DataFrame API would produce; no driver-side iteration anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import load_tables

SUB_SCALAR = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 3 * (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE)
  FROM orders)
"""


@query("sub_scalar_avg", oracle=SUB_SCALAR, tags=("subquery",))
def sub_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders 3× above the average price."""
    load_tables(spark, sf_dir)
    return spark.sql(SUB_SCALAR)


SUB_IN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
  AND c_mktsegment <> 'AUTOMOBILE'
"""


@query("sub_in", oracle=SUB_IN, tags=("subquery",))
def sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelated to a left-semi join by Catalyst)."""
    load_tables(spark, sf_dir)
    return spark.sql(SUB_IN)


SUB_EXISTS = """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey AND l_quantity > 45)
"""


@query("sub_exists_correlated", oracle=SUB_EXISTS, tags=("subquery",))
def sub_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an extra predicate."""
    load_tables(spark, sf_dir)
    return spark.sql(SUB_EXISTS)


SUB_NOT_EXISTS = """
SELECT p_partkey, p_name
FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


@query("sub_not_exists", oracle=SUB_NOT_EXISTS, tags=("subquery",))
def sub_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join via NOT EXISTS: parts never ordered."""
    load_tables(spark, sf_dir)
    return spark.sql(SUB_NOT_EXISTS)


MIN_PRICE_SUPPLIER = """
SELECT p.p_partkey, p.p_name, s.s_name, l.l_extendedprice AS min_price
FROM part p, supplier s, lineitem l
WHERE l.l_partkey = p.p_partkey
  AND l.l_suppkey = s.s_suppkey
  AND p.p_partkey % 20 = 0
  AND l.l_extendedprice = (
    SELECT min(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey)
"""


@query("sub_min_price_supplier", oracle=MIN_PRICE_SUPPLIER, tags=("subquery",))
def sub_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: correlated scalar subquery in a join predicate —
    'the supplier of each part's cheapest line'. Catalyst decorrelates the
    min-subquery into an aggregate join; ties (several lines at the min
    price) yield multiple rows identically on both engines."""
    load_tables(spark, sf_dir)
    return spark.sql(MIN_PRICE_SUPPLIER)


SMALL_QTY_REVENUE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#11'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey)
"""


@query("sub_small_qty_revenue", oracle=SMALL_QTY_REVENUE, tags=("subquery",))
def sub_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 pattern: per-part average threshold from a correlated
    subquery gating the outer aggregate. The inner avg(double) is safe
    here because quantities are integral — integer-valued doubles sum
    exactly in FP, so both engines compute the identical threshold."""
    load_tables(spark, sf_dir)
    return spark.sql(SMALL_QTY_REVENUE)


SUB_CORR_SCALAR = """
SELECT c_custkey,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
       (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
FROM customer
WHERE c_custkey % 3 = 0
"""


@query("sub_correlated_scalar", oracle=SUB_CORR_SCALAR, tags=("subquery",))
def sub_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list."""
    load_tables(spark, sf_dir)
    return spark.sql(SUB_CORR_SCALAR)
