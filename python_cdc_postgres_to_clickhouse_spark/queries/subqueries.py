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
