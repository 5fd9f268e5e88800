"""Set-operation surface (SURVEY.md §2.4): union all/distinct, intersect,
except, except all.

UNION ALL is shuffle-free in Spark (plan concatenation); DISTINCT/INTERSECT/
EXCEPT shuffle on the full row — at 100 TB project to the minimal column set
first (as done here) so the shuffle carries only the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables


@query(
    "s_union_all",
    oracle="""
    SELECT src, COUNT(*) AS n FROM (
      SELECT 'urgent' AS src, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT 'filled' AS src, o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) u GROUP BY src
    """,
    tags=("setop",),
)
def s_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (bag union)."""
    t = load_tables(spark, sf_dir)
    urgent = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.lit("urgent").alias("src"), "o_custkey")
    )
    filled = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select(F.lit("filled").alias("src"), "o_custkey")
    )
    return urgent.unionByName(filled).groupBy("src").agg(F.count(F.lit(1)).alias("n"))


@query(
    "s_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    tags=("setop",),
)
def s_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) de-duplicates across both inputs."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = t["orders"].filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.unionByName(b).distinct()


@query(
    "s_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def s_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both a filled and an open order."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@query(
    "s_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def s_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: bag intersection (min multiplicity per value)."""
    t = load_tables(spark, sf_dir)
    return t["customer"].select(F.col("c_nationkey").alias("nationkey")).intersectAll(
        t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "s_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    tags=("setop",),
)
def s_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers never appearing in orders."""
    t = load_tables(spark, sf_dir)
    return t["customer"].select("c_custkey").subtract(
        t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    )


@query(
    "s_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def s_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference preserves multiplicity."""
    t = load_tables(spark, sf_dir)
    return t["customer"].select(F.col("c_nationkey").alias("nationkey")).exceptAll(
        t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    )
