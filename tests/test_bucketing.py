"""Bucketed co-located joins (shuffle-free, asserted in the physical plan)
and salted-join result parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark import plans as P
from python_cdc_postgres_to_clickhouse_spark.operators.skew import salted_join
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    """orders + lineitem written bucketed on the join key (the cluster
    pattern: pay the shuffle once at write time, join shuffle-free
    forever after). Uses the default ./spark-warehouse dir —
    spark.sql.warehouse.dir is a static conf and cannot be pointed at a
    tmpdir on a live session."""
    t = load_tables(spark, SF_ORACLE)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    # Disable auto-broadcast so the join strategy is sort-merge — the
    # bucket layout must then eliminate both Exchange nodes.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = P.physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # Same join on the unbucketed parquet DOES shuffle (the control).
        t = load_tables(spark, SF_ORACLE)
        plain = t["lineitem"].join(
            t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert "Exchange" in P.physical_plan(plain)
        # And the result matches the plain join.
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_matches_plain_join(spark):
    t = load_tables(spark, SF_ORACLE)
    li = t["lineitem"].select("l_orderkey", "l_quantity")
    orders = t["orders"].select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r["o_orderstatus"], r["n"]) for r in plain.collect()} == {
        (r["o_orderstatus"], r["n"]) for r in salted.collect()
    }
