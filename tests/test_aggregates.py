"""Non-oracle aggregate checks: approx_count_distinct error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.registry import all_queries
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


def test_approx_quantiles_near_exact(spark):
    spec = all_queries()["a_approx_quantiles"]
    approx = {r["o_orderstatus"]: r["p50"] for r in spec.fn(spark, SF_ORACLE).collect()}
    t = load_tables(spark, SF_ORACLE)
    exact = {
        r["o_orderstatus"]: r["m"]
        for r in t["orders"]
        .groupBy("o_orderstatus")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    for status, p50 in approx.items():
        assert abs(p50 - exact[status]) / exact[status] < 0.02, (status, p50, exact[status])


def test_approx_distinct_within_rsd(spark):
    spec = all_queries()["a_approx_distinct"]
    approx = {
        r["l_returnflag"]: (r["approx_orders"], r["approx_parts"])
        for r in spec.fn(spark, SF_ORACLE).collect()
    }
    t = load_tables(spark, SF_ORACLE)
    exact = {
        r["l_returnflag"]: (r["n_orders"], r["n_parts"])
        for r in t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, (ao, ap) in approx.items():
        eo, ep = exact[flag]
        # rsd=0.01 → generous 5% acceptance band.
        assert abs(ao - eo) / eo < 0.05, (flag, ao, eo)
        assert abs(ap - ep) / ep < 0.05, (flag, ap, ep)
