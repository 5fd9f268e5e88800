"""Map-combinator aggregation (sumMap/minMap/maxMap analog): python-dict
oracle parity, sparse-key semantics, partial aggregation, and JVM purity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark import plans as P
from python_cdc_postgres_to_clickhouse_spark.operators.mapagg import map_agg, sum_map

ROWS = [
    ("h1", {"200": 3, "404": 1}),
    ("h1", {"200": 2, "500": 7}),
    ("h2", {"404": 5}),
    ("h2", {}),
    ("h1", {"404": 4}),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "host: string, codes: map<string, long>")


def _oracle(agg):
    import collections

    acc: dict[str, dict[str, list]] = collections.defaultdict(
        lambda: collections.defaultdict(list)
    )
    for host, m in ROWS:
        for k, v in m.items():
            acc[host][k].append(v)
    f = {"sum": sum, "min": min, "max": max}[agg]
    return {h: {k: f(vs) for k, vs in km.items()} for h, km in acc.items()}


@pytest.mark.parametrize("agg", ["sum", "min", "max"])
def test_map_agg_matches_python_oracle(spark, agg):
    got = {
        r["host"]: dict(r[f"{agg}_map"])
        for r in map_agg(_df(spark), ["host"], "codes", agg).collect()
    }
    assert got == _oracle(agg)


def test_sum_map_sparse_keys_contribute_nothing(spark):
    """An empty map row affects no key; keys appear iff some row carried
    them — the combinator's sparse-dictionary semantics."""
    got = {r["host"]: dict(r["sum_map"]) for r in sum_map(_df(spark), ["host"], "codes").collect()}
    assert got["h2"] == {"404": 5}


def test_map_agg_partial_aggregates_and_stays_jvm(spark):
    df = sum_map(_df(spark), ["host"], "codes")
    assert P.has_partial_aggregate(df)
    plan = P.physical_plan(df)
    assert "EvalPython" not in plan, plan


def test_map_agg_rejects_unknown_agg(spark):
    with pytest.raises(ValueError):
        map_agg(_df(spark), ["host"], "codes", "median")


def test_map_agg_multi_equals_individual_combinators(spark):
    from python_cdc_postgres_to_clickhouse_spark.operators.mapagg import map_agg_multi

    multi = {
        r["host"]: (dict(r["sum_map"]), dict(r["min_map"]), dict(r["max_map"]))
        for r in map_agg_multi(_df(spark), ["host"], "codes").collect()
    }
    for agg, idx in (("sum", 0), ("min", 1), ("max", 2)):
        single = {
            r["host"]: dict(r[f"{agg}_map"])
            for r in map_agg(_df(spark), ["host"], "codes", agg).collect()
        }
        assert {h: t[idx] for h, t in multi.items()} == single


def test_map_agg_multi_rejects_unknown_agg(spark):
    from python_cdc_postgres_to_clickhouse_spark.operators.mapagg import map_agg_multi

    with pytest.raises(ValueError, match="aggs must be among"):
        map_agg_multi(_df(spark), ["host"], "codes", aggs=("sum", "median"))
