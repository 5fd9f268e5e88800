"""§2.6 UDTF + grouped-agg UDAF contracts."""

from __future__ import annotations

import numpy as np
import pytest

from python_cdc_postgres_to_clickhouse_spark.operators import udxf
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_SMOKE


def test_udtf_chunking_matches_python_split(spark):
    t = load_tables(spark, SF_SMOKE)
    docs = t["documents"].limit(50)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk"], r["n_tokens"])
        for r in udxf.chunk_documents(docs, chunk_tokens=16).collect()
    }
    want = {}
    for r in docs.collect():
        toks = r["text"].split()
        for i in range(0, max(len(toks), 1), 16):
            win = toks[i : i + 16]
            want[(r["doc_id"], i // 16)] = (" ".join(win), len(win))
    assert got == want
    assert len(got) > 50  # multi-row expansion actually happened


def test_udtf_null_text_yields_no_rows(spark):
    df = spark.createDataFrame([(1, None), (2, "a b c")], "doc_id long, text string")
    rows = udxf.chunk_documents(df, chunk_tokens=2).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_udtf_plans_as_generator_not_driver_loop(spark):
    t = load_tables(spark, SF_SMOKE)
    plan = (
        udxf.chunk_documents(t["documents"], 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" in plan or "Generate" in plan or "LateralJoin" in plan


def test_weighted_mean_udaf_matches_builtin(spark):
    t = load_tables(spark, SF_SMOKE)
    from pyspark.sql import functions as F

    got = {
        r["l_returnflag"]: r["weighted_discount"]
        for r in udxf.revenue_weighted_discount(t["lineitem"]).collect()
    }
    want = {
        r["l_returnflag"]: r["w"]
        for r in t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_discount") * F.col("l_extendedprice"))
                / F.sum("l_extendedprice")
            ).alias("w")
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
        assert np.isfinite(got[k])
