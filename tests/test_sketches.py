"""Sketch-family guarantees: error bounds vs exact ground truth,
determinism, and merge-equivalence — the properties that make mergeable
summaries safe to pre-aggregate at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.queries import sketches as SK
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def exact_users(spark):
    t = load_tables(spark, SF_ORACLE)
    per = {
        r["event_type"]: r["n"]
        for r in t["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    per["ALL"] = t["events"].agg(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    return per


def test_hll_rollup_within_error_bound(spark, exact_users):
    got = {
        r["event_type"]: r["approx_users"]
        for r in SK.x_sketch_distinct_rollup(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(exact_users)
    for k, exact in exact_users.items():
        # lgk=12 → RSE ≈ 1.04/sqrt(2^12) ≈ 1.6%; allow 4 sigma.
        assert got[k] == pytest.approx(exact, rel=0.065), k


def test_hll_union_equals_monolithic_build(spark):
    """Register-max merge means union-of-sketches ≡ single-pass sketch:
    the exact property that makes per-partition pre-aggregation safe."""
    t = load_tables(spark, SF_ORACLE)
    merged = (
        t["events"]
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(SK.HLL_LGK)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    mono = (
        t["events"]
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(SK.HLL_LGK))).alias("e"))
        .collect()[0]["e"]
    )
    assert merged == mono


def test_hll_deterministic(spark):
    a = SK.x_sketch_distinct_rollup(spark, SF_ORACLE).collect()
    b = SK.x_sketch_distinct_rollup(spark, SF_ORACLE).collect()
    assert a == b


def test_kll_quantiles_within_rank_error(spark):
    t = load_tables(spark, SF_ORACLE)
    rows = {r["o_orderstatus"]: r for r in SK.x_sketch_quantiles(spark, SF_ORACLE).collect()}
    for status, r in rows.items():
        vals = sorted(
            x["o_totalprice"]
            for x in t["orders"].filter(F.col("o_orderstatus") == status).collect()
        )
        n = len(vals)
        for p, est in ((0.5, r["p50"]), (0.9, r["p90"]), (0.99, r["p99"])):
            # k=200 → normalized rank error ~1.7%; allow 3% rank slack.
            lo = vals[max(0, int((p - 0.03) * n) - 1)]
            hi = vals[min(n - 1, int((p + 0.03) * n))]
            assert lo <= est <= hi, (status, p, est, lo, hi)


def test_theta_setops_bounds(spark, exact_users):
    got = {
        r["event_type"]: r["approx_users"]
        for r in SK.x_sketch_theta_setops(spark, SF_ORACLE).collect()
    }
    assert got["click"] == pytest.approx(exact_users["click"], rel=0.05)
    assert got["view"] == pytest.approx(exact_users["view"], rel=0.05)
    union = got["click∪view"]
    assert union <= got["click"] + got["view"]
    assert union >= max(got["click"], got["view"]) * 0.95
    # Inclusion-exclusion overlap must be plausible (≤ min single).
    overlap = got["click"] + got["view"] - union
    assert overlap <= min(got["click"], got["view"]) * 1.05


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """freqItems gives a no-false-negative superset; after the exact-count
    filter the result must EQUAL the brute-force answer."""
    t = load_tables(spark, SF_ORACLE)
    from python_cdc_postgres_to_clickhouse_spark.operators.textstats import tokens

    toks = t["documents"].select(F.explode(tokens()).alias("token"))
    n_total = toks.count()
    want = {
        (r["token"], r["n"])
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["n"] / n_total > SK.HH_SUPPORT
    }
    got = {(r["token"], r["n"]) for r in SK.x_heavy_hitters(spark, SF_ORACLE).collect()}
    assert got == want
    assert len(got) > 0


def _cms_tokens(spark):
    from python_cdc_postgres_to_clickhouse_spark.operators.textstats import tokens

    t = load_tables(spark, SF_ORACLE)
    return t["documents"].select(F.explode(tokens()).alias("token"))


def test_cms_deterministic_and_one_sided(spark):
    """Explicit seed ⇒ identical estimates across runs; CMS never
    underestimates, and overestimates by at most ε·N w.p. ≥ δ (all probes
    must respect the lower bound; the ε·N slack is per-probe)."""
    a = {r["token"]: r["est_n"] for r in SK.x_sketch_cms_freq(spark, SF_ORACLE).collect()}
    b = {r["token"]: r["est_n"] for r in SK.x_sketch_cms_freq(spark, SF_ORACLE).collect()}
    assert a == b
    assert set(a) == set(SK.CMS_PROBES)

    toks = _cms_tokens(spark)
    n_total = toks.count()
    exact = {
        r["token"]: r["n"]
        for r in toks.filter(F.col("token").isin(list(SK.CMS_PROBES)))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    slack = SK.CMS_EPS * n_total
    for p in SK.CMS_PROBES:
        want = exact.get(p, 0)
        assert a[p] >= want, (p, a[p], want)
        assert a[p] <= want + slack, (p, a[p], want, slack)


def test_cms_merge_equals_monolithic(spark):
    """CMS merge is counter-wise ADD — exact, so sketches built on disjoint
    halves and merged must give bit-identical estimates to one monolithic
    sketch (the property that lets partial aggregation BE the merge)."""
    toks = _cms_tokens(spark).withColumn(
        "half", (F.crc32(F.col("token")) % 2).cast("int")
    )
    agg = F.count_min_sketch(
        "token", F.lit(SK.CMS_EPS), F.lit(SK.CMS_CONF), F.lit(SK.CMS_SEED)
    ).alias("sk")
    jvm = spark._jvm
    halves = [
        jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(r["sk"]))
        for r in toks.groupBy("half").agg(agg).orderBy("half").collect()
    ]
    assert len(halves) == 2
    halves[0].mergeInPlace(halves[1])
    mono = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(toks.agg(agg).collect()[0]["sk"])
    )
    for p in SK.CMS_PROBES:
        assert halves[0].estimateCount(p) == mono.estimateCount(p), p
