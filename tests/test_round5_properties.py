"""Round-5 operator invariants: per-source caps, quality gating, mixture
weights, n-gram novelty — properties that must hold for ANY corpus, checked
on the fixtures."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.queries.corpusops import (
    SOURCE_CAP_K,
    x_mixture_weights,
    x_ngram_novelty,
    x_source_cap,
)
from python_cdc_postgres_to_clickhouse_spark.queries.extensions import (
    x_quality_gate_per_lang,
)
from python_cdc_postgres_to_clickhouse_spark.operators import dedup as D
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_SMOKE


def test_source_cap_invariants(spark):
    rows = x_source_cap(spark, SF_SMOKE).collect()
    per_source: dict = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["rk"])
    docs = load_tables(spark, SF_SMOKE)["documents"]
    n_per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, rks in per_source.items():
        # At most K kept, exactly min(K, available), ranks are 1..k dense.
        assert len(rks) == min(SOURCE_CAP_K, n_per_source[src]), src
        assert sorted(rks) == list(range(1, len(rks) + 1)), src
    # Deterministic: a second run keeps the identical doc set.
    again = {(r["doc_id"], r["source"]) for r in x_source_cap(spark, SF_SMOKE).collect()}
    assert again == {(r["doc_id"], r["source"]) for r in rows}


def test_quality_gate_keeps_at_least_upper_half(spark):
    """The gate keeps everything at/above the rank-⌈n/2⌉ value: at least
    n - ⌈n/2⌉ + 1 docs per language (ties only ADD)."""
    for r in x_quality_gate_per_lang(spark, SF_SMOKE).collect():
        n, kept = r["n_docs"], r["n_kept"]
        assert kept >= n - math.ceil(0.5 * n) + 1, r
        assert kept <= n
        assert 0.0 <= r["med_quality"] <= 1.0


def test_mixture_weights_invariants(spark):
    rows = x_mixture_weights(spark, SF_SMOKE).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    uniform = 1.0 / len(rows)
    for r in rows:
        assert 0.0 < r["sampling_rate"] <= 1.0, r
        # Sources at or below the uniform share are kept whole.
        if r["share"] <= uniform:
            assert r["sampling_rate"] == 1.0, r


def test_ngram_novelty_first_occurrences_partition_the_dictionary(spark):
    """Each distinct shingle's first occurrence is counted exactly once, so
    Σ n_novel == |distinct shingles| and every ratio is in (0, 1]."""
    rows = x_ngram_novelty(spark, SF_SMOKE).collect()
    docs = load_tables(spark, SF_SMOKE)["documents"]
    n_distinct = (
        docs.select(F.explode(D.shingles(shingle=3)).alias("s"))
        .select("s")
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == n_distinct
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"], r
        assert 0.0 <= r["novelty"] <= 1.0, r
    # The first document (min doc_id) is all-novel by definition.
    first_doc = min(r["doc"] for r in rows)
    first = next(r for r in rows if r["doc"] == first_doc)
    assert first["novelty"] == 1.0


def test_weighted_sample_matches_numpy_replay(spark):
    """Independent A-Res replay: recompute ln(u)/w keys in Python from the
    same salted-md5 uniforms and check the engine picked exactly the
    top-50 — validates the keying math end to end."""
    import hashlib
    import math as m

    from python_cdc_postgres_to_clickhouse_spark.queries.behavior import (
        x_weighted_sample,
    )

    docs = load_tables(spark, SF_SMOKE)["documents"].select("doc_id", "n_chars").collect()
    keys = {}
    for r in docs:
        h = int(hashlib.md5(f"wsamp{r['doc_id']}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        keys[r["doc_id"]] = m.log(u) / r["n_chars"]
    expect = {d for d, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:50]}
    got = {r["doc_id"] for r in x_weighted_sample(spark, SF_SMOKE).collect()}
    assert got == expect


def test_funnel_counts_monotone_nonincreasing(spark):
    from python_cdc_postgres_to_clickhouse_spark.queries.behavior import (
        x_funnel_steps,
    )

    r = x_funnel_steps(spark, SF_SMOKE).collect()[0]
    assert r["users_signup"] >= r["users_viewed"] >= r["users_purchased"] >= 0
    assert 0.0 <= r["view_rate"] <= 1.0 and 0.0 <= r["purchase_rate"] <= 1.0


def test_gap_fill_spine_is_contiguous_and_preserves_observations(spark):
    """Per user: one row per calendar day between first and last active day
    (no gaps, no dupes); every observed day keeps its own value; filled
    days carry the previous observed value forward."""
    from python_cdc_postgres_to_clickhouse_spark.queries.behavior import (
        x_gap_fill_locf,
    )

    rows = x_gap_fill_locf(spark, SF_SMOKE).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for _u, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        days = [r["day"] for r in rs]
        assert len(set(days)) == len(days)
        assert (days[-1] - days[0]).days == len(days) - 1, "spine has gaps"
        assert rs[0]["is_observed"], "first spine day must be observed"
        last = None
        for r in rs:
            if r["is_observed"]:
                last = r["value_filled"]
            else:
                assert r["value_filled"] == last, "LOCF must carry last value"


def test_bloom_decontaminate_bounds_exact(spark):
    """Bloom flags are a superset of exact contamination per doc (no false
    negatives) and the global false-positive overshoot is small."""
    from python_cdc_postgres_to_clickhouse_spark.queries.corpusops import (
        x_bloom_decontaminate,
        x_decontaminate,
    )

    exact = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in x_decontaminate(spark, SF_SMOKE).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged_shingles"]
        for r in x_bloom_decontaminate(spark, SF_SMOKE).collect()
    }
    # One-sided: every exactly-shared shingle must be flagged.
    for doc, n in exact.items():
        assert bloom.get(doc, 0) >= n, doc
    # FP overshoot bounded (1 Mbit for a fixture-sized set → near-zero FPP).
    overshoot = sum(bloom.values()) - sum(exact.values())
    assert overshoot <= max(5, 0.01 * sum(exact.values())), overshoot
    # Deterministic (bitwise-OR merge is partitioning-independent).
    again = {
        r["doc_id"]: r["n_flagged_shingles"]
        for r in x_bloom_decontaminate(spark, SF_SMOKE).collect()
    }
    assert again == bloom
