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
