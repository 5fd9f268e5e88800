"""Dedup accuracy: MinHash/SimHash approximate paths vs exact ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.operators import dedup as D
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE


def _docs(spark):
    return load_tables(spark, SF_ORACLE)["documents"]


def test_exact_dedup_reduces_and_is_stable(spark):
    docs = _docs(spark)
    deduped = D.dedup_exact(docs)
    n, nd = docs.count(), deduped.count()
    assert nd <= n
    # Representatives are the min doc_id of each group → deterministic.
    again = D.dedup_exact(docs)
    assert sorted(r["doc_id"] for r in deduped.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in again.select("doc_id").collect()
    )


def test_minhash_recall_and_precision(spark):
    docs = _docs(spark)
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in D.jaccard_pairs(docs, threshold=0.6).collect()
    }
    approx = {
        (r["a"], r["b"]): r["jaccard"]
        for r in D.minhash_near_duplicates(docs, threshold=0.6).collect()
    }
    assert len(exact) > 0, "fixture should contain near-duplicates"
    # Precision is 1 by construction (candidates re-verified exactly).
    assert set(approx) <= set(exact)
    recall = len(approx) / len(exact)
    # Planted pairs have shingle-J ≈ 0.95+: band hit prob ≈ J², 8 bands →
    # recall ≈ 1 − (1−J²)⁸ ≈ 1.
    assert recall >= 0.9, f"minhash recall {recall:.2f} over {len(exact)} pairs"
    # Verified Jaccard values must agree exactly with the ground truth.
    for pair, j in approx.items():
        assert abs(j - exact[pair]) < 1e-12


def test_minhash_candidates_subquadratic(spark):
    docs = _docs(spark)
    n = docs.count()
    n_cand = D.minhash_candidates(docs).count()
    assert n_cand < n * 20, "candidate set should be far below n²"


def test_simhash_flags_near_identical_docs(spark):
    docs = _docs(spark)
    exact = D.jaccard_pairs(docs, threshold=0.9)
    high_pairs = {(r["a"], r["b"]) for r in exact.collect()}
    assert high_pairs, "fixture should contain ≥0.9-shingle-Jaccard pairs"
    # Near-identical docs land at Hamming 0-1 on a 16-bit simhash; this
    # tiny-vocabulary corpus pushes unrelated pairs to 2+ bits (measured),
    # so the radius-1 ball is the discriminative setting here.
    sim = {
        (r["a"], r["b"])
        for r in D.simhash_near_duplicates(docs, max_hamming=1).collect()
    }
    hit = len(sim & high_pairs) / len(high_pairs)
    assert hit >= 0.5, f"simhash caught {hit:.2f} of ≥0.9-Jaccard pairs"
    # And simhash shouldn't fire on everything.
    n = docs.count()
    assert len(sim) < n * n / 25


def test_jaccard_strategies_agree(spark):
    """Prefix filtering (PPJoin candidates + exact verify) must produce the
    identical pair set, counts, and similarities as the postings join —
    the strategy is a physical-plan choice, not a semantic one."""
    docs = _docs(spark)
    post = {
        (r["a"], r["b"]): (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
        for r in D.jaccard_pairs(docs, threshold=0.6, strategy="postings").collect()
    }
    pref = {
        (r["a"], r["b"]): (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
        for r in D.jaccard_pairs(docs, threshold=0.6, strategy="prefix").collect()
    }
    assert post == pref
    assert len(post) > 0


def test_jaccard_strategies_agree_at_exact_threshold_boundary(spark):
    """Double-rounding regression: threshold=0.1 with |a|=3, |b|=30 shingles
    and a ⊂ b gives jaccard == 0.1 exactly — accepted by the final filter,
    but 0.1*30 rounds to 3.0000000000000004 in doubles, so an un-relaxed
    size band (and the un-relaxed prefix-length ceil) silently drops the
    pair in prefix mode only. Both strategies must keep it."""
    # n tokens, all distinct → n-2 distinct 3-gram shingles.
    toks_b = [f"w{i}" for i in range(32)]   # 30 shingles
    toks_a = toks_b[:5]                     # 3 shingles, all common
    docs = spark.createDataFrame(
        [("a", " ".join(toks_a)), ("b", " ".join(toks_b))], "doc_id string, text string"
    )
    for strategy in ("postings", "prefix"):
        rows = D.jaccard_pairs(docs, threshold=0.1, strategy=strategy).collect()
        assert len(rows) == 1, f"{strategy} lost the boundary pair"
        r = rows[0]
        assert (r["n_common"], r["n_a"], r["n_b"]) == (3, 3, 30)
        assert r["jaccard"] == 0.1
