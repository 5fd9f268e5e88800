"""Property-based contracts for round-4 operators (hypothesis over local
Python mirrors + Spark spot-checks): passage dedup invariants, PMI lift
algebra, JL projection linearity."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.queries.corpusops import (
    PASSAGE_TOKENS,
    x_passage_dedup,
    x_pmi_pairs,
)
from python_cdc_postgres_to_clickhouse_spark.queries.embeddings import (
    EMB_DIM,
    PROJ_DIM,
    projection_sign,
)
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# Passage dedup: pure-Python mirror of the keep-first semantics.
# ---------------------------------------------------------------------------


def _mirror_passage_dedup(texts: list[str], k: int = PASSAGE_TOKENS):
    seen: set[str] = set()
    out = {}
    for doc_id, text in enumerate(texts):
        toks = " ".join(text.lower().split()).split(" ")
        chunks = [" ".join(toks[i : i + k]) for i in range(0, max(len(toks), 1), k)]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        out[doc_id] = (len(chunks), len(kept), kept)
    return out


@given(
    st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=1, max_size=40)
        .map(" ".join),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_passage_dedup_mirror_invariants(texts):
    """Invariants of keep-first passage dedup on arbitrary corpora: kept ≤
    total; first doc keeps everything; total kept chunks = number of
    globally distinct chunks; replay of the kept text contains no chunk
    twice."""
    res = _mirror_passage_dedup(texts, k=3)
    all_kept: list[str] = []
    for doc_id, (n_chunks, n_kept, kept) in res.items():
        assert 0 <= n_kept <= n_chunks
        all_kept.extend(kept)
    assert len(all_kept) == len(set(all_kept))
    first_doc = res[0]
    toks0 = " ".join(texts[0].lower().split()).split(" ")
    own_distinct = []
    seen0: set[str] = set()
    for i in range(0, max(len(toks0), 1), 3):
        c = " ".join(toks0[i : i + 3])
        if c not in seen0:
            seen0.add(c)
            own_distinct.append(c)
    # Doc 0 keeps exactly its own first occurrences.
    assert first_doc[1] == len(own_distinct)


def test_passage_dedup_spark_matches_mirror(spark):
    """The distributed keep-first must equal the sequential mirror on the
    real fixtures — global (doc_id, chunk_idx) order is what the window
    encodes."""
    docs = load_tables(spark, SF_SMOKE)["documents"]
    texts = [
        r["text"] for r in docs.orderBy("doc_id").select("text").collect()
    ]
    mirror = _mirror_passage_dedup(texts)
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["cleaned_md5"])
        for r in x_passage_dedup(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(mirror)
    for doc_id, (n_chunks, n_kept, kept) in mirror.items():
        g = got[doc_id]
        assert g[0] == n_chunks, doc_id
        assert g[1] == n_kept, doc_id
        want_md5 = hashlib.md5(" ".join(kept).encode()).hexdigest() if kept else None
        assert g[2] == want_md5, doc_id


# ---------------------------------------------------------------------------
# PMI lift algebra.
# ---------------------------------------------------------------------------


def test_pmi_lift_is_consistent_with_counts(spark):
    """lift must equal the declared rational expression of the returned
    counts and the corpus totals — recomputed independently from the
    fixture tokens."""
    rows = x_pmi_pairs(spark, SF_SMOKE).collect()
    docs = load_tables(spark, SF_SMOKE)["documents"]
    toks = [
        r["text"].lower().split()
        for r in docs.select("text").collect()
    ]
    n_total = sum(len(t) for t in toks)
    from collections import Counter

    uni = Counter(tok for t in toks for tok in t)
    pair_total = sum(
        max(0, min(len(t) - 1 - i, 4))
        for t in toks
        for i in range(len(t))
    )
    for r in rows:
        want = (
            float(r["n_pair"]) * float(n_total) * float(n_total)
            / float(pair_total)
            / float(uni[r["tok_a"]])
            / float(uni[r["tok_b"]])
        )
        assert r["lift"] == pytest.approx(want, rel=1e-12), (r["tok_a"], r["tok_b"])


# ---------------------------------------------------------------------------
# JL projection linearity: P(ax + by) == a·P(x) + b·P(y).
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=-5, max_value=5),
    st.integers(min_value=-5, max_value=5),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_projection_is_linear(a, b, seed):
    rng = np.random.RandomState(seed)
    S = np.array(
        [[projection_sign(j, i) for i in range(EMB_DIM)] for j in range(PROJ_DIM)]
    ) / np.sqrt(PROJ_DIM)
    x, y = rng.randn(EMB_DIM), rng.randn(EMB_DIM)
    np.testing.assert_allclose(S @ (a * x + b * y), a * (S @ x) + b * (S @ y), atol=1e-9)
    # Signs are genuinely ±1 and deterministic.
    assert set(np.unique(S * np.sqrt(PROJ_DIM))) <= {-1.0, 1.0}
