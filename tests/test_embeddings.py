"""Embedding transform operators: JL projection quality + k-means replay.

The projection's value parity vs DuckDB is covered by the oracle harness
(test_queries_oracle). Here: the *geometry* claims — distance preservation
for the projection, and for k-means that the distributed assignment pass
reproduces exactly what numpy computes from the same trained centroids.
"""

from __future__ import annotations

import numpy as np
import pytest

from python_cdc_postgres_to_clickhouse_spark.operators.similarity import (
    train_ivf_centroids,
)
from python_cdc_postgres_to_clickhouse_spark.queries.embeddings import (
    EMB_DIM,
    KMEANS_K,
    KMEANS_SEED,
    PROJ_DIM,
    projection_sign,
    x_kmeans_embed,
    x_random_projection,
)
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_SMOKE


def _sign_matrix() -> np.ndarray:
    return np.array(
        [[projection_sign(j, i) for i in range(EMB_DIM)] for j in range(PROJ_DIM)]
    )


def test_projection_matches_numpy(spark):
    rows = x_random_projection(spark, SF_SMOKE).orderBy("vec_id").collect()
    emb = (
        load_tables(spark, SF_SMOKE)["embeddings"]
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    S = _sign_matrix() / np.sqrt(PROJ_DIM)
    for got, src in zip(rows[:50], emb[:50]):
        assert got["vec_id"] == src["vec_id"]
        want = S @ np.array(src["embedding"], dtype=np.float64)
        have = np.array([got[f"p{j}"] for j in range(PROJ_DIM)])
        np.testing.assert_allclose(have, want, rtol=1e-12)


def test_projection_preserves_distances_on_average(spark):
    """JL in expectation: E[||Px - Py||^2] = ||x - y||^2 for the ±1/sqrt(d')
    sign construction. With d'=8 individual pairs fluctuate, so assert the
    mean ratio over many pairs is near 1 — the actual lemma-level claim."""
    rows = x_random_projection(spark, SF_SMOKE).orderBy("vec_id").limit(80).collect()
    emb = (
        load_tables(spark, SF_SMOKE)["embeddings"]
        .orderBy("vec_id")
        .limit(80)
        .collect()
    )
    P = np.array([[r[f"p{j}"] for j in range(PROJ_DIM)] for r in rows])
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    rng = np.random.RandomState(0)
    ratios = []
    for _ in range(300):
        a, b = rng.choice(len(X), 2, replace=False)
        orig = np.sum((X[a] - X[b]) ** 2)
        if orig < 1e-9:
            continue
        ratios.append(np.sum((P[a] - P[b]) ** 2) / orig)
    assert 0.75 < float(np.mean(ratios)) < 1.25


def test_kmeans_matches_numpy_replay(spark):
    """The distributed pass must equal a driver-side numpy replay: same
    centroids (training is deterministic), same argmax assignment, same
    cluster sizes."""
    t = load_tables(spark, SF_SMOKE)
    emb = t["embeddings"]
    C = train_ivf_centroids(
        emb, n_centroids=KMEANS_K, seed=KMEANS_SEED, id_col="vec_id"
    )
    X = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    want_sizes = np.bincount(np.argmax(Xn @ C.T, axis=1), minlength=KMEANS_K)

    rows = x_kmeans_embed(spark, SF_SMOKE).collect()
    got = {r["cluster_id"]: r["n_vectors"] for r in rows}
    for j in range(KMEANS_K):
        assert got.get(j, 0) == want_sizes[j], j
    assert sum(got.values()) == len(X)

    # mean_cos_to_centroid must be the actual mean cosine between members
    # and their ASSIGNED centroid (ADVICE round-4: the column previously
    # held mean vector norm).
    assign = np.argmax(Xn @ C.T, axis=1)
    cos_all = np.einsum("ij,ij->i", Xn, C[assign] / np.maximum(
        np.linalg.norm(C[assign], axis=1, keepdims=True), 1e-12))
    got_cos = {r["cluster_id"]: r["mean_cos_to_centroid"] for r in rows}
    for j in range(KMEANS_K):
        if want_sizes[j]:
            want = float(np.mean(cos_all[assign == j]))
            # round-12: per-row cosines are floored to the 2^-30 grid
            # before averaging (full-oracle exactness), shifting the mean
            # down by < 2^-30 vs the unquantized numpy value.
            assert -2e-9 < got_cos[j] - want < 1e-12, j


def test_kmeans_deterministic_across_runs(spark):
    a = sorted(map(tuple, x_kmeans_embed(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, x_kmeans_embed(spark, SF_SMOKE).collect()))
    assert a == b


def test_kmeans_clusters_tighter_than_random(spark):
    """Fitted centroids must beat a random-split baseline on within-cluster
    cosine (i.e. training actually moved the centroids)."""
    t = load_tables(spark, SF_SMOKE)
    X = np.array(
        [r["embedding"] for r in t["embeddings"].collect()], dtype=np.float64
    )
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = train_ivf_centroids(t["embeddings"], n_centroids=KMEANS_K, seed=KMEANS_SEED)
    fitted = float(np.mean(np.max(Xn @ C.T, axis=1)))

    rng = np.random.RandomState(0)
    rand_assign = rng.randint(0, KMEANS_K, len(Xn))
    R = np.array(
        [
            Xn[rand_assign == j].mean(axis=0)
            if np.any(rand_assign == j)
            else Xn[0]
            for j in range(KMEANS_K)
        ]
    )
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)
    random_baseline = float(
        np.mean([Xn[i] @ R[rand_assign[i]] for i in range(len(Xn))])
    )
    assert fitted > random_baseline + 0.05


# ---------------------------------------------------------------------------
# Product quantization (operators/pq.py + x_pq_codes)
# ---------------------------------------------------------------------------


def _pq_fixture(spark):
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    from .conftest import SF_ORACLE

    return load_tables(spark, SF_ORACLE)["embeddings"]


def test_pq_assign_matches_numpy_replay(spark):
    import numpy as np

    from python_cdc_postgres_to_clickhouse_spark.operators.pq import (
        pq_assign,
        train_pq_codebooks,
    )

    emb = _pq_fixture(spark)
    books = train_pq_codebooks(emb, m=8, k=16, seed=11)
    got = {
        r["vec_id"]: (list(r["codes"]), r["sq_err"])
        for r in pq_assign(emb, books).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    m, k, dsub = books.shape
    for r in rows:
        x = np.array(r["embedding"], dtype=np.float64)
        codes = []
        err = 0.0
        for j in range(m):
            s = x[j * dsub : (j + 1) * dsub]
            d2 = ((books[j] - s) ** 2).sum(axis=1)
            a = int(d2.argmin())
            codes.append(a)
            err += float(d2[a])
        g_codes, g_err = got[r["vec_id"]]
        assert g_codes == codes
        assert abs(g_err - err) < 1e-9 * max(1.0, err)


def test_pq_training_is_deterministic(spark):
    import numpy as np

    from python_cdc_postgres_to_clickhouse_spark.operators.pq import train_pq_codebooks

    emb = _pq_fixture(spark)
    b1 = train_pq_codebooks(emb, m=8, k=16, seed=11)
    b2 = train_pq_codebooks(emb, m=8, k=16, seed=11)
    assert np.array_equal(b1, b2)


def test_pq_beats_rank0_quantizer(spark):
    """Trained codebooks must reconstruct strictly better than collapsing
    each subspace to its single mean (the k=1 'quantizer') — the minimal
    claim that training learned anything."""
    import numpy as np

    from python_cdc_postgres_to_clickhouse_spark.operators.pq import (
        pq_assign,
        train_pq_codebooks,
    )

    emb = _pq_fixture(spark)
    books = train_pq_codebooks(emb, m=8, k=16, seed=11)
    pq_mse = (
        pq_assign(emb, books).agg({"sq_err": "avg"}).collect()[0][0]
    )
    X = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    baseline = ((X - X.mean(axis=0)) ** 2).sum(axis=1).mean()
    assert pq_mse < baseline * 0.9


def test_pq_codes_query_shape(spark):
    from python_cdc_postgres_to_clickhouse_spark.registry import all_queries

    from .conftest import SF_ORACLE

    rows = all_queries()["x_pq_codes"].fn(spark, SF_ORACLE).collect()
    assert [r["subspace"] for r in rows] == list(range(8))
    for r in rows:
        assert 1 <= r["codes_used"] <= 16
        assert r["top_code_n"] <= r["n_vectors"]
        assert r["mean_sq_err"] >= 0.0


def test_pq_adc_topk_recall_and_exactness(spark):
    """ADC top-k over PQ codes: (a) the approximate distances equal a numpy
    ADC replay exactly; (b) recall@10 vs exact L2 clears a sane floor for
    16 codewords x 8 subspaces on the fixture."""
    import numpy as np
    from pyspark.sql import functions as F

    from python_cdc_postgres_to_clickhouse_spark.operators.pq import (
        pq_adc_topk,
        pq_assign,
        train_pq_codebooks,
    )

    emb = _pq_fixture(spark)
    books = train_pq_codebooks(emb, m=8, k=16, seed=11)
    codes = pq_assign(emb, books).select("vec_id", "codes")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = pq_adc_topk(codes, books, queries, k=10).collect()

    X = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in emb.select("vec_id", "embedding").collect()}
    code_map = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    m, K, dsub = books.shape

    def adc(qv, cs):
        return sum(
            float(((qv[j * dsub:(j + 1) * dsub] - books[j][cs[j]]) ** 2).sum())
            for j in range(m)
        )

    q_ids = [r["vec_id"] for r in queries.select("vec_id").collect()]
    # (a) distances replay bit-close (same float64 ops, different order tol).
    for r in got:
        expect = adc(X[r["query_id"]], code_map[r["neighbor_id"]])
        assert abs(r["approx_d2"] - expect) < 1e-9 * max(1.0, expect)
    # (b) recall@10 vs exact L2.
    hits = total = 0
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q in q_ids:
        d2 = {i: float(((X[q] - v) ** 2).sum()) for i, v in X.items()}
        exact = set(sorted(d2, key=lambda i: (d2[i], i))[:10])
        hits += len(exact & by_q[q])
        total += 10
    assert hits / total >= 0.35, f"ADC recall@10 {hits/total:.2f}"


def test_pq_adc_rerank_recovers_recall(spark):
    """ADC shortlist + exact re-rank (oversample=10) must push recall@10
    far above the raw-ADC floor (measured 0.91 on the fixture vs 0.40 raw)
    and every served distance must BE the exact L2."""
    import numpy as np
    from pyspark.sql import functions as F

    from python_cdc_postgres_to_clickhouse_spark.operators.pq import (
        pq_adc_rerank_topk,
        pq_assign,
        train_pq_codebooks,
    )

    emb = _pq_fixture(spark)
    books = train_pq_codebooks(emb, m=8, k=16, seed=11)
    codes = pq_assign(emb, books).select("vec_id", "codes")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = pq_adc_rerank_topk(codes, books, queries, emb, k=10, oversample=10).collect()

    X = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in emb.select("vec_id", "embedding").collect()}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        exact = float(((X[r["query_id"]] - X[r["neighbor_id"]]) ** 2).sum())
        assert abs(r["exact_d2"] - exact) < 1e-9 * max(1.0, exact)
    hits = total = 0
    for q in by_q:
        d2 = {i: float(((X[q] - v) ** 2).sum()) for i, v in X.items()}
        top = set(sorted(d2, key=lambda i: (d2[i], i))[:10])
        hits += len(top & by_q[q])
        total += 10
    assert hits / total >= 0.8, f"rerank recall@10 {hits/total:.2f}"


def test_pq_adc_topk_k_exceeding_corpus(spark):
    """k larger than the corpus returns every vector, ranked, per query."""
    from pyspark.sql import functions as F

    from python_cdc_postgres_to_clickhouse_spark.operators.pq import (
        pq_adc_topk,
        pq_assign,
        train_pq_codebooks,
    )

    emb = _pq_fixture(spark)
    n = emb.count()
    books = train_pq_codebooks(emb, m=8, k=16, seed=11)
    codes = pq_assign(emb, books).select("vec_id", "codes")
    queries = emb.filter(F.col("vec_id") == 0)
    got = pq_adc_topk(codes, books, queries, k=n + 10).collect()
    assert len(got) == n
    assert sorted(r["rank"] for r in got) == list(range(1, n + 1))


def test_ivfpq_topk_replay_bounds_and_recall(spark):
    """IVF-PQ: (a) candidates come ONLY from probed cells (the scan is the
    IVF prune x PQ byte cut); (b) approx distances replay a numpy
    residual-ADC implementation exactly; (c) recall@10 at nprobe=4 clears a
    floor consistent with the PQ full-scan ceiling on the fixture."""
    import numpy as np
    from pyspark.sql import functions as F

    from python_cdc_postgres_to_clickhouse_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
        train_ivfpq,
    )

    emb = _pq_fixture(spark)
    C, books = train_ivfpq(emb, n_cells=16, m=8, k=16, seed=11)
    idx = ivfpq_encode(emb, C, books)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = ivfpq_topk(idx, C, books, queries, k=10, nprobe=4).collect()

    X = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in emb.select("vec_id", "embedding").collect()}
    index = {r["vec_id"]: (r["cell"], list(r["codes"])) for r in idx.collect()}
    m, K, dsub = books.shape

    def probed(qv):
        d2 = ((C - qv) ** 2).sum(axis=1)
        return set(np.argsort(d2)[:4].tolist())

    def residual_adc(qv, cell, codes):
        r = qv - C[cell]
        return sum(
            float(((r[j * dsub:(j + 1) * dsub] - books[j][codes[j]]) ** 2).sum())
            for j in range(m)
        )

    for r in got:
        cell, codes = index[r["neighbor_id"]]
        assert cell in probed(X[r["query_id"]])          # (a)
        expect = residual_adc(X[r["query_id"]], cell, codes)
        assert abs(r["approx_d2"] - expect) < 1e-9 * max(1.0, expect)  # (b)

    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q in by_q:
        d2 = {i: float(((X[q] - v) ** 2).sum()) for i, v in X.items()}
        exact = set(sorted(d2, key=lambda i: (d2[i], i))[:10])
        hits += len(exact & by_q[q])
        total += 10
    assert hits / total >= 0.25, f"ivfpq recall@10 {hits/total:.2f}"  # (c)


def test_ivfpq_training_deterministic_and_cells_cover(spark):
    import numpy as np
    from python_cdc_postgres_to_clickhouse_spark.operators.pq import (
        ivfpq_encode,
        train_ivfpq,
    )

    emb = _pq_fixture(spark)
    C1, b1 = train_ivfpq(emb, n_cells=16, m=8, k=16, seed=11)
    C2, b2 = train_ivfpq(emb, n_cells=16, m=8, k=16, seed=11)
    assert np.array_equal(C1, C2) and np.array_equal(b1, b2)
    cells = {r["cell"] for r in ivfpq_encode(emb, C1, b1).collect()}
    assert len(cells) >= 8  # no pathological cell collapse on the fixture


# --------------------------------------------------------------------------
# SemDeDup (x_semantic_dedup / operators.similarity.semantic_dedup)
# --------------------------------------------------------------------------


def _semdedup_replay(spark):
    """Driver-side numpy replay of the full SemDeDup pipeline."""
    from python_cdc_postgres_to_clickhouse_spark.queries.embeddings import (
        SEMDEDUP_K,
        SEMDEDUP_SEED,
        SEMDEDUP_THRESHOLD,
    )

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    C = train_ivf_centroids(
        emb, n_centroids=SEMDEDUP_K, seed=SEMDEDUP_SEED, id_col="vec_id"
    )
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(Xn @ C.T, axis=1)
    pruned: set[int] = set()
    for c in range(SEMDEDUP_K):
        members = np.where(assign == c)[0]
        members = members[np.argsort(ids[members])]
        for ii, i in enumerate(members):
            for j in members[ii + 1 :]:
                cos = float(X[i] @ X[j]) / (
                    float(np.linalg.norm(X[i])) * float(np.linalg.norm(X[j]))
                )
                if cos >= SEMDEDUP_THRESHOLD:
                    pruned.add(int(ids[j]))
    return {int(ids[k]): int(assign[k]) for k in range(len(ids))}, pruned


def test_semantic_dedup_matches_numpy_replay(spark):
    from python_cdc_postgres_to_clickhouse_spark.queries.embeddings import (
        x_semantic_dedup,
    )

    want_assign, want_pruned = _semdedup_replay(spark)
    rows = x_semantic_dedup(spark, SF_SMOKE).collect()
    assert len(rows) == len(want_assign)
    for r in rows:
        assert r["cluster_id"] == want_assign[r["vec_id"]], r
        assert r["kept"] == (r["vec_id"] not in want_pruned), r
    assert want_pruned, "fixture/threshold must actually exercise the prune path"


def test_semantic_dedup_planted_duplicates_keep_first(spark):
    """Identical vectors always share a cluster (identical assignment
    input), so exactly the smallest id of each planted group survives —
    regardless of what the trained quantizer looks like."""
    from python_cdc_postgres_to_clickhouse_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(20)]
    # Plant: ids 100,101,102 duplicate row 0; ids 200,201 duplicate row 5.
    for i in (100, 101, 102):
        rows.append((i, base[0].tolist()))
    for i in (200, 201):
        rows.append((i, base[5].tolist()))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(df, threshold=0.9999, n_clusters=4, seed=1).collect()
    }
    assert out[0] and not (out[100] or out[101] or out[102])
    assert out[5] and not (out[200] or out[201])
    # Non-planted rows are all kept at a ~1.0 threshold.
    assert all(out[i] for i in range(20))


def test_semantic_dedup_deterministic_across_runs(spark):
    from python_cdc_postgres_to_clickhouse_spark.queries.embeddings import (
        x_semantic_dedup,
    )

    a = sorted(map(tuple, x_semantic_dedup(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, x_semantic_dedup(spark, SF_SMOKE).collect()))
    assert a == b


def test_semantic_dedup_cluster_cap_routes_bitidentical(spark):
    """Round-14 memory guard (verdict item 6): a forced tiny
    ``max_cluster_rows`` routes every oversized cluster to the spillable
    pair-join shape — and the output must be BIT-identical to the
    Arrow-grouped path (same JVM-fold rounding, same keep-first rule),
    because the declared query's oracle hash may not move."""
    from python_cdc_postgres_to_clickhouse_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    base = sorted(
        map(tuple, semantic_dedup(emb, threshold=0.95, n_clusters=4, seed=7).collect())
    )
    capped = sorted(
        map(
            tuple,
            semantic_dedup(
                emb, threshold=0.95, n_clusters=4, seed=7, max_cluster_rows=8
            ).collect(),
        )
    )
    assert capped == base
    # The cap genuinely triggered: with 4 clusters over the smoke corpus,
    # at least one cluster exceeds 8 rows.
    from collections import Counter

    sizes = Counter(c for _, c, _ in base)
    assert max(sizes.values()) > 8, sizes


def test_ivfpq_declared_query_finds_self_at_rank1(spark):
    """The declared x_ivfpq_topk row: every query (a corpus member) must
    retrieve ITSELF at rank 1 — its own cell is always its nearest probe
    and its ADC self-distance is the minimal quantization error."""
    from python_cdc_postgres_to_clickhouse_spark.registry import all_queries

    df = all_queries()["x_ivfpq_topk"].fn(spark, "/root/testdata/sf0.001")
    top1 = {r["query_id"]: r["neighbor_id"] for r in df.filter("rank = 1").collect()}
    assert top1, "no results"
    assert all(q == n for q, n in top1.items()), top1


def test_pq_adc_declared_queries_match_shared_math_replay(spark):
    """Round-13 promotion validity: the Spark ADC top-k and rerank
    queries must reproduce the Spark-independent replays BIT-EXACTLY —
    scores included (pq_query_tables / pq_adc_scores / exact_l2_fold are
    shared verbatim; ranking uses the same (dist, neighbor_id)
    tie-break)."""
    import hashlib as _hl

    import numpy as _np

    from python_cdc_postgres_to_clickhouse_spark.operators.pq import (
        pq_adc_rerank_replay,
        pq_adc_topk_replay,
        pq_assign_replay,
        pq_fit,
    )
    from python_cdc_postgres_to_clickhouse_spark.queries.embeddings import (
        PQ_ADC_K,
        PQ_ADC_OVERSAMPLE,
        PQ_K,
        PQ_M,
        PQ_SEED,
    )
    from python_cdc_postgres_to_clickhouse_spark.registry import all_queries
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    rows = (
        load_tables(spark, SF_SMOKE)["embeddings"]
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    X = [list(map(float, r["embedding"])) for r in rows]
    order = sorted(
        range(len(ids)),
        key=lambda i: _hl.md5(f"{PQ_SEED}_{ids[i]}".encode()).hexdigest(),
    )[:20_000]
    books = pq_fit(
        _np.array([X[i] for i in order], dtype=_np.float64),
        PQ_M, PQ_K, 10, PQ_SEED,
    )
    codes_arr, _ = pq_assign_replay(X, books)
    q_idx = [i for i, v in enumerate(ids) if v % 50 == 0]
    Q = _np.array(X, dtype=_np.float64)[q_idx]
    q_ids = [ids[i] for i in q_idx]

    qs = all_queries()
    got_topk = sorted(map(tuple, qs["x_pq_adc_topk"].fn(spark, SF_SMOKE).collect()))
    exp_topk = sorted(
        (q, n, d, r)
        for q, n, d, r in pq_adc_topk_replay(
            q_ids, Q, books, ids, codes_arr, PQ_ADC_K
        )
    )
    assert got_topk == exp_topk

    got_rr = sorted(map(tuple, qs["x_pq_adc_rerank"].fn(spark, SF_SMOKE).collect()))
    exp_rr = sorted(
        (q, n, d, r)
        for q, n, d, r in pq_adc_rerank_replay(
            q_ids, Q, books, ids, codes_arr, X, PQ_ADC_K, PQ_ADC_OVERSAMPLE
        )
    )
    assert got_rr == exp_rr


def test_promoted_oracles_are_arrow_batch_independent(spark):
    """Round-12 promotion validity: the GEMM UDF passes behind
    x_kmeans_embed / x_semantic_dedup / x_pq_codes must produce
    IDENTICAL results when Arrow slices the data into many tiny batches
    — every op in ivf_cells_math / pq_encode_math is per-row, so batch
    boundaries must not matter. Forces maxRecordsPerBatch=17 and
    compares full result sets against the default-batching run."""
    from python_cdc_postgres_to_clickhouse_spark.registry import all_queries

    qs = all_queries()
    names = [
        "x_kmeans_embed", "x_semantic_dedup", "x_pq_codes",
        "x_lsh_cosine_topk", "x_embedding_near_dup", "x_ivf_cosine_topk",
        "x_ivfpq_topk", "x_pq_adc_topk", "x_pq_adc_rerank",
    ]
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    baseline = {
        n: sorted(map(tuple, qs[n].fn(spark, SF_SMOKE).collect()))
        for n in names
    }
    try:
        spark.conf.set(key, "17")
        for n in names:
            tiny = sorted(map(tuple, qs[n].fn(spark, SF_SMOKE).collect()))
            assert tiny == baseline[n], n
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
