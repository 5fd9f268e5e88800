"""Product quantization (PQ) for embedding columns: trained compression of
``array<float>`` vectors into m small codes — the storage/ANN-memory stage
that follows dedup and projection in an embedding pipeline (IVF-PQ is the
standard billion-scale ANN layout; the IVF half lives in
operators/similarity.py).

Spark-first split, mirroring the IVF design:

- **Training is model fitting, not a corpus pass**: per-subspace Lloyd's
  k-means runs driver-side in numpy on a bounded uniform sample drawn with
  the same no-prior-count TakeOrdered draw as ``train_ivf_centroids``
  (``orderBy(rand(seed)).limit(n)`` — a per-partition heap, never a global
  sort, never a partition prefix). The resulting (m × k × d/m) codebook
  tensor is a few KB at any corpus size.
- **Assignment is one narrow Arrow-batched pass**: the codebooks broadcast
  inside a pandas UDF that argmin-assigns each of the m subvectors and
  returns the codes plus the per-vector reconstruction error. No shuffle,
  no join — 100 TB of embeddings stream through map tasks.
- Compression ratio: 64 float32 dims (256 B) → m uint8 codes (m B); at
  m=8 that is 32× before any entropy coding.

Determinism: given (seed, data) the sample, the codebooks, and every
assignment are reproducible — asserted against a pure-numpy replay in
tests/test_embeddings.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pq_fit(
    X: "np.ndarray", m: int, k: int, n_iters: int, seed: int
) -> np.ndarray:
    """Pure-numpy PQ codebook fitting core — shared by the Spark trainer
    below AND the Spark-independent x_pq_codes oracle replay (the
    kmeans_fit device in operators/similarity.py): identical input rows
    ⇒ bit-identical (m, k, d/m) codebook tensor."""
    if X.ndim != 2 or X.shape[1] % m:
        raise ValueError(f"dim {X.shape} not divisible into {m} subspaces")
    if len(X) < k:
        raise ValueError(f"sample of {len(X)} rows < {k} codewords")
    dsub = X.shape[1] // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=k, replace=False)].copy()
        for _ in range(n_iters):
            # (n, k) squared L2 via the expansion trick; argmin per row.
            d2 = (
                (S * S).sum(axis=1, keepdims=True)
                - 2.0 * S @ C.T
                + (C * C).sum(axis=1)
            )
            a = d2.argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books[j] = C
    return books


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 10,
    seed: int = 42,
    sample_limit: int = 20_000,
    vec_col: str = "embedding",
    id_col: str | None = None,
) -> np.ndarray:
    """Fit per-subspace codebooks; returns an (m, k, d/m) float64 tensor.

    Plain (non-spherical) Lloyd's per subspace — PQ quantizes raw
    coordinates, so L2 is the right metric regardless of how the full
    vectors are later compared. Empty cells keep their previous codeword
    (same rule as the IVF trainer).

    With ``id_col`` the sample ordering is the layout-independent md5
    rank (similarity.sample_order_expr) instead of ``rand(seed)`` — the
    trained tensor becomes a pure function of the rows, reproducible
    outside Spark (the x_pq_codes full oracle depends on this).
    """
    from .similarity import sample_order_expr

    cols = [vec_col] if id_col is None else [vec_col, id_col]
    order = (
        F.rand(seed) if id_col is None else sample_order_expr(seed, id_col)
    )
    rows = (
        vectors.select(*cols).orderBy(order).limit(sample_limit).collect()
    )
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return pq_fit(X, m, k, n_iters, seed)


def pq_encode_math(
    X: "np.ndarray", books: "np.ndarray"
) -> tuple["np.ndarray", "np.ndarray"]:
    """The PQ encode math, shared VERBATIM by the Arrow UDF in
    ``pq_assign`` and the x_pq_codes oracle replay: per subspace, squared
    L2 to every codeword via the expansion trick, per-row argmin, and the
    chosen codeword's exact reconstruction error. Every op is per-row
    (row-wise sums, the GEMM's row blocks, argmin along axis=1), so the
    result is independent of Arrow batch boundaries — one full-table call
    reproduces the distributed pass bit-exactly (pinned by the
    forced-small-batch test in tests/test_embeddings.py)."""
    m, k, dsub = books.shape
    n = X.shape[0]
    codes = np.empty((n, m), dtype=np.int32)
    errs = np.empty((n, m), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = books[j]
        d2 = (
            (S * S).sum(axis=1, keepdims=True)
            - 2.0 * S @ C.T
            + (C * C).sum(axis=1)
        )
        a = d2.argmin(axis=1)
        codes[:, j] = a
        diff = S - C[a]
        errs[:, j] = (diff * diff).sum(axis=1)
    return codes, errs


def pq_assign(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector: (id, codes array<int>, errs array<double>,
    sq_err double).

    One Arrow-batched pandas UDF pass; the codebook tensor rides the UDF
    closure (broadcast once per executor). ``errs[j]`` is subspace j's
    squared reconstruction error, ``sq_err`` their sum over all dims —
    the quality signals PQ tuning monitors.
    """
    from pyspark.sql.functions import pandas_udf

    books = codebooks  # closure capture

    @pandas_udf("struct<codes: array<int>, errs: array<double>>")
    def _encode(col: pd.Series) -> pd.DataFrame:
        X = np.array(col.tolist(), dtype=np.float64)
        codes, errs = pq_encode_math(X, books)
        return pd.DataFrame({"codes": list(codes), "errs": list(errs)})

    enc = df.select(id_col, _encode(F.col(vec_col)).alias("_pq"))
    return enc.select(
        id_col,
        F.col("_pq.codes").alias("codes"),
        F.col("_pq.errs").alias("errs"),
        F.aggregate(
            F.col("_pq.errs"), F.lit(0.0), lambda acc, x: acc + x
        ).alias("sq_err"),
    )


def pq_assign_replay(X, codebooks):
    """Spark-independent replay of ``pq_assign``'s encode: the SAME
    ``pq_encode_math`` the Arrow UDF runs, called once over the full
    table (valid because every op in it is per-row — see its docstring).
    Returns (codes, errs) numpy arrays. A JVM-expression encode was
    tried and rejected in round 12: HOF folds evaluate interpreted
    (~3x the GEMM pass at sf0.1) and flat codegen Add trees fall back
    past the method limit (~8x); the Arrow GEMM stays the one encode
    path, with batch-boundary independence test-pinned instead."""
    V = np.array([list(map(float, v)) for v in X], dtype=np.float64)
    return pq_encode_math(V, np.asarray(codebooks))


def pq_query_tables(Q: "np.ndarray", books: "np.ndarray") -> "np.ndarray":
    """Per-query ADC lookup tables, shared VERBATIM between
    ``pq_adc_topk``'s driver-side prep and the x_pq_adc_topk oracle
    replay: (nq, m, K) exact squared L2 from each query subvector to each
    codeword (the expansion trick, same as pq_encode_math). Driver-side
    numpy, deterministic given (Q, books)."""
    m, K, dsub = books.shape
    tables = np.empty((Q.shape[0], m, K), dtype=np.float64)
    for j in range(m):
        S = Q[:, j * dsub : (j + 1) * dsub]  # (nq, dsub)
        C = books[j]  # (K, dsub)
        tables[:, j, :] = (
            (S * S).sum(axis=1, keepdims=True) - 2.0 * S @ C.T + (C * C).sum(axis=1)
        )
    return tables


def pq_adc_scores(tables: "np.ndarray", codes: "np.ndarray") -> "np.ndarray":
    """The ADC gather-and-sum, shared VERBATIM by the Arrow UDF in
    ``pq_adc_topk`` and the oracle replay: approximate squared distance =
    Σ_j tables[q, j, code_j], accumulated in fixed j order. Every op is
    per-row (per-corpus-row gathers and adds), so the result is
    independent of Arrow batch boundaries — one full-table call
    reproduces the distributed pass bit-exactly (pinned by the
    forced-small-batch test in tests/test_embeddings.py). Returns
    (nq, n)."""
    m = tables.shape[1]
    d = np.zeros((tables.shape[0], codes.shape[0]), dtype=np.float64)
    for j in range(m):
        d += tables[:, j, codes[:, j]]
    return d


def pq_adc_topk_replay(q_ids, Q, books, c_ids, codes_arr, k):
    """Spark-independent replay of ``pq_adc_topk`` given the codebooks
    and the encoded corpus (both themselves replayable via pq_fit /
    pq_encode_math): the shared table prep, the UDF's exact
    gather-and-sum over the full corpus, the same
    (approx_d2 ASC, neighbor_id ASC) ranking. Returns
    (query_id, neighbor_id, approx_d2, rank) tuples."""
    tables = pq_query_tables(Q, np.asarray(books))
    X = np.array(codes_arr, dtype=np.int64)
    d = pq_adc_scores(tables, X)
    out = []
    for qi, q_id in enumerate(q_ids):
        scored = sorted(
            ((float(d[qi, i]), c_ids[i]) for i in range(len(c_ids))),
            key=lambda t: (t[0], t[1]),
        )
        for rank, (dd, nid) in enumerate(scored[:k], start=1):
            out.append((q_id, nid, dd, rank))
    return out


def exact_l2_fold(v, q) -> float:
    """Pure-python replay of the rerank stage's JVM expression
    ``aggregate(zip_with(v, q, (a,b) -> (a-b)*(a-b)), 0.0, acc+x)`` —
    left-to-right double fold, bit-identical to Spark."""
    acc = 0.0
    for a, b in zip(v, q):
        diff = (a - b) * (a - b)
        acc = acc + diff
    return acc


def pq_adc_rerank_replay(
    q_ids, Q, books, c_ids, codes_arr, corpus_vecs, k, oversample
):
    """Spark-independent replay of ``pq_adc_rerank_topk``: the ADC
    shortlist via ``pq_adc_topk_replay`` (k·oversample per query, same
    tie-break), then exact L2 over ONLY the shortlist via the same
    left-to-right fold the JVM runs, ranked (exact_d2 ASC,
    neighbor_id ASC). Returns (query_id, neighbor_id, exact_d2, rank)
    tuples."""
    shortlist = pq_adc_topk_replay(
        q_ids, Q, books, c_ids, codes_arr, k * oversample
    )
    vec_by_id = dict(zip(c_ids, corpus_vecs))
    by_query: dict = {}
    for q_id, nid, _dd, _r in shortlist:
        by_query.setdefault(q_id, []).append(nid)
    out = []
    for qi, q_id in enumerate(q_ids):
        qv = [float(x) for x in Q[qi]]
        scored = sorted(
            ((exact_l2_fold(vec_by_id[nid], qv), nid)
             for nid in by_query.get(q_id, [])),
            key=lambda t: (t[0], t[1]),
        )
        for rank, (dd, nid) in enumerate(scored[:k], start=1):
            out.append((q_id, nid, dd, rank))
    return out


def pq_adc_topk(
    corpus_codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    corpus_id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate L2 top-k over PQ codes — the
    search-side payoff of the compression: each query builds an (m × K)
    lookup table of exact query-subvector→codeword distances, and a coded
    corpus vector's approximate distance is the SUM of m table lookups —
    no decode, no float vector in memory.

    Spark shape: queries are few and small → the (q × m × K) table tensor
    broadcasts inside one Arrow-batched UDF over the coded corpus (a
    narrow map pass — the corpus never shuffles); per-query top-k is a
    (query_id) hash aggregate over a bounded min-heap via
    ``WindowGroupLimit``-friendly row_number. At 100 TB the scan reads m
    int8-scale code columns instead of the 256-byte vector — the 32×
    scan-byte reduction IS the speedup.

    Returns (query_id, neighbor_id, approx_d2, rank). Recall vs exact L2
    is bounded-tested in tests/test_embeddings.py.
    """
    import pandas as pd  # noqa: F401 — annotations resolved at module level
    from pyspark.sql import Window as W
    from pyspark.sql.functions import pandas_udf

    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = [r[query_id_col] for r in q_rows]
    Q = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    # (nq, m, K): exact distance from each query subvector to each codeword
    # (shared verbatim with the oracle replay — pq_adc_topk_replay).
    tables = pq_query_tables(Q, codebooks)

    @pandas_udf("array<double>")
    def _adc(codes: pd.Series) -> pd.Series:
        X = np.array(codes.tolist(), dtype=np.int64)  # (n, m)
        # Per-subspace gather-and-sum, shared verbatim with the replay.
        d = pq_adc_scores(tables, X)
        return pd.Series(list(d.T))

    scored = corpus_codes.select(
        F.col(corpus_id_col).alias("neighbor_id"), _adc(F.col("codes")).alias("_d")
    ).select(
        "neighbor_id",
        F.posexplode("_d").alias("_qi", "approx_d2"),
    )
    qid_map = F.array(*[F.lit(i) for i in q_ids])
    scored = scored.select(
        F.element_at(qid_map, F.col("_qi") + 1).alias("query_id"),
        "neighbor_id",
        "approx_d2",
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_adc_rerank_topk(
    corpus_codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    oversample: int = 5,
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    corpus_id_col: str = "vec_id",
) -> DataFrame:
    """ADC shortlist + exact re-rank — the standard PQ search pipeline.

    Stage 1 scans only the code columns (``pq_adc_topk``) for an
    ``oversample·k`` shortlist per query; stage 2 reads the full float
    vectors for ONLY the shortlist (a broadcast semi of |q|·oversample·k
    ids against the vector table — the big side is filtered, never
    shuffled) and re-ranks by exact L2. Recall approaches exact search
    while the corpus-wide scan stays 32× cheaper; the exact pass touches
    a constant number of vectors per query.
    """
    from pyspark.sql import Window as W

    shortlist = pq_adc_topk(
        corpus_codes,
        codebooks,
        queries,
        k=k * oversample,
        vec_col=vec_col,
        query_id_col=query_id_col,
        corpus_id_col=corpus_id_col,
    ).select("query_id", "neighbor_id")
    # Query vectors ride a broadcast join keyed on query_id — NOT a
    # map_from_arrays literal (at 1000 queries × 64 dims that is a
    # 64k-node expression tree evaluated per candidate row, past any
    # codegen limit; round-13 bench: 2.7 s → ~1 s at sf0.1). The cast
    # widens the same float32 values the literal path embedded, so the
    # fold below is bit-identical.
    qv_df = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_q"),
    )
    cand = (
        vectors.select(
            F.col(corpus_id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qv_df), "query_id")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_q"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("query_id").orderBy("exact_d2", "neighbor_id")
    return (
        cand.withColumn("exact_d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "exact_d2", "rank")
    )


def train_ivfpq(
    vectors: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    k: int = 16,
    n_iters: int = 10,
    seed: int = 42,
    sample_limit: int = 20_000,
    vec_col: str = "embedding",
    id_col: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit the full IVF-PQ model: L2 coarse cells + PQ codebooks on the
    RESIDUALS (x − cell centroid) — the standard billion-scale ANN layout.
    Residual encoding matters: residual energy is what survives the coarse
    quantizer, so the same (m × K) budget buys a finer code.

    One bounded TakeOrdered sample feeds both stages driver-side; the
    returned ((n_cells × d), (m × K × d/m)) tensors are a few KB at any
    corpus size. L2 (non-spherical) k-means throughout, so cells, residuals,
    and ADC all speak the same metric.

    With ``id_col`` the sample ordering is the layout-independent md5
    rank — the model becomes a pure function of the rows, retrainable
    outside Spark (the x_ivfpq_topk full oracle)."""
    from .similarity import sample_order_expr

    cols = [vec_col] if id_col is None else [vec_col, id_col]
    order = (
        F.rand(seed) if id_col is None else sample_order_expr(seed, id_col)
    )
    rows = (
        vectors.select(*cols).orderBy(order).limit(sample_limit).collect()
    )
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return ivfpq_fit(X, n_cells, m, k, n_iters, seed)


def ivfpq_fit(
    X: "np.ndarray",
    n_cells: int,
    m: int,
    k: int,
    n_iters: int,
    seed: int,
) -> tuple["np.ndarray", "np.ndarray"]:
    """Pure-numpy IVF-PQ fitting core — shared by the Spark trainer above
    and the x_ivfpq_topk oracle replay (identical rows ⇒ bit-identical
    tensors)."""
    if len(X) < max(n_cells, k):
        raise ValueError(f"sample of {len(X)} rows too small")
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    for _ in range(n_iters):
        d2 = (
            (X * X).sum(axis=1, keepdims=True) - 2.0 * X @ C.T + (C * C).sum(axis=1)
        )
        a = d2.argmin(axis=1)
        for c in range(n_cells):
            mask = a == c
            if mask.any():
                C[c] = X[mask].mean(axis=0)
    resid = X - C[d2.argmin(axis=1)]

    # Per-subspace codebooks on residuals (same Lloyd loop as train_pq_codebooks).
    dsub = X.shape[1] // m
    if X.shape[1] % m:
        raise ValueError(f"dim {X.shape[1]} not divisible into {m} subspaces")
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        S = resid[:, j * dsub : (j + 1) * dsub]
        B = S[rng.choice(len(S), size=k, replace=False)].copy()
        for _ in range(n_iters):
            d2s = (
                (S * S).sum(axis=1, keepdims=True) - 2.0 * S @ B.T + (B * B).sum(axis=1)
            )
            a = d2s.argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    B[c] = S[mask].mean(axis=0)
        books[j] = B
    return C, books


def ivfpq_encode_math(
    X: "np.ndarray", C: "np.ndarray", books: "np.ndarray"
) -> tuple["np.ndarray", "np.ndarray"]:
    """IVF-PQ encode math, shared VERBATIM by the Arrow UDF and the
    oracle replay: L2 cell argmin, residual, per-subspace code argmin —
    all per-row ops, independent of Arrow batch boundaries (the round-12
    shared-math replay device)."""
    m, K, dsub = books.shape
    d2 = (
        (X * X).sum(axis=1, keepdims=True) - 2.0 * X @ C.T + (C * C).sum(axis=1)
    )
    cell = d2.argmin(axis=1)
    R = X - C[cell]
    n = X.shape[0]
    codes = np.empty((n, m), dtype=np.int32)
    for j in range(m):
        S = R[:, j * dsub : (j + 1) * dsub]
        B = books[j]
        dj = (
            (S * S).sum(axis=1, keepdims=True) - 2.0 * S @ B.T + (B * B).sum(axis=1)
        )
        codes[:, j] = dj.argmin(axis=1)
    return cell, codes


def ivfpq_encode(
    df: DataFrame,
    cells: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode the corpus: (id, cell, codes). One narrow Arrow pass — cell
    assignment and residual PQ codes in the same batch GEMMs; the index
    row is ~(4 + m) bytes against the 256-byte vector."""
    from pyspark.sql.functions import pandas_udf

    C = cells
    books = codebooks

    @pandas_udf("struct<cell: int, codes: array<int>>")
    def _enc(col: pd.Series) -> pd.DataFrame:
        X = np.array(col.tolist(), dtype=np.float64)
        cell, codes = ivfpq_encode_math(X, C, books)
        return pd.DataFrame({"cell": cell.astype(np.int32), "codes": list(codes)})

    enc = df.select(id_col, _enc(F.col(vec_col)).alias("_e"))
    return enc.select(
        id_col, F.col("_e.cell").alias("cell"), F.col("_e.codes").alias("codes")
    )


def ivfpq_probe_tables(q_ids, Q, C, books, nprobe):
    """Probe-cell selection + per-(query, cell) residual-ADC tables,
    shared VERBATIM between ``ivfpq_topk``'s driver-side prep and the
    x_ivfpq_topk oracle replay. All numpy, all deterministic."""
    m, K, dsub = books.shape
    d2q = (Q * Q).sum(axis=1, keepdims=True) - 2.0 * Q @ C.T + (C * C).sum(axis=1)
    probe_cells = np.argsort(d2q, axis=1)[:, :nprobe]  # (nq, nprobe)
    # Per (query, probed cell): ADC table over the residual (q - C[cell]).
    tables: dict[tuple[int, int], np.ndarray] = {}
    for qi, q_id in enumerate(q_ids):
        for cell in probe_cells[qi]:
            r = Q[qi] - C[cell]
            tab = np.empty((m, K), dtype=np.float64)
            for j in range(m):
                s = r[j * dsub : (j + 1) * dsub]
                tab[j] = ((books[j] - s) ** 2).sum(axis=1)
            tables[(q_id, int(cell))] = tab
    return probe_cells, tables


def ivfpq_topk_replay(
    q_ids, Q, c_ids, cell_arr, codes_arr, C, books, k, nprobe
):
    """Spark-independent replay of ``ivfpq_topk`` given the model and the
    encoded corpus (both themselves replayable via ivfpq_fit /
    ivfpq_encode_math): the shared probe/table prep, the UDF's exact
    gather-and-sum scoring per (query, cell) group, the same
    (approx_d2 ASC, neighbor_id ASC) ranking. Returns
    (query_id, neighbor_id, approx_d2, rank) tuples."""
    m = books.shape[0]
    probe_cells, tables = ivfpq_probe_tables(q_ids, Q, C, books, nprobe)
    by_cell: dict[int, list[int]] = {}
    for ci, c in enumerate(cell_arr):
        by_cell.setdefault(int(c), []).append(ci)
    out = []
    for qi, q_id in enumerate(q_ids):
        scored = []
        for cell in probe_cells[qi]:
            rows = by_cell.get(int(cell), [])
            if not rows:
                continue
            sub = np.array([codes_arr[ci] for ci in rows], dtype=np.int64)
            d = tables[(q_id, int(cell))][np.arange(m), sub].sum(axis=1)
            scored += [
                (float(d[i]), c_ids[rows[i]]) for i in range(len(rows))
            ]
        scored.sort(key=lambda t: (t[0], t[1]))
        for rank, (dd, nid) in enumerate(scored[:k], start=1):
            out.append((q_id, nid, dd, rank))
    return out


def ivfpq_topk(
    corpus_index: DataFrame,
    cells: np.ndarray,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    corpus_id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ approximate L2 top-k: probe each query's ``nprobe`` nearest
    cells and score ONLY those cells' rows by residual-ADC lookups.

    Scale shape: the (query, cell) probe list broadcasts onto the coded
    corpus through a cell equi-join — the scan touches
    ≈ N·(nprobe/n_cells) index rows of (4 + m) bytes each (the IVF prune
    × the PQ byte cut, multiplicative); per-(query, cell) ADC tables ride
    the UDF closure keyed by probe id; per-query top-k is a
    WindowGroupLimit. No full-corpus pass, no all-pairs, no float vectors
    read. Exact re-ranking composes via ``pq_adc_rerank_topk``'s
    broadcast-shortlist pattern when recall demands it.
    """
    from pyspark.sql import Window as W
    from pyspark.sql.functions import pandas_udf

    C = cells
    m, K, dsub = codebooks.shape
    books = codebooks
    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = [r[query_id_col] for r in q_rows]
    Q = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    probe_cells, tables = ivfpq_probe_tables(q_ids, Q, C, books, nprobe)

    probes = [(q_id, int(cell)) for (q_id, cell) in tables]
    probe_df = queries.sparkSession.createDataFrame(
        probes, f"query_id: long, cell: int"
    )

    @pandas_udf("double")
    def _adc(qid: pd.Series, cell: pd.Series, codes: pd.Series) -> pd.Series:
        X = np.array(codes.tolist(), dtype=np.int64)
        out = np.empty(len(X), dtype=np.float64)
        # Group rows by (query, cell) so each table gathers vectorized.
        keys = pd.DataFrame({"q": qid.values, "c": cell.values})
        for (qv, cv), idx in keys.groupby(["q", "c"]).groups.items():
            tab = tables[(qv, int(cv))]
            sub = X[np.asarray(idx)]
            out[np.asarray(idx)] = tab[np.arange(m), sub].sum(axis=1)
        return pd.Series(out)

    cand = corpus_index.join(F.broadcast(probe_df), "cell")
    scored = cand.select(
        "query_id",
        F.col(corpus_id_col).alias("neighbor_id"),
        _adc(F.col("query_id"), F.col("cell"), F.col("codes")).alias("approx_d2"),
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
