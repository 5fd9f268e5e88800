"""Vector similarity search (SURVEY.md §2.7 X3) over ArrayType(FloatType).

Two paths, as a 100 TB design requires:
- **Exact brute-force** (the oracle path): query-set × corpus cosine with the
  small side broadcast, all arithmetic in JVM codegen via
  ``aggregate(zip_with(...))`` — no Python in the loop. O(|Q|·N·d): right
  for re-ranking and for validating the approximate path, not for N=10⁹.
- **Random-hyperplane LSH** (the scale path): r sign-bits of projections
  onto seeded deterministic hyperplanes → bucket key; only same-bucket pairs
  are scored. Probing with the b nearest buckets (Hamming) trades recall for
  cost. Candidate generation is a hash-partitioned equi-join on the bucket
  key — linear shuffle, no quadratic blow-up.

Cosine is computed as dot/(√(a·a)·√(b·b)) with explicit double casts — both
engines produce bit-identical doubles for this expression tree (verified in
the oracle harness), so even top-k ranking is deterministic given a unique
tiebreaker.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..tables import widen_small_scan


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, JVM-side (no UDF)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (top-k workloads have |Q| ≪ N); the corpus
    streams through in place — at 100 TB this is one scan of the corpus, no
    shuffle until the final per-query top-k (tiny). Norms are precomputed
    per row so each pair costs one dot product.

    The corpus side is conditionally widened (round 13, guide §2.5 input
    skew): the |Q|·N interpreted dot folds run in the corpus scan stage,
    and a single-row-group file would pin all of them to one core —
    no-op at cluster scale where the scan is already wide.
    """
    corpus = widen_small_scan(corpus)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(vec_col).alias("c_norm"),
    )
    sim = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


_DOT_PANDAS = None


def _dot_pandas(a, b):
    """Arrow-vectorized dot product for candidate scoring: the expression
    fold (``dot``) is interpreted per element and dominates when scoring
    10⁵+ LSH candidates; one numpy einsum per Arrow batch is ~10× faster.
    Used only on approximate (rows-only) paths — the oracle-checked exact
    queries keep the JVM fold for cross-engine bit-exactness. (Built
    lazily: pandas_udf registration needs an active SparkSession.)"""
    global _DOT_PANDAS
    if _DOT_PANDAS is None:

        @F.pandas_udf("double")
        def dot_pd(x: pd.Series, y: pd.Series) -> pd.Series:
            xm = np.array(list(x), dtype=np.float64)
            ym = np.array(list(y), dtype=np.float64)
            return pd.Series(np.einsum("ij,ij->i", xm, ym))

        _DOT_PANDAS = dot_pd
    return _DOT_PANDAS(F.col(a) if isinstance(a, str) else a,
                       F.col(b) if isinstance(b, str) else b)


def lsh_buckets_math(
    V: "np.ndarray", P: "np.ndarray", n_tables: int, n_planes: int
) -> list[list[int]]:
    """Sign-LSH bucket math, shared VERBATIM by the Arrow UDF below and
    the Spark-independent oracle replays: one GEMM against the stacked
    plane matrix, sign bits packed per table. Per-row ops only ⇒
    independent of Arrow batch boundaries (the round-12 replay device)."""
    bits = (V @ P.T) > 0  # (batch, L*r)
    out = []
    for row in bits:
        ids = []
        for t in range(n_tables):
            b = 0
            for i in range(n_planes):
                b |= int(row[t * n_planes + i]) << i
            ids.append(b)
        out.append(ids)
    return out


def _bucket_udf(planes_matrix: "np.ndarray", n_tables: int, n_planes: int):
    """Vectorized sign-LSH bucketing: one (batch × dim) @ (dim × L·r) GEMM
    per Arrow batch produces every table's bucket id at once — the
    expression-tree variant evaluates L·r interpreted dot folds per row
    and dominated the whole ANN query (measured at sf0.1)."""
    P = planes_matrix  # (L*r, dim)

    @F.pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        V = np.array(list(v), dtype=np.float64)
        return pd.Series(lsh_buckets_math(V, P, n_tables, n_planes))

    return buckets


def cosine_topk_vectorized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via per-partition numpy GEMM (the throughput path).

    The expression-tree path (``cosine_topk``) is plan-transparent but
    higher-order functions are interpreted; for large corpora the winning
    layout is: broadcast the normalized query matrix to every executor,
    stream corpus partitions through ``mapInPandas``, run one
    (batch × dim) @ (dim × |Q|) GEMM per Arrow batch, and emit only each
    partition's per-query top-k — the driver-side shuffle then reduces
    |partitions|·|Q|·k candidate rows, independent of corpus size.
    Results are identical to ``cosine_topk`` except for float summation
    order (BLAS vs sequential fold); ranking agrees except at
    numerically-tied similarities.
    """
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def gemm_topk(batches):
        ids, mat = bq.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ mat.T  # (batch, |Q|)
            sims[c_ids[:, None] == ids[None, :]] = -np.inf  # self-matches
            top = min(k, sims.shape[0])
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]  # per-query
            rows = [
                (int(ids[qj]), int(c_ids[i]), float(sims[i, qj]))
                for qj in range(len(ids))
                for i in idx[:, qj]
                if np.isfinite(sims[i, qj])  # drop masked self-matches
            ]
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    partials = corpus.select(id_col, vec_col).mapInPandas(gemm_topk, out_schema)
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    exact: bool = False,
) -> DataFrame:
    """X2 (embedding flavor): pairs (a<b) with cosine ≥ threshold.

    ``exact=True`` scores every pair — O(N²), the oracle/ground-truth path.
    Default uses the multi-table LSH index for candidates and scores only
    those (linear shuffle; recall follows the LSH S-curve, tested against
    the exact path). Dedup-by-embedding is the semantic near-dup filter of
    an LLM data pipeline: near-identical *meaning*, not near-identical
    bytes.
    """
    ids = vectors.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("va"),
        norm(vec_col).alias("na"),
    )
    other = vectors.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("vb"),
        norm(vec_col).alias("nb"),
    )
    if exact:
        pairs = ids.crossJoin(other).filter(F.col("a") < F.col("b"))
        sim = dot("va", "vb") / (F.col("na") * F.col("nb"))
    else:
        topk = lsh_cosine_topk(
            vectors, vectors, k=50, n_planes=n_planes, n_tables=n_tables,
            id_col=id_col, vec_col=vec_col,
        ).filter(F.col("query_id") < F.col("neighbor_id"))
        cand = topk.select(
            F.col("query_id").alias("a"), F.col("neighbor_id").alias("b")
        ).distinct()
        pairs = cand.join(ids, "a").join(other, "b")
        sim = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        pairs.select("a", "b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def with_lsh_bucket(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id: bit i = sign(v · plane_i). Pure column expressions
    — the planes are literal arrays folded into codegen, so bucketing is a
    narrow map (no shuffle, no Python)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return df.withColumn(out_col, bucket)


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k with multi-table sign-LSH (OR-construction).

    One table of r planes has per-neighbor recall p_bit^r (p_bit =
    1−θ/π) — too low for moderate similarities. L independent tables
    recover recall 1−(1−p^r)^L while candidates stay ≈ L·N/2^r per query.
    Tune (r, L) to the similarity profile: near-duplicate detection
    (sim ≥ 0.9) runs r=8, L=4 for ~256× candidate reduction; moderate-sim
    recommendation workloads need smaller r. Candidates are unioned across
    tables, de-duplicated, then exactly re-ranked — precision is exact.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(vec_col).alias("c_norm"),
    )

    # All L tables' buckets in ONE vectorized pass per side (GEMM against
    # the stacked plane matrix), then posexplode to (table, bucket) rows
    # and join once — a per-table join loop would rescan and re-hash both
    # sides L times, and per-plane expression folds are interpreted.
    planes_matrix = np.vstack(
        [
            np.array(random_hyperplanes(dim, n_planes, seed + 1000 * t))
            for t in range(n_tables)
        ]
    )
    buckets = _bucket_udf(planes_matrix, n_tables, n_planes)

    def all_buckets(df: DataFrame, vec: str, keep: str) -> DataFrame:
        return df.select(
            keep, F.posexplode(buckets(F.col(vec))).alias("tbl", "bucket")
        )

    qb = all_buckets(q, "q_vec", "query_id")
    cb = all_buckets(c, "c_vec", "neighbor_id")
    cand = (
        qb.join(cb, ["tbl", "bucket"])
        .select("query_id", "neighbor_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )
    sim = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot_pandas("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias(
                "sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: data-adaptive coarse quantizer — the other classic
# scale path next to sign-LSH. Where LSH partitions by random hyperplanes,
# IVF partitions by learned cluster cells, which concentrates real data's
# density into balanced cells (random projections can't adapt to structure).
# ---------------------------------------------------------------------------


def kmeans_fit(
    X: "np.ndarray", n_centroids: int, n_iters: int, seed: int
) -> np.ndarray:
    """Pure-numpy spherical k-means core (Lloyd's on unit vectors, cosine
    assignment, empty cells keep their centroid) — shared by the Spark
    trainer below AND the Spark-independent oracle replays
    (queries/embeddings.py lazy oracles, tests), the same device as
    operators/bpe.bpe_merges_from_dict: identical input rows ⇒
    bit-identical model on both sides."""
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if len(X) < n_centroids:
        raise ValueError(f"sample of {len(X)} rows < {n_centroids} centroids")
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=n_centroids, replace=False)].copy()
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def sample_order_expr(seed: int, id_col: str):
    """Layout-independent uniform sample ordering: md5 of "{seed}_{id}".
    Unlike ``F.rand(seed)`` (whose stream depends on partition layout, so
    two clusters reading the same rows can draw DIFFERENT samples), this
    is a pure function of the ROW — the trained model is reproducible
    across partition layouts, engines, and time, which is what a
    training-data pipeline wants from its index artifacts. md5 hex sorts
    identically everywhere (lexicographic on hex)."""
    return F.md5(F.concat(F.lit(f"{seed}_"), F.col(id_col).cast("string")))


def train_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 8,
    seed: int = 42,
    sample_limit: int = 20_000,
    sample_fraction: float | None = None,
    vec_col: str = "embedding",
    id_col: str | None = None,
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained driver-side on a bounded
    sample — model *fitting* (like drawing LSH hyperplanes, but
    data-adaptive), not a corpus pass: at 100 TB you still train on
    ≤ ``sample_limit`` rows and broadcast the (n_centroids × dim) matrix.
    Build once, query many: persist the returned matrix and pass it to
    ``ivf_cosine_topk(centroids=...)`` for every subsequent query batch.

    Lloyd's iterations on unit vectors with cosine assignment; empty cells
    keep their previous centroid. Deterministic given (seed, data layout).

    The sample is an exact uniform ``sample_limit``-subset drawn in ONE
    narrow pass with no prior ``count()``: the ``sample_limit`` smallest
    ``rand(seed)`` values are a uniform without-replacement draw, and
    Spark executes ``orderBy(rand).limit(n)`` as TakeOrdered — a bounded
    per-partition heap, never a global sort. A bare ``limit(n)`` (or a
    ``sample().limit()``) would instead train on a partition *prefix*,
    and ingested embeddings are typically written clustered by
    source/topic/time — a prefix-trained quantizer models one region and
    collapses the rest of the corpus into few cells. For corpora with very
    many partitions, pass ``sample_fraction`` to pre-thin rows before the
    heaps (caps the per-partition candidate volume the merge touches).

    With ``id_col`` the sample ordering is the layout-INDEPENDENT
    ``sample_order_expr`` hash rank (md5 of "{seed}_{id}") instead of
    ``rand(seed)``: same TakeOrdered plan shape, but the drawn subset and
    its order are a pure function of the rows — reproducible across
    partition layouts and replayable outside Spark (the round-12 full
    oracles for x_kmeans_embed / x_semantic_dedup depend on this).
    """
    cols = [vec_col] if id_col is None else [vec_col, id_col]
    sample = vectors.select(*cols)
    if sample_fraction is not None:
        sample = sample.sample(False, sample_fraction, seed)
    order = (
        F.rand(seed) if id_col is None else sample_order_expr(seed, id_col)
    )
    rows = sample.orderBy(order).limit(sample_limit).collect()
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return kmeans_fit(X, n_centroids, n_iters, seed)


def ivf_cells_math(V: "np.ndarray", C: "np.ndarray", nprobe: int):
    """The cell-assignment math, shared VERBATIM by the Arrow UDF below
    and the Spark-independent oracle replays (queries/embeddings.py):
    row-normalize, GEMM against the centroid matrix, per-row
    argsort/argpartition. Every op is PER-ROW (normalization, the GEMM's
    row blocks, argpartition along axis=1), so the result is independent
    of Arrow batch boundaries — one full-table call reproduces the
    distributed pass bit-exactly (pinned by the forced-small-batch test
    in tests/test_embeddings.py)."""
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    sims = V @ C.T  # (batch, n_centroids)
    if nprobe >= sims.shape[1]:
        return np.argsort(-sims, axis=1)
    return np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe]


def _ivf_cells_udf(centroids: "np.ndarray", nprobe: int):
    """Nearest-``nprobe`` cell ids per vector: one (batch × dim) @
    (dim × n_centroids) GEMM per Arrow batch (ivf_cells_math)."""
    C = centroids

    @F.pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        V = np.array(list(v), dtype=np.float64)
        idx = ivf_cells_math(V, C, nprobe)
        return pd.Series([row.astype(np.int32).tolist() for row in idx])

    return cells


def fold_norm_replay(v: list[float]) -> float:
    """Pure-python replay of ``norm()`` (sqrt of the 0.0-initialized
    square fold — one rounding per op, same as the JVM)."""
    acc = 0.0
    for a in v:
        acc = acc + a * a
    return math.sqrt(acc)


def _pair_sims_replay(pairs, qX, cX, q_norm, c_norm):
    """Candidate-pair cosine replay of the ``_dot_pandas`` scoring path:
    dots via the same np.einsum the UDF runs (per-row reduction ⇒ batch
    independent), norms via the JVM fold replay, the same
    dot / (q_norm * c_norm) rounding order."""
    A = np.array([qX[qi] for qi, _ in pairs], dtype=np.float64)
    B = np.array([cX[ci] for _, ci in pairs], dtype=np.float64)
    dots = np.einsum("ij,ij->i", A, B)
    return [
        float(dots[i]) / (q_norm[qi] * c_norm[ci])
        for i, (qi, ci) in enumerate(pairs)
    ]


def _rank_topk_replay(q_ids, c_ids, pairs, sims, k):
    """row_number() OVER (PARTITION BY query_id ORDER BY sim DESC,
    neighbor_id ASC) <= k, replayed."""
    by_q: dict = {}
    for (qi, ci), s in zip(pairs, sims):
        by_q.setdefault(q_ids[qi], []).append((c_ids[ci], s))
    out = []
    for qid, lst in by_q.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for rank, (nid, s) in enumerate(lst[:k], start=1):
            out.append((qid, nid, s, rank))
    return out


def lsh_topk_replay(
    q_ids, qX, c_ids, cX, k, n_planes, n_tables, seed: int = 42
):
    """Spark-independent replay of ``lsh_cosine_topk`` — the same stacked
    hyperplanes, the same ``lsh_buckets_math``, the same einsum scoring
    and (sim DESC, neighbor_id ASC) ranking. Returns
    (query_id, neighbor_id, sim, rank) tuples. Used by the round-12
    x_lsh_cosine_topk / x_embedding_near_dup lazy oracles."""
    if not qX or not cX:
        return []
    dim = len(qX[0])
    P = np.vstack([
        np.array(random_hyperplanes(dim, n_planes, seed + 1000 * t))
        for t in range(n_tables)
    ])
    qb = lsh_buckets_math(np.array(qX, dtype=np.float64), P, n_tables, n_planes)
    cb = lsh_buckets_math(np.array(cX, dtype=np.float64), P, n_tables, n_planes)
    cmap: dict = {}
    for ci, bks in enumerate(cb):
        for t, b in enumerate(bks):
            cmap.setdefault((t, b), []).append(ci)
    cand = set()
    for qi, bks in enumerate(qb):
        for t, b in enumerate(bks):
            for ci in cmap.get((t, b), ()):
                if q_ids[qi] != c_ids[ci]:
                    cand.add((qi, ci))
    if not cand:
        return []
    pairs = sorted(cand)
    q_norm = {qi: fold_norm_replay(qX[qi]) for qi, _ in pairs}
    c_norm = {ci: fold_norm_replay(cX[ci]) for _, ci in pairs}
    sims = _pair_sims_replay(pairs, qX, cX, q_norm, c_norm)
    return _rank_topk_replay(q_ids, c_ids, pairs, sims, k)


def ivf_topk_replay(q_ids, qX, c_ids, cX, k, nprobe, C):
    """Spark-independent replay of ``ivf_cosine_topk`` given the trained
    centroid matrix: corpus cells and query probe sets via the shared
    ``ivf_cells_math``, candidates by cell membership, einsum scoring,
    the same ranking. Used by the round-12 x_ivf_cosine_topk oracle."""
    if not len(qX) or not len(cX):
        return []
    C = np.asarray(C)
    c_cell = [
        int(r[0])
        for r in ivf_cells_math(np.array(cX, dtype=np.float64), C, 1)
    ]
    q_cells = ivf_cells_math(np.array(qX, dtype=np.float64), C, nprobe)
    pairs = []
    for qi in range(len(q_ids)):
        probe = set(int(x) for x in q_cells[qi])
        for ci in range(len(c_ids)):
            if c_cell[ci] in probe and q_ids[qi] != c_ids[ci]:
                pairs.append((qi, ci))
    if not pairs:
        return []
    q_norm = {qi: fold_norm_replay(qX[qi]) for qi, _ in pairs}
    c_norm = {ci: fold_norm_replay(cX[ci]) for _, ci in pairs}
    sims = _pair_sims_replay(pairs, qX, cX, q_norm, c_norm)
    return _rank_topk_replay(q_ids, c_ids, pairs, sims, k)


def assign_cell_replay(X, centroids) -> list[int]:
    """Spark-independent replay of the nprobe=1 assignment pass: the SAME
    ``ivf_cells_math`` the Arrow UDF runs, called once over the full
    table. Batch-boundary independence of the math (all ops per-row) is
    what makes this a valid oracle replay — pinned by the
    forced-small-batch test. Two GEMM-backed evaluations were tried and
    rejected as hot-path replacements in round 12: JVM HOF folds
    (interpreted — 1.3× slower at sf0.1) and flat codegen Add trees
    (method-limit fallback — 3× slower); the Arrow GEMM stays."""
    V = np.array([list(map(float, v)) for v in X], dtype=np.float64)
    return [int(r[0]) for r in ivf_cells_math(V, np.asarray(centroids), 1)]


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: "np.ndarray | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k with an IVF index (rows-only; recall-tested).

    Build once, query many: the production shape is to train the coarse
    quantizer once (``train_ivf_centroids``), persist the small matrix, and
    pass it via ``centroids=`` for every query batch. ``centroids=None``
    trains inline on a bounded one-pass sample — convenient for ad-hoc use,
    but it repeats quantizer fitting on every call.

    Plan shape at scale: centroids broadcast inside the Arrow UDF closure;
    the corpus takes ONE narrow GEMM pass to its argmax cell (no shuffle);
    queries explode to their ``nprobe`` nearest cells; candidates come from
    a hash-partitioned equi-join on the cell id — linear shuffle sized
    ≈ N·(nprobe/n_centroids) per query batch, never all-pairs. Candidates
    are exactly re-scored, so precision is exact and recall follows cell
    locality (≈ P[true neighbor's cell ∈ query's nprobe cells]).
    """
    C = (
        centroids
        if centroids is not None
        else train_ivf_centroids(
            corpus, n_centroids=n_centroids, seed=seed, vec_col=vec_col
        )
    )
    assign1 = _ivf_cells_udf(C, 1)
    assign_n = _ivf_cells_udf(C, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(vec_col).alias("c_norm"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_norm"),
        F.explode(assign_n(F.col(vec_col))).alias("cell"),
    )
    # Each corpus row lives in exactly one cell, so (query, neighbor) pairs
    # are already unique — no distinct() needed (unlike multi-table LSH).
    sim = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot_pandas("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias(
                "sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def fold_norms_seq(X: "np.ndarray") -> "np.ndarray":
    """Row norms whose per-row value is BIT-IDENTICAL to the JVM
    ``norm()`` fold: acc starts at 0.0 and accumulates one x·x product
    per dimension — vectorized ACROSS rows, sequential across dims, so
    every element sees exactly the fold's rounding sequence (one
    correctly-rounded multiply + one correctly-rounded add per step;
    IEEE754 makes numpy and the JVM agree bit-for-bit). Pinned by
    tests/test_similarity.py against the expression fold."""
    acc = np.zeros(X.shape[0], dtype=np.float64)
    for d in range(X.shape[1]):
        acc = acc + X[:, d] * X[:, d]
    return np.sqrt(acc)


def pairwise_dots_seq(X: "np.ndarray", Y: "np.ndarray") -> "np.ndarray":
    """(n×d, m×d) → n×m matrix of pairwise dot products, each element
    BIT-IDENTICAL to the JVM ``dot()`` fold (``aggregate(zip_with(...),
    0.0, +)``): the accumulation runs sequentially over dimensions with
    one multiply + one add rounding per step — the same order the fold
    rounds in — while numpy vectorizes across the n·m pairs. This is what
    lets the scoring leave the interpreted expression path WITHOUT
    perturbing a single output bit (a BLAS GEMM would re-associate the
    sum and flip last-ulp bits, which threshold filters then observe).

    In-place accumulation (round 14, advice item): ``out=`` multiply +
    ``+=`` add are the same single correctly-rounded IEEE ops as the
    allocating spellings, so values are unchanged while peak live memory
    drops from three n×m buffers (old acc, product temp, new acc) to
    two."""
    acc = np.zeros((X.shape[0], Y.shape[0]), dtype=np.float64)
    tmp = np.empty_like(acc)
    for d in range(X.shape[1]):
        np.multiply(X[:, d, None], Y[None, :, d], out=tmp)
        acc += tmp
    return acc


# Column-block width for the within-cluster n×b similarity blocks below:
# caps the similarity-matrix allocations at n×4096 doubles per block
# instead of an unbounded n². Per-block live set after the round-14
# in-place rewrite: TWO n×4096 float64 arrays (the dots/sim buffer — the
# division happens into it — plus the denominator) and one n×4096 bool,
# ≈ 6.5 GB at n = 100k rows. NOTE this bounds the block math only: the
# n×d X matrix and the Arrow group itself are resident per task
# regardless — the operator-level bound for skewed clusters is
# ``max_cluster_rows`` below (and, structurally, raising ``n_clusters``
# with corpus size — the SemDeDup regime).
_SEMDEDUP_BLOCK_COLS = 4096


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
    max_cluster_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): prune semantic near-duplicates by
    clustering embeddings with a coarse quantizer and comparing pairs only
    WITHIN each cluster — cross-cluster pairs are never materialized, so
    compute is Σ|cluster|² instead of N². At 100 TB you raise n_clusters
    so clusters stay a few thousand rows (the paper's regime: k scales
    with N, per-cluster work is constant).

    Keep rule: a vector is pruned iff some SMALLER-id vector in its
    cluster has cosine ≥ threshold (keep-first — deterministic and
    engine-replayable; the paper keeps the lowest-centroid-cosine member,
    a choice this rule replaces for determinism).

    Plan shape (optimization round 13, guide §2.3/§4.2): ONE exchange —
    hash(cluster_id) into an Arrow-grouped prune whose per-cluster math
    is the numpy sequential fold (``pairwise_dots_seq``), bit-identical
    to the previous JVM ``aggregate(zip_with(...))`` expression evaluated
    per pair (equality pinned in tests). The previous shape scanned the
    corpus three times, ran the assignment UDF on every branch, shuffled
    Σ|cluster|² candidate pairs through a broadcast join whose condition
    evaluated the fold INTERPRETED per pair, then joined the prune set
    back — measured 2.7 s at sf0.1; this shape moves each vector ONCE and
    scores each pair with vectorized numpy (0.6 s). Within a cluster the
    similarity matrix is computed in n×4096 column blocks, in place
    (round 14: peak two n×4096 float64 buffers per block — see
    ``_SEMDEDUP_BLOCK_COLS``).

    Memory guard (round 14, verdict item 6): ``applyInPandas``
    materializes a whole cluster's Arrow group — X itself, n×d — in one
    task, so a skewed outlier cluster can exceed task memory no matter
    how the block math is bounded. ``max_cluster_rows`` routes clusters
    LARGER than the cap to the round-12 spillable pair-join shape (the
    same JVM fold, the same keep rule — outputs are bit-identical, pinned
    by tests with a forced tiny cap), at the cost of one small size
    census and the Σ|cluster|² join volume FOR THOSE CLUSTERS ONLY.
    Default None keeps the single-exchange plan; at 100 TB set it to the
    task-memory budget (e.g. 200k rows ≈ 100 MB of float64 at d=64) —
    and prefer raising ``n_clusters`` so the cap never triggers.

    Preconditions: ``id_col`` values must be UNIQUE — the keep-first rule
    is defined on the total order of ids, and a duplicated id would
    arbitrarily prune one copy (same contract as
    ``packing.global_token_offsets``). For string ids the order used is
    pandas' code-point sort, which equals Spark's binary UTF-8 ordering
    for valid UTF-8 — non-string, non-numeric id types are unsupported.

    Returns (id_col, cluster_id, kept) for every input row.
    """
    import pandas as pd
    from pyspark.sql import types as T

    C = (
        centroids
        if centroids is not None
        else train_ivf_centroids(
            vectors, n_centroids=n_clusters, seed=seed, id_col=id_col
        )
    )
    cell1 = _ivf_cells_udf(C, 1)
    # Single corpus pass — widen a narrow scan so the assignment GEMM
    # uses every core (no-op at cluster scale, guide §2.5).
    assigned = widen_small_scan(vectors).select(
        F.col(id_col).alias("vec_id"),
        F.element_at(cell1(F.col(vec_col)), 1).alias("cluster_id"),
        F.col(vec_col).alias("_v"),
    )
    thr = float(threshold)

    def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("vec_id", kind="mergesort")
        X = np.array(list(pdf["_v"]), dtype=np.float64)
        n = len(pdf)
        norms = fold_norms_seq(X)
        kept = np.ones(n, dtype=bool)
        i_idx = np.arange(n)[:, None]
        # j-column blocks: kept[j] = no smaller-id member i<j with
        # sim(i, j) >= thr (ALL smaller ids, kept or not — the exact
        # pair-join rule this replaces). All arithmetic in place (same
        # one-multiply-one-divide rounding as sim = dots / (nᵢ·nⱼ)).
        for j0 in range(1, n, _SEMDEDUP_BLOCK_COLS):
            j1 = min(j0 + _SEMDEDUP_BLOCK_COLS, n)
            sim = pairwise_dots_seq(X, X[j0:j1])
            denom = np.multiply(norms[:, None], norms[None, j0:j1])
            np.divide(sim, denom, out=sim)
            del denom
            hit = sim >= thr
            hit &= i_idx < np.arange(j0, j1)[None, :]
            kept[j0:j1] = ~hit.any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy(),
                "cluster_id": pdf["cluster_id"].to_numpy(),
                "kept": kept,
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("vec_id", assigned.schema["vec_id"].dataType),
            T.StructField("cluster_id", T.IntegerType()),
            T.StructField("kept", T.BooleanType()),
        ]
    )
    if max_cluster_rows is None:
        return assigned.groupBy("cluster_id").applyInPandas(prune, out_schema)

    # Capped path: census cluster sizes (persist — three consumers below),
    # Arrow-group the in-cap clusters, pair-join the oversized ones.
    assigned = assigned.persist()
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("_n"))
    big_ids = [
        r["cluster_id"]
        for r in sizes.filter(F.col("_n") > int(max_cluster_rows)).collect()
    ]
    small = (
        assigned.filter(~F.col("cluster_id").isin(big_ids))
        if big_ids
        else assigned
    )
    out_small = small.groupBy("cluster_id").applyInPandas(prune, out_schema)
    if not big_ids:
        return out_small
    big = assigned.filter(F.col("cluster_id").isin(big_ids))
    a = big.select(
        F.col("cluster_id").alias("_ca"),
        F.col("vec_id").alias("_ida"),
        F.col("_v").alias("_va"),
    )
    b = big.select("cluster_id", "vec_id", F.col("_v").alias("_vb"))
    # The JVM fold: bit-identical to pairwise_dots_seq/fold_norms_seq
    # (pinned in tests/test_similarity.py), so both routes agree exactly.
    sim = dot("_va", "_vb") / (norm("_va") * norm("_vb"))
    pruned = b.join(
        a,
        (F.col("_ca") == F.col("cluster_id"))
        & (F.col("_ida") < F.col("vec_id"))
        & (sim >= F.lit(thr)),
        "left_semi",
    ).select("vec_id", F.lit(False).alias("kept"))
    out_big = (
        big.select("vec_id", F.col("cluster_id").cast("int").alias("cluster_id"))
        .join(pruned, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce("kept", F.lit(True)).alias("kept"),
        )
    )
    return out_small.unionByName(out_big)
