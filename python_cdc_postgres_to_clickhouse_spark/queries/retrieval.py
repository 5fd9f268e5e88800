"""Lexical retrieval + embedding compression queries.

Two more stages of the LLM training-data pipeline (SURVEY.md §2.7 EXT
family): BM25-style keyword retrieval over the corpus (quality-targeted
document selection — the retrieval side of data curation) and int8
symmetric quantization of the embedding column (the storage/serving
compression step that precedes ANN indexing; PQ in operators/pq.py is the
sub-vector generalization).

Reference parity: the reference delegates analytics to a provisioned
ClickHouse server (reference docker-compose.yml:155-174); full-text
scoring there is hasToken/multiSearch + manual tf-idf arithmetic, and
int8 embedding compression is the standard pre-index step ClickHouse's
vector indices apply. Both are native Spark here.

Float determinism (the oracle hashes raw values): BM25's log-idf is a
transcendental, and libm `ln` differs in the last ulp across engines —
the same reason x_pmi_pairs reports lift instead of log-lift. The score
here therefore uses the RAW Robertson idf ratio (N - df + 0.5)/(df + 0.5)
without the log. Per term this is a strictly monotone transform of
log-idf (identical per-term ranking); across a multi-term sum it is the
standard "raw idf" BM25 variant. Every arithmetic step is fixed-order
IEEE754 (+ , ×, ÷ are correctly rounded), so Spark and DuckDB produce
bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textstats as TS
from ..registry import query
from ..tables import load_tables
from ._exprs import SQL_NORM

_SQL_TOKENS = f"string_split({SQL_NORM}, ' ')"

# Fixed probe query — the retrieval target. Tokens are from the corpus
# vocabulary (mid-df); the query is a constant of the declared query, the
# way the CMS probe set and the decontamination benchmark are.
BM25_TERMS = ("merge", "window", "join")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

# The oracle mirrors the Spark expression tree token for token: same
# association order in the saturation denominator, same left-assoc
# 3-term sum (per-term contributions pivoted to columns so the addition
# order is FIXED — a SUM() over the terms would be order-nondeterministic
# in both engines).
_CONTRIB = {
    t: (
        f"( (CAST(n_docs - df_{t} AS DOUBLE) + 0.5) / (CAST(df_{t} AS DOUBLE) + 0.5) )"
        f" * (CAST(tf_{t} AS DOUBLE) * {BM25_K1 + 1.0})"
        f" / (CAST(tf_{t} AS DOUBLE)"
        f"    + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}"
        f"      * (CAST(dl AS DOUBLE) / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    )
    for t in BM25_TERMS
}

KEYWORD_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS token
  FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
), tf AS (
  SELECT doc_id, dl,
         {", ".join(f"SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS tf_{t}" for t in BM25_TERMS)}
  FROM toks WHERE token IN {BM25_TERMS!r}
  GROUP BY doc_id, dl
), dfs AS (
  SELECT {", ".join(f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in BM25_TERMS)}
  FROM tf
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS total_dl
  FROM documents
)
SELECT doc_id,
       CAST({" + ".join(f"(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)" for t in BM25_TERMS)} AS INTEGER)
         AS n_matched,
       {" + ".join(f"(CASE WHEN tf_{t} > 0 THEN {_CONTRIB[t]} ELSE 0.0 END)" for t in BM25_TERMS)}
         AS score
FROM tf CROSS JOIN dfs CROSS JOIN tot
ORDER BY score DESC, doc_id
LIMIT {BM25_TOPK}
"""


@query("x_keyword_bm25", oracle=KEYWORD_BM25_SQL, tags=("ext", "text", "retrieval"))
def x_keyword_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-style top-{BM25_TOPK} document retrieval for a fixed
    {len(BM25_TERMS)}-term query (k1={BM25_K1}, b={BM25_B}; raw Robertson
    idf ratio — log-free for cross-engine bit-exactness, see module doc).

    Scale shape: ONE explode over the corpus with the probe-term filter
    applied directly on the exploded token — everything past that filter
    is bounded by occurrences of the query terms, never corpus-sized. The
    document length rides the explode (no join back to the corpus), the
    per-term document frequencies and the corpus totals are 1-row
    aggregates broadcast onto the tf table, and per-term contributions are
    PIVOTED to columns so the multi-term sum is a fixed-order scalar
    expression (bit-exact, and no second shuffle). Top-k is
    TakeOrdered — no global sort. Plan-asserted: no sort-merge join, no
    corpus-sized exchange after the tf aggregate."""
    t = load_tables(spark, sf_dir)
    k1, b = BM25_K1, BM25_B
    toks = t["documents"].select(
        "doc_id",
        F.size(TS.tokens()).alias("dl"),
        F.explode(TS.tokens()).alias("token"),
    ).filter(F.col("token").isin(*BM25_TERMS))
    tf = toks.groupBy("doc_id", "dl").agg(
        *[
            F.sum(F.when(F.col("token") == t_, 1).otherwise(0)).alias(f"tf_{t_}")
            for t_ in BM25_TERMS
        ]
    )
    dfs = tf.agg(
        *[
            F.sum(F.when(F.col(f"tf_{t_}") > 0, 1).otherwise(0)).alias(f"df_{t_}")
            for t_ in BM25_TERMS
        ]
    )
    tot = t["documents"].agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(TS.tokens())).cast("long").alias("total_dl"),
    )
    scored = tf.join(F.broadcast(dfs)).join(F.broadcast(tot))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")

    def contrib(t_: str) -> F.Column:
        tfc = F.col(f"tf_{t_}").cast("double")
        idf = (
            (F.col("n_docs") - F.col(f"df_{t_}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{t_}").cast("double") + F.lit(0.5))
        denom = tfc + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
        return idf * (tfc * F.lit(k1 + 1.0)) / denom

    score = None
    matched = None
    for t_ in BM25_TERMS:
        c = F.when(F.col(f"tf_{t_}") > 0, contrib(t_)).otherwise(F.lit(0.0))
        m = F.when(F.col(f"tf_{t_}") > 0, 1).otherwise(0)
        score = c if score is None else score + c
        matched = m if matched is None else matched + m
    return (
        scored.select(
            "doc_id",
            matched.cast("int").alias("n_matched"),
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# Int8 symmetric embedding quantization.
# ---------------------------------------------------------------------------

EMBED_QUANT_SQL = """
WITH x AS (
  SELECT vec_id,
         list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
  FROM embeddings
), s AS (
  SELECT vec_id, v,
         127.0 / list_max(list_transform(v, e -> abs(e))) AS scale
  FROM x
  WHERE list_max(list_transform(v, e -> abs(e))) > 0
)
SELECT vec_id,
       scale,
       CAST(len(v) AS INTEGER) AS n_dims,
       md5(array_to_string(
         list_transform(v, e -> CAST(CAST(floor(e * scale + 0.5) AS BIGINT) AS VARCHAR)),
         ',')) AS codes_md5,
       list_max(list_transform(v, e -> abs(e - floor(e * scale + 0.5) / scale)))
         AS max_abs_err
FROM s
"""


@query("x_embedding_quantize", oracle=EMBED_QUANT_SQL, tags=("ext", "embeddings"))
def x_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric per-vector quantization of the embedding column:
    scale = 127/max|x|, code_i = ⌊x_i·scale + 0.5⌋ (4× compression; the
    standard pre-index step before ANN serving — PQ in operators/pq.py is
    the sub-vector generalization of this). Reports the deterministic
    artifacts: the scale, an md5 over the exact int8 code string, and the
    max absolute reconstruction error.

    Scale shape: a PURE NARROW MAP — one scan, zero exchanges
    (plan-asserted, same profile as x_random_projection). At 100 TB this
    is the shape you want for a re-encode pass: no shuffle, no UDF
    (higher-order JVM expressions only), output partitioning inherits the
    scan. Rounding is ⌊v+0.5⌋ rather than round() half-even/half-up
    ambiguity — floor is identically defined IEEE754 on both engines.
    All-zero vectors (scale undefined) are filtered identically on both
    sides."""
    t = load_tables(spark, sf_dir)
    xd = F.transform("embedding", lambda e: e.cast("double"))
    emb = t["embeddings"].select("vec_id", xd.alias("v"))
    amax = F.array_max(F.transform("v", F.abs))
    emb = emb.withColumn("scale", F.lit(127.0) / amax).filter(amax > 0)
    code = lambda e: F.floor(e * F.col("scale") + F.lit(0.5))  # noqa: E731
    codes_str = F.concat_ws(
        ",", F.transform("v", lambda e: code(e).cast("string"))
    )
    err = F.array_max(
        F.transform("v", lambda e: F.abs(e - code(e).cast("double") / F.col("scale")))
    )
    return emb.select(
        "vec_id",
        "scale",
        F.size("v").alias("n_dims"),
        F.md5(codes_str).alias("codes_md5"),
        err.alias("max_abs_err"),
    )
