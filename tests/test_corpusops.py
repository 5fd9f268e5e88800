"""Corpus-analytics family (queries/corpusops.py): plan-shape assertions
(the properties that survive 100 TB) plus semantic checks the oracle can't
express — contamination must actually catch cross-split near-duplicates,
and the stratified draw must be partition-layout independent.

Value parity vs DuckDB is covered per-query by test_queries_oracle.py
(all five queries carry full oracles).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark import plans as P
from python_cdc_postgres_to_clickhouse_spark.operators import dedup as D
from python_cdc_postgres_to_clickhouse_spark.operators.sampling import assign_split
from python_cdc_postgres_to_clickhouse_spark.registry import all_queries
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_ORACLE, SF_SMOKE


def _q(spark, name):
    return all_queries()[name].fn(spark, SF_ORACLE)


# ---------------------------------------------------------------------------
# Plan shapes
# ---------------------------------------------------------------------------


def test_decontaminate_broadcasts_benchmark_side(spark):
    df = _q(spark, "x_decontaminate")
    assert P.has_broadcast_join(df), "test-split shingle set must broadcast"
    assert "CartesianProduct" not in P.physical_plan(df)


def test_ngram_and_vocab_topk_never_globally_sort(spark):
    for name in ("x_ngram_counts", "x_vocab_build"):
        plan = P.physical_plan(_q(spark, name))
        assert "TakeOrderedAndProject" in plan, f"{name}: top-k must be TakeOrdered"


def test_tfidf_broadcasts_df_table_and_group_limits(spark):
    df = _q(spark, "x_tfidf_topterms")
    assert P.has_broadcast_join(df), "document-frequency table must broadcast"
    assert P.has_window_group_limit(df), "per-doc top-k must be WindowGroupLimit"


def test_stratified_sample_uses_window_group_limit(spark):
    assert P.has_window_group_limit(_q(spark, "x_stratified_sample"))


# ---------------------------------------------------------------------------
# Semantics
# ---------------------------------------------------------------------------


def test_decontaminate_catches_cross_split_near_dups(spark):
    """Any train document whose ≥0.9-Jaccard near-duplicate landed in the
    test split MUST be flagged contaminated — that pair is exactly the
    eval-leakage case the operator exists to catch."""
    docs = load_tables(spark, SF_ORACLE)["documents"]
    split = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    pairs = [
        (r["a"], r["b"])
        for r in D.jaccard_pairs(docs, threshold=0.9).select("a", "b").collect()
    ]
    leaky_train = {
        a for a, b in pairs if split[a] == "train" and split[b] == "test"
    } | {b for a, b in pairs if split[b] == "train" and split[a] == "test"}
    if not leaky_train:
        import pytest

        pytest.skip("no near-dup pair straddles train/test at this sf")
    flagged = {
        r["doc_id"]
        for r in _q(spark, "x_decontaminate")
        .filter(F.col("contaminated"))
        .collect()
    }
    missed = leaky_train - flagged
    assert not missed, f"cross-split near-dups not flagged: {sorted(missed)}"


def test_stratified_sample_is_layout_independent(spark):
    """The same documents must be drawn regardless of partitioning — the
    property seeded DataFrame.sample lacks and the salted-md5 order has."""
    base = {(r["lang"], r["doc_id"]) for r in _q(spark, "x_stratified_sample").collect()}

    docs = load_tables(spark, SF_ORACLE)["documents"].repartition(7)
    from python_cdc_postgres_to_clickhouse_spark.queries.corpusops import STRATUM_K
    from pyspark.sql import Window as W

    h = F.md5(F.concat(F.lit("strat"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(h, F.col("doc_id"))
    relaid = {
        (r["lang"], r["doc_id"])
        for r in docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_K)
        .select("lang", "doc_id")
        .collect()
    }
    assert base == relaid
    counts: dict[str, int] = {}
    for lang, _ in base:
        counts[lang] = counts.get(lang, 0) + 1
    assert all(v <= STRATUM_K for v in counts.values())


def test_vocab_ids_are_dense_and_rank_consistent(spark):
    rows = _q(spark, "x_vocab_build").orderBy("vocab_id").collect()
    ids = [r["vocab_id"] for r in rows]
    assert ids == list(range(1, len(ids) + 1)), "vocab ids must be dense from 1"
    cnts = [(r["cnt"], r["token"]) for r in rows]
    assert cnts == sorted(cnts, key=lambda t: (-t[0], t[1])), "id order = (cnt desc, token)"


# --------------------------------------------------------------------------
# BPE merge induction (x_bpe_merges / operators.bpe)
# --------------------------------------------------------------------------


def test_bpe_classic_sennrich_example():
    """The textbook dictionary: first merges must be (e,s), (es,t),
    (est,</w>) at weight 9, with ties broken left-ascending."""
    from python_cdc_postgres_to_clickhouse_spark.operators.bpe import bpe_merges_from_dict

    d = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    got = bpe_merges_from_dict(d, 3)
    assert got == [(0, "e", "s", 9), (1, "es", "t", 9), (2, "est", "</w>", 9)]


def test_bpe_overlap_count_and_left_to_right_apply():
    """"aaa" contributes (a,a) TWICE to the count, but applying the merge
    rewrites left-to-right non-overlapping: aaa -> [aa, a]."""
    from python_cdc_postgres_to_clickhouse_spark.operators.bpe import bpe_merges_from_dict

    got = bpe_merges_from_dict([("aaa", 3)], 2)
    assert got[0] == (0, "a", "a", 6)
    # After the merge the word is [aa, a, </w>]: pairs (aa,a) and (a,</w>)
    # tie at 3; 'a' < 'aa' so (a, </w>) wins.
    assert got[1] == (1, "a", "</w>", 3)


def test_bpe_stops_on_singleton_pairs():
    from python_cdc_postgres_to_clickhouse_spark.operators.bpe import bpe_merges_from_dict

    assert bpe_merges_from_dict([("ab", 1)], 5) == []


def test_bpe_query_matches_duckdb_dict_replay(spark):
    """The Spark word-count + cap must feed the same dictionary a DuckDB
    tokenization produces; given that, the merge table is identical."""
    import duckdb

    from python_cdc_postgres_to_clickhouse_spark.operators.bpe import (
        bpe_merges_from_dict,
    )
    from python_cdc_postgres_to_clickhouse_spark.queries.corpusops import (
        _SQL_TOKENS,
        BPE_CAP,
        BPE_MERGES,
        x_bpe_merges,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    freqs = con.execute(
        f"""
        SELECT token, COUNT(*) AS n FROM (
          SELECT unnest({_SQL_TOKENS}) AS token FROM documents) t
        GROUP BY token ORDER BY n DESC, token LIMIT {BPE_CAP}
        """
    ).fetchall()
    want = bpe_merges_from_dict([(w, n) for w, n in freqs], BPE_MERGES)
    got = [tuple(r) for r in x_bpe_merges(spark, SF_SMOKE).collect()]
    assert got == want
    assert len(got) == BPE_MERGES


def test_bpe_encode_matches_python_replay(spark):
    """Every document's symbol stream from the chained-replace encode must
    equal the pure-python per-word merge apply."""
    import hashlib

    import duckdb

    from python_cdc_postgres_to_clickhouse_spark.operators.bpe import (
        apply_merges_py,
        bpe_merges_from_dict,
    )
    from python_cdc_postgres_to_clickhouse_spark.queries.corpusops import (
        _SQL_TOKENS,
        BPE_CAP,
        BPE_MERGES,
        x_bpe_encode,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    freqs = con.execute(
        f"""SELECT token, COUNT(*) AS n FROM (
              SELECT unnest({_SQL_TOKENS}) AS token FROM documents) t
            GROUP BY token ORDER BY n DESC, token LIMIT {BPE_CAP}"""
    ).fetchall()
    merges = bpe_merges_from_dict(list(freqs), BPE_MERGES)
    doc_toks = con.execute(
        f"SELECT doc_id, {_SQL_TOKENS} AS t FROM documents"
    ).fetchall()
    want = {}
    for doc_id, toks in doc_toks:
        syms = [s for w in toks for s in apply_merges_py(w, merges)]
        want[doc_id] = (
            len(toks),
            len(syms),
            hashlib.md5(" ".join(syms).encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"], r["enc_md5"])
        for r in x_bpe_encode(spark, SF_SMOKE).collect()
    }
    assert got == want
    # Compression must actually happen: merges shorten the symbol stream
    # vs chars+EOW.
    n_chars = sum(sum(len(w) + 1 for w in toks) for _, toks in doc_toks)
    assert sum(v[1] for v in got.values()) < n_chars


# ---------------------------------------------------------------------------
# X30: duplicated-span detection
# ---------------------------------------------------------------------------


def _replay_dup_spans(texts, k):
    """Brute-force Python replay of x_dup_span_detect's contract."""
    import re

    grams: dict[str, int] = {}
    per_doc = {}
    for doc_id, text in texts:
        t = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        gs = [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]
        per_doc[doc_id] = gs
        for g in gs:
            grams[g] = grams.get(g, 0) + 1
    spans = set()
    for doc_id, gs in per_doc.items():
        runs: list[list[int]] = []
        for i, g in enumerate(gs):
            if grams[g] < 2:
                continue
            p = i + 1
            if runs and p - runs[-1][1] <= k:
                runs[-1][1] = p
                runs[-1][2] += 1
            else:
                runs.append([p, p, 1])
        for s, e, n in runs:
            spans.add((doc_id, s, e + k - 1, n))
    return spans


def test_dup_span_detect_matches_python_replay(spark):
    from python_cdc_postgres_to_clickhouse_spark.queries.corpusops import DUP_SPAN_K

    texts = [
        (r["doc_id"], r["text"])
        for r in load_tables(spark, SF_ORACLE)["documents"]
        .select("doc_id", "text")
        .collect()
    ]
    expected = _replay_dup_spans(texts, DUP_SPAN_K)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in _q(spark, "x_dup_span_detect").collect()
    }
    assert expected, "fixture should contain duplicated spans"
    assert got == expected


def test_dup_span_plan_semi_joins_without_cartesian(spark):
    df = _q(spark, "x_dup_span_detect")
    plan = P.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan, "duplicate-gram membership must be a semi join"
    assert P.has_partial_aggregate(df), "gram census must partial-aggregate"


def test_recipe_epochs_covers_target_to_doc_boundary(spark):
    """x_recipe_epochs' contract: per source, the materialized token count
    Σ n_copies·n_tokens lands in [target, target + max_doc_tokens), the
    per-source targets partition the grand total exactly, and every
    document repeats at least floor(target/T_s) >= 0 times."""
    df = _q(spark, "x_recipe_epochs").toPandas()
    grand = int(df["n_tokens"].sum())
    n_sources = df["source"].nunique()
    base_target = grand // n_sources
    extra = grand % n_sources
    targets = {
        src: base_target + (1 if rank < extra else 0)
        for rank, src in enumerate(sorted(df["source"].unique()))
    }
    assert sum(targets.values()) == grand
    for src, g in df.groupby("source"):
        got = int((g["n_copies"] * g["n_tokens"]).sum())
        target = targets[src]
        assert target <= got < target + int(g["n_tokens"].max()), (
            src, target, got
        )
        assert (g["n_copies"] >= 0).all()
        # within a source, copy counts differ by at most 1 (base vs +1)
        assert g["n_copies"].max() - g["n_copies"].min() <= 1
