"""Unit tests for the round-3 pipeline operators: deterministic
sampling/splits, sequence packing, repetition signals, rolling
fingerprints, PII scrubbing. Oracle parity is covered in
test_queries_oracle.py; these assert the operator-level contracts the
oracles can't see (layout independence, fold-vs-relational equivalence,
scalable plan shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from python_cdc_postgres_to_clickhouse_spark.operators import packing as PK
from python_cdc_postgres_to_clickhouse_spark.operators import sampling as SA
from python_cdc_postgres_to_clickhouse_spark.operators import textstats as TS

from .conftest import SF_ORACLE


@pytest.fixture()
def docs(spark):
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    return load_tables(spark, SF_ORACLE)["documents"]


# ---------------------------------------------------------------------------
# Deterministic sampling / splits
# ---------------------------------------------------------------------------


def _split_pairs(df):
    return {
        (r["doc_id"], r["split"])
        for r in SA.assign_split(df, "doc_id").select("doc_id", "split").collect()
    }


def test_split_is_layout_independent(docs):
    """The whole point vs seeded sample(): repartitioning/reordering must
    not move any document between splits."""
    base = _split_pairs(docs)
    assert _split_pairs(docs.repartition(7)) == base
    assert _split_pairs(docs.orderBy(F.desc("doc_id"))) == base


def test_split_is_stable_under_corpus_growth(docs):
    """A document's split is a pure function of its key: computing on a
    subset gives the same labels as computing on the full corpus."""
    subset = docs.where(F.col("doc_id") % 3 == 0)
    full = {(d, s) for d, s in _split_pairs(docs) if d % 3 == 0}
    assert _split_pairs(subset) == full


def test_split_weights_roughly_hold(docs):
    counts = {
        r["split"]: r["n"]
        for r in SA.assign_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / total == pytest.approx(0.90, abs=0.05)


def test_split_weights_must_sum_to_buckets(docs):
    with pytest.raises(ValueError, match="must sum"):
        SA.assign_split(docs, "doc_id", weights={"train": 50, "val": 5})


def test_deterministic_sample_is_idempotent_and_sized(docs):
    s1 = {r["doc_id"] for r in SA.deterministic_sample(docs, "doc_id", 0.1).collect()}
    s2 = {
        r["doc_id"]
        for r in SA.deterministic_sample(docs.repartition(5), "doc_id", 0.1).collect()
    }
    assert s1 == s2
    n = docs.count()
    assert 0.04 * n <= len(s1) <= 0.18 * n  # ~10% ± hash noise at 500 docs


def test_sample_and_split_salts_are_independent(docs):
    """Same key, different salts → decisions must not correlate: the 10%
    sample should hold ~10% of every split, not carve out one split."""
    df = SA.assign_split(docs, "doc_id")
    sampled = SA.deterministic_sample(df, "doc_id", 0.1)
    frac = sampled.count() / df.count()
    by_split = {
        r["split"]: r["n"]
        for r in sampled.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # train is big enough for a meaningful ratio check at 500 docs
    total_train = df.where(F.col("split") == "train").count()
    assert by_split.get("train", 0) / total_train == pytest.approx(frac, abs=0.08)


# ---------------------------------------------------------------------------
# Sequence packing: two-phase prefix sum
# ---------------------------------------------------------------------------


@pytest.fixture()
def lengths(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(101)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _naive_offsets(df):
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return {
        r["doc_id"]: r["s"]
        for r in df.withColumn(
            "s", F.sum("n_tokens").over(w) - F.col("n_tokens")
        ).collect()
    }


@pytest.mark.parametrize("n_parts", [1, 4, 32, 200])
def test_two_phase_prefix_sum_matches_naive_window(lengths, n_parts):
    """Partition count (including empty partitions when n_parts > rows)
    must not change the global offsets."""
    got = {
        r["doc_id"]: r["start_offset"]
        for r in PK.global_token_offsets(lengths, n_parts=n_parts).collect()
    }
    assert got == _naive_offsets(lengths)


def test_two_phase_prefix_sum_default_parts_is_scale_adaptive(lengths):
    """Round 13: n_parts defaults to the session's core count instead of a
    hard-coded 32, and the layout is checkpoint-frozen so the totals pass
    and the running-sum pass read the SAME range boundaries (the sampled
    RangePartitioner boundaries are not guaranteed identical across two
    executions — observed as wrong offsets at sf0.1 under local[8])."""
    got = {
        r["doc_id"]: r["start_offset"]
        for r in PK.global_token_offsets(lengths).collect()
    }
    assert got == _naive_offsets(lengths)


def test_offsets_cover_token_stream_exactly(lengths):
    out = PK.global_token_offsets(lengths, n_parts=8).orderBy("doc_id").collect()
    total = sum(r["n_tokens"] for r in out)
    assert out[0]["start_offset"] == 0
    assert out[-1]["start_offset"] + out[-1]["n_tokens"] == total
    # contiguity: each doc starts where the previous one ended
    for prev, cur in zip(out, out[1:]):
        assert cur["start_offset"] == prev["start_offset"] + prev["n_tokens"]


def test_pack_bins_and_boundary_flags(spark):
    rows = [(0, 100), (1, 100), (2, 100), (3, 30)]  # budget 128
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in PK.pack_sequences(df, budget=128).collect()}
    # doc0: [0,100) bin 0; doc1: [100,200) spans 0→1; doc2: [200,300) 1→2;
    # doc3: [300,330) bin 2
    assert (out[0]["bin_first"], out[0]["bin_last"], out[0]["spans_boundary"]) == (0, 0, False)
    assert (out[1]["bin_first"], out[1]["bin_last"], out[1]["spans_boundary"]) == (0, 1, True)
    assert (out[2]["bin_first"], out[2]["bin_last"], out[2]["spans_boundary"]) == (1, 2, True)
    assert (out[3]["bin_first"], out[3]["bin_last"], out[3]["spans_boundary"]) == (2, 2, False)


def test_packing_plan_never_uses_a_global_window(docs):
    """The scale property itself: no single-partition exchange anywhere in
    the packing plan (a bare Window.orderBy would move the corpus into one
    task — Spark plans that as Exchange SinglePartition)."""
    from python_cdc_postgres_to_clickhouse_spark import plans as P

    df = PK.global_token_offsets(
        docs.select("doc_id", TS.token_count().cast("bigint").alias("n_tokens"))
    )
    plan = P.physical_plan(df)
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(pid" in plan, plan  # window keyed by materialized pid


# ---------------------------------------------------------------------------
# Repetition signals: fold vs relational ground truth
# ---------------------------------------------------------------------------


def test_repetition_fold_matches_explode_groupby(spark):
    rows = [
        (0, "a a a b c"),  # 5 tokens, 3 distinct, top = a (3)
        (1, "x"),  # single token
        (2, "one two two three three"),  # top-count tie at 2
        (3, "z z z z"),  # all same token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in TS.repetition_features(df).collect()}
    exploded = (
        df.select("doc_id", F.explode(TS.tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("count").alias("top"),
        )
    )
    for r in exploded.collect():
        g = got[r["doc_id"]]
        assert g["n_tokens"] == r["n_tokens"]
        assert g["n_distinct_tokens"] == r["n_distinct"]
        assert g["top_token_count"] == r["top"]
    assert got[3]["type_token_ratio"] == 0.25
    assert got[3]["top_token_fraction"] == 1.0


def test_repetition_plan_is_shuffle_free(docs):
    """The fold exists to avoid the explode→groupBy double shuffle: the
    whole projection must contain no Exchange at all."""
    from python_cdc_postgres_to_clickhouse_spark import plans as P

    plan = P.physical_plan(TS.repetition_features(docs))
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# Rolling fingerprint
# ---------------------------------------------------------------------------


def _py_fingerprint(text: str) -> int:
    import hashlib
    import re

    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    h = 0
    for t in toks:
        v = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        h = (h * 31 + v) % 2_147_483_647
    return h


def test_rolling_fingerprint_matches_python_reference(spark):
    rows = [(0, "the quick brown fox"), (1, "fox brown quick the"), (2, "the quick brown fox")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", TS.rolling_fingerprint().alias("fp")).collect()
    }
    assert got[0] == _py_fingerprint("the quick brown fox")
    assert got[0] == got[2]  # identical text → identical fingerprint
    assert got[0] != got[1]  # order-sensitive: permuted tokens differ


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_pii_scrub_emails_and_numbers(spark):
    rows = [
        (0, "contact a.user+tag@example.co.uk or call 555 1234"),
        (1, "no pii here"),
        (2, "ids 12 34 56"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in TS.scrub_pii(df).collect()}
    assert got[0]["n_emails"] == 1
    # digits inside the email must NOT count as numbers (email scrubbed first)
    assert got[0]["n_numbers"] == 2
    assert got[0]["scrubbed"] == "contact <EMAIL> or call <NUM> <NUM>"
    assert (got[1]["n_emails"], got[1]["n_numbers"]) == (0, 0)
    assert got[1]["scrubbed"] == "no pii here"
    assert got[2]["scrubbed"] == "ids <NUM> <NUM> <NUM>"


# ---------------------------------------------------------------------------
# Property-based contracts (hypothesis): the operators must agree with
# straight-line Python on arbitrary inputs, not just the fixtures.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    n_parts=st.integers(1, 12),
)
@pytest.mark.heavy
def test_prefix_sum_property(spark, lens, n_parts):
    """Two-phase offsets == sequential cumulative sum, for any lengths
    (zeros included) and any partition count."""
    rows = [(i, n) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["start_offset"]
        for r in PK.global_token_offsets(df, n_parts=n_parts).collect()
    }
    acc = 0
    for i, n in enumerate(lens):
        assert got[i] == acc, (i, got[i], acc)
        acc += n


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab xyz0189$é\t\n"), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=12,
    )
)
def test_rolling_fingerprint_property(spark, texts):
    """Spark's md5/conv/aggregate fold == the plain-Python Rabin-Karp on
    arbitrary text (unicode, digits, messy whitespace, empty)."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", TS.rolling_fingerprint().alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_fingerprint(t), (i, t)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=80, unique=True))
def test_split_partitions_any_key_set(spark, keys):
    """Splits are a total, disjoint cover of any key set, and agree with a
    plain-Python recomputation of the salted-md5 bucket."""
    import hashlib

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {r["doc_id"]: r["split"] for r in SA.assign_split(df, "doc_id").collect()}
    assert set(got) == set(keys)
    for k in keys:
        b = int(hashlib.md5(f"split{k}".encode()).hexdigest()[:8], 16) % 100
        want = "train" if b < 90 else ("val" if b < 95 else "test")
        assert got[k] == want, (k, b)


def test_split_partitioned_write_prunes_at_read(docs, tmp_path):
    """The downstream payoff of a materialized split column: writing
    partitionBy(split) lets a training job's read of split='train' touch
    only that partition's files (partition pruning, not a filter over
    everything)."""
    out = str(tmp_path / "splits")
    SA.assign_split(docs, "doc_id").write.partitionBy("split").parquet(out)
    spark = docs.sparkSession
    train = spark.read.parquet(out).where(F.col("split") == "train")
    from python_cdc_postgres_to_clickhouse_spark import plans as P

    plan = P.physical_plan(train)
    assert "PartitionFilters: [" in plan and "split" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan
    # and the files actually read exclude val/test directories
    n_train = train.count()
    n_all = spark.read.parquet(out).count()
    assert 0 < n_train < n_all


def test_leakage_safe_split_keeps_clusters_together(spark):
    """No near-dup cluster may straddle splits — the contamination property
    itself, checked against the declared query's own cluster structure."""
    from python_cdc_postgres_to_clickhouse_spark.operators import dedup as D
    from python_cdc_postgres_to_clickhouse_spark.operators.clusters import (
        connected_components,
    )
    from python_cdc_postgres_to_clickhouse_spark.queries.extensions import (
        x_leakage_safe_split,
    )
    from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

    split_of = {
        r["doc_id"]: r["split"]
        for r in x_leakage_safe_split(spark, SF_ORACLE).collect()
    }
    docs = load_tables(spark, SF_ORACLE)["documents"]
    comp = connected_components(D.jaccard_pairs(docs, threshold=0.6)).collect()
    clusters: dict[int, set[str]] = {}
    for r in comp:
        clusters.setdefault(r["component"], set()).add(split_of[r["vertex"]])
    assert clusters, "fixture must contain near-dup clusters"
    for c, splits in clusters.items():
        assert len(splits) == 1, f"cluster {c} straddles splits {splits}"
