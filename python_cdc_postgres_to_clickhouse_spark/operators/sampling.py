"""Deterministic hash-based sampling / split assignment (SURVEY.md §2.7 EXT).

Training-data pipelines need *reproducible* row selection at 100 TB:
train/val/test splits that never move a document between splits when the
corpus is re-partitioned, re-ordered, or incrementally extended, and
"sample 1%" debug cuts that return the same rows on every cluster. Seeded
`DataFrame.sample` gives none of that (it is partition-layout dependent),
so these operators derive the decision from a content hash of a stable key:

    bucket(key) = int(md5(salt || key)[:8 hex]) mod n_buckets

which is a pure, narrow projection — no shuffle, no state, no layout
sensitivity — and is exactly reproducible in any engine with md5 (the
DuckDB oracles recompute it verbatim).

Reference parity: the reference pipeline (see SURVEY.md §3) has no
sampling stage — this is part of the EXT training-data surface built on
top of the same tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 hash space from the first 8 md5 hex chars; buckets must divide it
# *approximately* evenly — for n_buckets ≤ 10^6 the bias is < 0.025%.
_HEX_CHARS = 8


def md5_bucket(key: str | Column, n_buckets: int, salt: str = "") -> Column:
    """Uniform bucket in [0, n_buckets) from a salted md5 of ``key``.

    JVM-side only (md5/conv/pmod): whole-stage-codegen friendly, zero
    Python. The salt decouples independent decisions (split vs sample) on
    the same key.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, _HEX_CHARS),
        16,
        10,
    ).cast("bigint")
    return (h % F.lit(n_buckets)).cast("int")


def split_column(
    key: str | Column,
    weights: dict[str, int] | None = None,
    salt: str = "split",
    n_buckets: int = 100,
) -> Column:
    """Split label ('train'/'val'/'test' by default) from a hash bucket.

    ``weights`` are integer bucket counts summing to ``n_buckets``; label
    order follows dict insertion order, so the mapping is stable under
    re-runs and corpus growth (a new document hashes into a split; no
    existing document ever moves).
    """
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != n_buckets:
        raise ValueError(f"weights {weights} must sum to n_buckets={n_buckets}")
    b = md5_bucket(key, n_buckets, salt=salt)
    expr = None
    lo = 0
    for label, w in weights.items():
        cond = b < F.lit(lo + w)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo += w
    return expr


def assign_split(
    df: DataFrame,
    key: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label column (narrow, no shuffle)."""
    return df.withColumn(out_col, split_column(key, weights=weights, salt=salt))


def deterministic_sample(
    df: DataFrame,
    key: str,
    fraction: float,
    salt: str = "sample",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Keep rows whose hash bucket falls under ``fraction`` — the same rows
    every run, on every engine, under any partitioning. A pushdown-friendly
    single filter; at 100 TB this is one narrow scan, not a shuffle."""
    threshold = int(round(fraction * n_buckets))
    return df.where(md5_bucket(key, n_buckets, salt=salt) < F.lit(threshold))
