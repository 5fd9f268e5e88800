"""Map-valued aggregation — the ClickHouse ``sumMap`` / ``minMap`` /
``maxMap`` combinator family (and the Map-combinator generally): group
rows and combine their map columns KEY-WISE, producing one map per group
whose value for key k aggregates every input map's value at k.

The reference's provisioned destination (docker-compose.yml:155-174)
exposes these for metric dictionaries (e.g. per-status-code counters per
host); the engine expresses them as a pure DataFrame composition:

    explode(map) → groupBy(group, key).agg(f) → map_from_entries(collect)

Scale notes (100 TB):
- The explode is narrow (fan-out = map size, bounded by the metric
  dictionary); the per-(group, key) aggregate partial-aggregates
  map-side, so the shuffle carries one partial per (task, group, key) —
  exactly the state the ClickHouse combinator keeps.
- The final map re-assembly is a per-group ``map_from_entries`` over a
  sorted struct array — deterministic key order, and the second
  aggregate's (group) key is a prefix of the first's (group, key), so
  hash(group, key) partitioning does NOT satisfy it: two exchanges by
  design, with the second carrying one row per (group, key) — already
  aggregate-sized. Everything is JVM built-ins; no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": lambda c: F.count(c),
    "avg": F.avg,
}


def map_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    map_col: str,
    agg: str = "sum",
    out_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``{agg}Map(map_col)`` per group: key-wise aggregation of
    map values. Keys absent from a row simply contribute nothing (same
    semantics as the combinator — maps are sparse dictionaries)."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    out_col = out_col or f"{agg}_map"
    exploded = df.select(
        *group_cols, F.explode(map_col).alias("_k", "_v")
    )
    per_key = exploded.groupBy(*group_cols, "_k").agg(
        _AGGS[agg](F.col("_v")).alias("_a")
    )
    return (
        per_key.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_k", "_a")))
            ).alias(out_col)
        )
    )


def map_agg_multi(
    df: DataFrame,
    group_cols: Sequence[str],
    map_col: str,
    aggs: Sequence[str] = ("sum", "min", "max"),
) -> DataFrame:
    """Several Map-combinators over the SAME map column in one pass —
    ``sumMap(m), minMap(m), maxMap(m)`` as one explode + one (group, key)
    shuffle + one group reassembly, instead of one pipeline per combinator.

    ClickHouse evaluates the combinators side by side over a single read;
    this is the Spark analog: all per-key aggregates share the exploded
    child and the (group, key) exchange, and the reassembly aggregate
    emits one map column per combinator. Output columns are named
    ``{agg}_map``.
    """
    bad = [a for a in aggs if a not in _AGGS]
    if bad:
        raise ValueError(f"aggs must be among {sorted(_AGGS)}, got {bad}")
    exploded = df.select(*group_cols, F.explode(map_col).alias("_k", "_v"))
    per_key = exploded.groupBy(*group_cols, "_k").agg(
        *[_AGGS[a](F.col("_v")).alias(f"_{a}") for a in aggs]
    )
    return per_key.groupBy(*group_cols).agg(
        *[
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_k", f"_{a}")))
            ).alias(f"{a}_map")
            for a in aggs
        ]
    )


def sum_map(df: DataFrame, group_cols: Sequence[str], map_col: str) -> DataFrame:
    return map_agg(df, group_cols, map_col, "sum", "sum_map")


def min_map(df: DataFrame, group_cols: Sequence[str], map_col: str) -> DataFrame:
    return map_agg(df, group_cols, map_col, "min", "min_map")


def max_map(df: DataFrame, group_cols: Sequence[str], map_col: str) -> DataFrame:
    return map_agg(df, group_cols, map_col, "max", "max_map")
