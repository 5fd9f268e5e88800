"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles joins; a *groupBy* on a pathologically hot
key still funnels that key's rows to one reducer for the partial→final
merge. Salting splits each key into ``n_salts`` subkeys for the first
aggregation, then merges the partials — the hot key's work spreads over
``n_salts`` reducers and the second shuffle carries only
|keys|·n_salts partial rows.

Only decomposable aggregates (sum/count/min/max — anything with an
associative merge) qualify; the helpers here take explicit (partial, final)
expression pairs so the decomposition is visible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` aggregate raw rows within (keys, salt); ``final_aggs``
    merge the partials per key and must reference the partial aliases.
    Results are identical to a direct groupBy (tested against the same
    oracle as the unsalted query).
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side.

    Each big-side row gets a random salt ∈ [0, n_salts); the small side is
    exploded n_salts× so every (key, salt) pair exists. The hot key's rows
    then spread over n_salts shuffle partitions instead of one. Use when a
    key is too hot even for AQE's skew splitting (which splits partitions,
    not keys) and the small side is too big to broadcast outright.

    Results are identical to ``big.join(small, big_key == small_key)``.
    """
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)),
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = salted_big.join(
        replicated_small,
        (F.col(big_key) == F.col(small_key)) & (salted_big._salt == replicated_small._salt),
    )
    return joined.drop("_salt")
