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
