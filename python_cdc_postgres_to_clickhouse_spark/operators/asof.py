"""As-of join (SURVEY §2.4 / §4): two implementations with one semantic.

Spark SQL has no native ASOF JOIN. The engine offers:
- **Composition** (`asof_join_composed`): range join on (key, ts ≤ t) +
  per-left-row max + left join back — pure JVM, oracle-checkable, used by
  the declared query `j_asof_latest_event`. Cost: the range join can
  amplify (each left row meets every earlier right row of its key before
  the aggregate collapses them).
- **Cogrouped merge_asof** (`asof_join_pandas`): per-key cogroup, one
  sorted `pd.merge_asof` per key group over Arrow batches. No pair
  amplification — O(|L| + |R|) per key after the shuffle — the better plan
  when keys have many right-side rows. Returns full right-row payloads
  (the composition only returns the matched timestamp unless re-joined).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_composed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """For each left row: the greatest right_ts ≤ left_ts of the same key
    (null when no earlier right row exists)."""
    l = left
    r = right.select(F.col(key).alias("_rk"), F.col(right_ts).alias("_rts"))
    matched = (
        l.join(r, (F.col("_rk") == F.col(key)) & (F.col("_rts") <= F.col(left_ts)))
        .groupBy(*left.columns)
        .agg(F.max("_rts").alias("asof_ts"))
    )
    return left.join(matched, left.columns, "left")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """Cogrouped merge_asof: left rows enriched with the latest right row
    at-or-before their timestamp (backward direction), per key."""
    rcols = right_value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    out_fields = list(left.schema.fields)
    out_fields.append(T.StructField("asof_ts", left.schema[left_ts].dataType))
    for c in rcols:
        out_fields.append(T.StructField(f"asof_{c}", right.schema[c].dataType))
    out_schema = T.StructType(out_fields)
    left_cols = left.columns

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        l = l.sort_values(left_ts, kind="mergesort")
        if r.empty:
            out = l.copy()
            out["asof_ts"] = pd.NaT
            for c in rcols:
                out[f"asof_{c}"] = None
            return out[[f.name for f in out_fields]]
        # Secondary sort on the payload columns: merge_asof takes the LAST
        # row among equal timestamps, and partition order is not
        # deterministic — without this, tied right rows pick arbitrarily.
        r = r.sort_values([right_ts] + rcols, kind="mergesort")[[right_ts] + rcols].rename(
            columns={right_ts: "asof_ts", **{c: f"asof_{c}" for c in rcols}}
        )
        out = pd.merge_asof(
            l, r, left_on=left_ts, right_on="asof_ts", direction="backward"
        )
        return out[[f.name for f in out_fields]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, out_schema)
        .select(*left_cols, "asof_ts", *[f"asof_{c}" for c in rcols])
    )
