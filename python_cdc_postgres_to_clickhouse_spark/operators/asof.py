"""As-of join (SURVEY §2.4 / §4): two implementations with one semantic.

Spark SQL has no native ASOF JOIN. The engine offers:
- **Composition** (`asof_join_composed`): range join on (key, ts ≤ t) +
  per-left-row max + left join back — pure JVM, oracle-checkable, used by
  the declared query `j_asof_latest_event`. Cost: the range join can
  amplify (each left row meets every earlier right row of its key before
  the aggregate collapses them); a tolerance bounds the amplification to
  the rows inside the band, exactly like the interval-overlap bucket trick.
- **Cogrouped merge_asof** (`asof_join_pandas`): per-key cogroup, one
  sorted `pd.merge_asof` per key group over Arrow batches. No pair
  amplification — O(|L| + |R|) per key after the shuffle — the better plan
  when keys have many right-side rows. Returns full right-row payloads
  (the composition only returns the matched timestamp unless re-joined).

Both support ``direction`` ("backward": greatest right_ts ≤ left_ts, the
ClickHouse ASOF JOIN ``<=`` form; "forward": smallest right_ts ≥ left_ts,
the ``>=`` form) and an optional ``tolerance_us`` band (pandas
merge_asof's ``tolerance``): matches farther than the band are NULL.
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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row: the nearest right_ts at-or-before (backward) /
    at-or-after (forward) its left_ts of the same key, optionally within
    ``tolerance_us`` microseconds (null when no such right row exists)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l = left
    r = right.select(F.col(key).alias("_rk"), F.col(right_ts).alias("_rts"))
    lt = F.col(left_ts)
    rt = F.col("_rts")
    # Direct timestamp comparison + interval arithmetic: works for both
    # TIMESTAMP and TIMESTAMP_NTZ columns (unix_micros would reject NTZ).
    tol = (
        F.expr(f"INTERVAL {int(tolerance_us)} MICROSECOND")
        if tolerance_us is not None
        else None
    )
    if direction == "backward":
        cond = rt <= lt
        if tol is not None:
            cond = cond & (rt >= lt - tol)
        pick = F.max("_rts")
    else:
        cond = rt >= lt
        if tol is not None:
            cond = cond & (rt <= lt + tol)
        pick = F.min("_rts")
    matched = (
        l.join(r, (F.col("_rk") == F.col(key)) & cond)
        .groupBy(*left.columns)
        .agg(pick.alias("asof_ts"))
    )
    return left.join(matched, left.columns, "left")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Cogrouped merge_asof: left rows enriched with the nearest right row
    at-or-before (backward) / at-or-after (forward) their timestamp, per
    key, optionally within ``tolerance_us``.

    Tie-break among right rows sharing the matched timestamp follows
    merge_asof over the payload-ascending secondary sort: backward takes
    the LAST (greatest payload), forward the FIRST (least payload) —
    pinned in tests."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rcols = right_value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    out_fields = list(left.schema.fields)
    out_fields.append(T.StructField("asof_ts", left.schema[left_ts].dataType))
    for c in rcols:
        out_fields.append(T.StructField(f"asof_{c}", right.schema[c].dataType))
    out_schema = T.StructType(out_fields)
    left_cols = left.columns
    tol = (
        pd.Timedelta(microseconds=int(tolerance_us))
        if tolerance_us is not None
        else None
    )

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
        # row among equal timestamps going backward (FIRST going forward),
        # and partition order is not deterministic — without this, tied
        # right rows pick arbitrarily.
        r = r.sort_values([right_ts] + rcols, kind="mergesort")[[right_ts] + rcols].rename(
            columns={right_ts: "asof_ts", **{c: f"asof_{c}" for c in rcols}}
        )
        out = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on="asof_ts",
            direction=direction,
            tolerance=tol,
        )
        return out[[f.name for f in out_fields]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, out_schema)
        .select(*left_cols, "asof_ts", *[f"asof_{c}" for c in rcols])
    )
