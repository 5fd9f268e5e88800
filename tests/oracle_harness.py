"""Differential-testing harness: Spark query vs DuckDB oracle.

Mirrors the driver's correctness gate (row count + order-insensitive value
comparison) but *stricter*: values must canonicalize identically — floats
compare by exact shortest-roundtrip repr, so any nondeterministic double
aggregation fails here before it can fail in the driver.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from python_cdc_postgres_to_clickhouse_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_value(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<nan>"
        if f == 0.0:
            f = 0.0  # collapse -0.0 vs 0.0
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "<null>"
        return v.isoformat()
    if isinstance(v, datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if v is pd.NaT:
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[str]:
    # Column-wise canonicalization: iterating each Series yields values in
    # the column's own dtype. Never go through iterrows() — its per-row
    # Series upcasts all-numeric rows to float64, which launders int-vs-
    # float divergences the driver's type-sensitive hash catches (the
    # c_math_funcs rounds-1/2 blind spot).
    cols = sorted(df.columns)
    canon_cols = [[_canon_value(v) for v in df[c]] for c in cols]
    return sorted("|".join(vals) for vals in zip(*canon_cols)) if cols else []


def _col_kind(s: pd.Series) -> str:
    """Collapse a column's dtype to the class the driver hash distinguishes:
    int vs float vs bool vs string vs temporal — width (int32/int64) is
    immaterial, but `123457` != `123457.0`."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "timestamp"
    # object columns: classify by the first non-null value
    for v in s:
        if v is None or v is pd.NaT:
            continue
        if isinstance(v, Decimal):
            return "float"  # both canon via repr(float(v))
        if isinstance(v, (np.bool_, bool)):
            return "bool"
        if isinstance(v, (np.integer, int)):
            return "int"
        if isinstance(v, (np.floating, float)):
            if isinstance(v, float) and math.isnan(v):
                continue  # NaN-as-null placeholder, not a float value
            return "float"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (pd.Timestamp, datetime)):
            return "timestamp"
        if isinstance(v, date):
            return "date"
        if isinstance(v, bytes):
            return "bytes"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array"
        return "obj"
    return "null"  # all-null: wildcard, matches anything


def assert_dtype_parity(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> None:
    """Per-column type-class equality between Spark and oracle frames.
    The driver's value hash is type-sensitive (`123457` != `123457.0`), so
    bit-identical values in mismatched types still fail there — catch it
    locally."""
    bad = []
    for c in sorted(sdf.columns):
        sk, ok = _col_kind(sdf[c]), _col_kind(odf[c])
        if sk != ok and "null" not in (sk, ok):
            bad.append(f"{c}: spark={sk}({sdf[c].dtype}) oracle={ok}({odf[c].dtype})")
    assert not bad, f"{name}: column type-class mismatch — " + "; ".join(bad)


def assert_parity(spark, spec, sf_dir: str) -> None:
    """Run spec.fn on Spark and spec.oracle on DuckDB; require identical
    column names, dtype classes, row counts, and canonicalized multiset of
    rows."""
    sdf = spec.fn(spark, sf_dir).toPandas()
    odf = run_oracle(spec.resolve_oracle(sf_dir), sf_dir)
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{spec.name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{spec.name}: row count spark={len(sdf)} oracle={len(odf)}"
    )
    assert_dtype_parity(sdf, odf, spec.name)
    srows, orows = canon_rows(sdf), canon_rows(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)}/{len(srows)} rows differ; first: "
        f"spark={mismatches[0][1]!r} oracle={mismatches[0][2]!r}"
    )
