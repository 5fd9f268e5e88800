"""Fuzzy edit-distance join: complete against a brute-force DP oracle."""

from __future__ import annotations

from python_cdc_postgres_to_clickhouse_spark.operators.fuzzy import fuzzy_pairs
from python_cdc_postgres_to_clickhouse_spark.tables import load_tables

from .conftest import SF_SMOKE


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, sa), (ib, sb) = rows[i], rows[j]
            if abs(len(sa) - len(sb)) <= k:
                d = _lev(sa, sb)
                if d <= k:
                    lo, hi = min(ia, ib), max(ia, ib)
                    out.add((lo, hi, d))
    return out


def test_fuzzy_pairs_complete_on_part_names(spark):
    parts = load_tables(spark, SF_SMOKE)["part"]
    k = 3
    got = {
        (r["ida"], r["idb"], r["distance"])
        for r in fuzzy_pairs(parts, "p_partkey", "p_name", max_distance=k).collect()
    }
    rows = [
        (r["p_partkey"], r["p_name"].strip().lower())
        for r in parts.select("p_partkey", "p_name").collect()
    ]
    exp = _brute(rows, k)
    assert got == exp
    assert exp, "fixture part names should contain fuzzy matches at k=3"


def test_fuzzy_pairs_planted_typos_and_shorts(spark):
    rows = [
        (1, "Widget Deluxe"),
        (2, "widget delxe"),      # 1 deletion from normalized #1
        (3, "widgot delxue"),     # a couple of edits away
        (4, "completely different thing"),
        (5, "ab"),                # short-string band
        (6, "ac"),
        (7, "b"),
        (8, "ab"),                # duplicate short string, distinct id
    ]
    df = spark.createDataFrame(rows, "id: long, name: string")
    got = {
        (r["ida"], r["idb"], r["distance"])
        for r in fuzzy_pairs(df, "id", "name", max_distance=2).collect()
    }
    exp = _brute([(i, s.strip().lower()) for i, s in rows], 2)
    assert got == exp
    # Sanity on specific planted relations.
    assert (1, 2, 1) in got
    assert (5, 6, 1) in got and (5, 8, 0) in got and (6, 8, 1) in got
    assert (5, 7, 1) in got  # 'ab' -> 'b' is one deletion
    assert not any(4 in (a, b) for a, b, _ in got)
