#!/usr/bin/env python
"""Per-query oracle checker: verify named queries (or all) against their
DuckDB oracles at a given sf_dir. Mirrors the external driver's
rows+schema+hash compare (vhash — column-wise repr, never iterrows).

Usage:
  python tools/check_queries.py sf0.01 q1_pricing_summary j_star_broadcast
  python tools/check_queries.py sf0.1 --all
Must run with cwd=/root/repo (executors import the package by path).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_cdc_postgres_to_clickhouse_spark.registry import all_queries
from python_cdc_postgres_to_clickhouse_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def vhash(df) -> str:
    cols = sorted(df.columns)
    canon = [[repr(v) for v in df[c]] for c in cols]
    return hashlib.sha256(
        "\n".join(sorted("|".join(vals) for vals in zip(*canon))).encode()
    ).hexdigest()[:16]


def main() -> None:
    import duckdb

    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    sf_dir = sf if os.path.isabs(sf) else f"/root/testdata/{sf}"
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    specs = all_queries()
    if "--all" in sys.argv or not names:
        names = [n for n, s in specs.items() if s.oracle is not None]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(app_name="check_queries")
    bad = []
    for name in names:
        spec = specs[name]
        sql = spec.resolve_oracle(sf_dir)
        if sql is None:
            out = spec.fn(spark, sf_dir).toPandas()
            status = "rows_only" if len(out) > 0 else "ROWS_ONLY_EMPTY"
            print(f"{name}: {status} ({len(out)} rows)")
            if len(out) == 0:
                bad.append(name)
            continue
        s = spec.fn(spark, sf_dir).toPandas()
        o = con.execute(sql).fetchdf()
        ok = (len(s), vhash(s)) == (len(o), vhash(o))
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(s)} vs {len(o)} rows)")
        if not ok:
            bad.append(name)
    print("MISMATCH:", bad) if bad else print("ALL MATCH", len(names))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
