#!/usr/bin/env python
"""Compare two BENCH_DETAIL-style JSONs: per-query raw + in-run-median-
relative moves (shared-box protocol: read moves RELATIVE to the median).

Usage: python tools/compare_bench.py before.json after.json [threshold]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    moves = {n: qb[n] / qa[n] for n in common if qa[n] > 0}
    mv = sorted(moves.values())
    med = mv[len(mv) // 2]
    print(f"n={len(common)} total {sum(qa[n] for n in common):.2f} -> "
          f"{sum(qb[n] for n in common):.2f} s; median per-query move {med:.3f}")
    print(f"cal {a.get('calibration_sec')} -> {b.get('calibration_sec')}")
    rel = {n: m / med for n, m in moves.items()}
    out = [(n, qa[n], qb[n], moves[n], rel[n]) for n in common
           if rel[n] > thr or rel[n] < 1 / thr]
    out.sort(key=lambda t: t[4])
    for n, x, y, m, r in out:
        print(f"{n:36s} {x:7.3f} -> {y:7.3f}  move {m:5.2f}  rel {r:5.2f}")


if __name__ == "__main__":
    main()
