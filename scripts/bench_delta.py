#!/usr/bin/env python
"""Compare two BENCH_r*.json files over the intersection of their
query names (the catalog grows round over round, so raw totals are not
comparable).

Usage: python scripts/bench_delta.py BENCH_r04.json BENCH_r05.json

Prints a markdown summary: comparable totals, and every query whose
ratio moved beyond the noise gate (>1.25x AND >0.25 s absolute), both
directions, sorted by absolute delta.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    # the driver's BENCH_r*.json wraps bench.py's line under "parsed"
    a, b = a.get("parsed", a), b.get("parsed", b)
    qa, qb = a["queries"], b["queries"]
    common = sorted(k for k in qa.keys() & qb.keys()
                    if qa[k] >= 0 and qb[k] >= 0)
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    print(f"## Bench delta: {sys.argv[1]} -> {sys.argv[2]}")
    print(f"- common queries: {len(common)} "
          f"(only {len(qa)}/{len(qb)} total are comparable)")
    print(f"- comparable total: {ta:.2f} s -> {tb:.2f} s "
          f"({tb / ta:.2f}x)")
    if b.get("aggregation") == "median":
        print(f"- new file aggregates {b.get('bench_reps')} reps by "
              f"median; cold runs reported separately: "
              f"{b.get('cold') or '{}'}")
    movers = []
    for k in common:
        d = qb[k] - qa[k]
        r = qb[k] / qa[k] if qa[k] > 0 else float("inf")
        if abs(d) > 0.25 and (r > 1.25 or r < 0.8):
            movers.append((abs(d), k, qa[k], qb[k], r))
    if movers:
        print("\n| query | before s | after s | ratio |")
        print("|---|---|---|---|")
        for _, k, va, vb, r in sorted(movers, reverse=True):
            print(f"| {k} | {va:.2f} | {vb:.2f} | {r:.2f}x |")
    else:
        print("\nNo query moved beyond the noise gate "
              "(>1.25x and >0.25 s).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
