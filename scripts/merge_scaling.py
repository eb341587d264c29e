#!/usr/bin/env python
"""Merge two bench_scaling.py runs into SCALING.json.

Two independent runs of the same code+data give an honest per-query
exponent SPREAD (this box's burst noise moves single-decade exponents
by up to ~1.0 for sub-second queries); the robust signals are the
median exponents and which queries are data-bound in BOTH runs.

Usage: python scripts/merge_scaling.py runA.json runB.json > SCALING.json
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    runs = [a, b]

    spread: dict[str, dict[str, float]] = {}
    names = sorted(set(a["exponents"]) | set(b["exponents"]))
    for q in names:
        vals = [r["exponents"][q] for r in runs if q in r["exponents"]]
        spread[q] = {"min": min(vals), "max": max(vals)}
    medians = [round(statistics.median(r["exponents"].values()), 2)
               for r in runs]

    sf1 = sorted(set(a.get("exponents_sf1", {}))
                 & set(b.get("exponents_sf1", {})))
    spread_sf1 = {q: {"min": min(a["exponents_sf1"][q],
                                 b["exponents_sf1"][q]),
                      "max": max(a["exponents_sf1"][q],
                                 b["exponents_sf1"][q])}
                  for q in sf1}
    medians_sf1 = [round(statistics.median(r["exponents_sf1"].values()), 2)
                   for r in runs if r.get("exponents_sf1")]

    data_bound = [q for q in names
                  if all(q in r["exponents"] and r["exponents"][q] >= 0.7
                         for r in runs)]

    out = {
        "note": ("Two independent runs of scripts/bench_scaling.py on the "
                 "same code+data. Per-query single-decade exponents carry "
                 "the box's burst noise (run-to-run spread up to ~1.0 in "
                 "alpha for sub-second queries); the robust signals are "
                 "the medians (suite is fixed-overhead bound at these "
                 "sizes) and the absolute timings. Queries whose BOTH "
                 "runs show alpha >= 0.7 are the genuinely data-bound "
                 "ones."),
        "median_alpha": medians,
        "median_alpha_sf1": medians_sf1,
        "both_runs_data_bound": data_bound,
        "exponent_spread": spread,
        "exponent_spread_sf1": spread_sf1,
        "timings_run_a": a["timings"],
        "timings_run_b": b["timings"],
        "reps_per_run": a.get("reps"),
        "sf1_dir": a.get("sf1_dir"),
        "sf1_excluded": a.get("sf1_excluded"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
