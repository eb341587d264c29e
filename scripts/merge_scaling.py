#!/usr/bin/env python
"""Merge N bench_scaling.py runs into SCALING.json.

Independent runs of the same code+data give an honest per-query
exponent SPREAD: this box's burst noise is strictly additive and can
inflate a single run's timing by 2-10x for tens of seconds at a time
(r8 observed a whole sf1.0 sweep phase degraded in one run while a
fresh-JVM standalone reproduction of the same query ran clean), so
the robust signals are the per-query MINIMUM timings (noise never
makes a query faster), the median exponents, and which queries are
data-bound in EVERY run.

Usage: python scripts/merge_scaling.py runA.json runB.json [runC.json ...] > SCALING.json
"""

from __future__ import annotations

import json
import math
import statistics
import sys


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if len(runs) < 2:
        raise SystemExit("need >= 2 run files")

    spread: dict[str, dict[str, float]] = {}
    names = sorted(set().union(*(r["exponents"] for r in runs)))
    for q in names:
        vals = [r["exponents"][q] for r in runs if q in r["exponents"]]
        spread[q] = {"min": min(vals), "max": max(vals)}
    medians = [round(statistics.median(r["exponents"].values()), 2)
               for r in runs]

    sf1_names = sorted(set.intersection(
        *(set(r.get("exponents_sf1", {})) for r in runs)))
    spread_sf1 = {q: {"min": min(r["exponents_sf1"][q] for r in runs),
                      "max": max(r["exponents_sf1"][q] for r in runs)}
                  for q in sf1_names}
    medians_sf1 = [round(statistics.median(r["exponents_sf1"].values()), 2)
                   for r in runs if r.get("exponents_sf1")]

    data_bound = [q for q in names
                  if all(q in r["exponents"] and r["exponents"][q] >= 0.7
                         for r in runs)]

    # noise-floor timings: per-query per-sf MIN across runs (additive
    # noise can only inflate), plus the exponents those minima imply
    min_timings: dict[str, dict[str, float]] = {}
    for q in sorted(set().union(*(r["timings"] for r in runs))):
        sfs = sorted(set().union(*(r["timings"].get(q, {}) for r in runs)))
        min_timings[q] = {
            sf: min(r["timings"][q][sf] for r in runs
                    if sf in r["timings"].get(q, {}))
            for sf in sfs}
    min_exponents_sf1 = {
        q: round(math.log10(t["1.0"] / t["0.1"]), 2)
        for q, t in min_timings.items()
        if t.get("0.1", 0) > 0 and "1.0" in t}

    out = {
        "note": (f"{len(runs)} independent runs of scripts/bench_scaling.py "
                 "on the same code+data. Per-query single-decade exponents "
                 "carry the box's burst noise (additive, up to 2-10x for "
                 "tens of seconds at a time); the robust signals are the "
                 "per-query minimum timings across runs (timings_min / "
                 "exponents_sf1_min), the median exponents, and the "
                 "queries whose EVERY run shows alpha >= 0.7 (the "
                 "genuinely data-bound ones)."),
        "median_alpha": medians,
        "median_alpha_sf1": medians_sf1,
        "all_runs_data_bound": data_bound,
        "exponent_spread": spread,
        "exponent_spread_sf1": spread_sf1,
        "timings_min": min_timings,
        "exponents_sf1_min": min_exponents_sf1,
        "timings_per_run": {f"run_{i}": r["timings"]
                            for i, r in enumerate(runs)},
        "reps_per_run": runs[0].get("reps"),
        "sf1_dir": runs[0].get("sf1_dir"),
        "sf1_excluded": runs[0].get("sf1_excluded"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
