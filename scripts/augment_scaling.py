#!/usr/bin/env python
"""Fold targeted bench_scaling.py runs into an existing SCALING.json.

For operators added after a full-suite sweep, re-running the whole
suite is wasteful; instead run

    python scripts/bench_scaling.py new_query [...] > runT0.json   # x N

and fold the new queries' rows into the committed SCALING.json with

    python scripts/augment_scaling.py SCALING.json runT0.json runT1.json [...]

Existing rows are left untouched; ONLY queries present in the
targeted runs gain/replace rows in exponent_spread(_sf1),
timings_min, exponents_sf1_min, and the raw targeted runs are
appended under timings_per_run as run_aug_<i> so the provenance is
inspectable. The same min/spread semantics as merge_scaling.py: noise
on this box is additive, so cross-run minima are the floor.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    scaling = json.load(open(sys.argv[1]))
    runs = [json.load(open(p)) for p in sys.argv[2:]]

    names = sorted(set().union(*(r["timings"] for r in runs)))
    for q in names:
        vals = [r["exponents"][q] for r in runs if q in r.get("exponents", {})]
        if vals:
            scaling["exponent_spread"][q] = {"min": min(vals),
                                             "max": max(vals)}
        vals1 = [r["exponents_sf1"][q] for r in runs
                 if q in r.get("exponents_sf1", {})]
        if vals1:
            scaling["exponent_spread_sf1"][q] = {"min": min(vals1),
                                                 "max": max(vals1)}
        sfs = sorted(set().union(*(r["timings"].get(q, {}) for r in runs)))
        tmin = {sf: min(r["timings"][q][sf] for r in runs
                        if sf in r["timings"].get(q, {}))
                for sf in sfs}
        scaling["timings_min"][q] = tmin
        if "0.1" in tmin and "1.0" in tmin and tmin["0.1"] > 0:
            scaling["exponents_sf1_min"][q] = round(
                math.log10(tmin["1.0"] / tmin["0.1"]), 2)

    base = sum(1 for k in scaling.get("timings_per_run", {})
               if k.startswith("run_aug_"))
    for i, r in enumerate(runs):
        scaling.setdefault("timings_per_run", {})[
            f"run_aug_{base + i}"] = r["timings"]

    scaling["note"] = scaling.get("note", "") + (
        f" Augmented with {len(runs)} targeted runs (run_aug_*) for: "
        + ", ".join(names) + ".")
    print(json.dumps(scaling, indent=1))


if __name__ == "__main__":
    main()
