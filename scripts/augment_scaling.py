#!/usr/bin/env python
"""Fold targeted bench_scaling.py runs into an existing SCALING.json.

For operators added after a full-suite sweep, re-running the whole
suite is wasteful; instead run

    python scripts/bench_scaling.py new_query [...] > runT0.json   # x N

and fold the new queries' rows into the committed SCALING.json with

    python scripts/augment_scaling.py SCALING.json runT0.json runT1.json [...]

Rows for other queries are left untouched. Queries present in the
targeted runs have their rows FOLDED with the previously recorded
ones — timings_min takes the min of old and new per sf (noise on
this box is additive, so the cross-run minimum is the floor and a
noisy targeted run must never RAISE it), exponent spreads widen to
cover both, and exponents_sf1_min recomputes from the merged minima
(dropped if the merged row lost its sf1.0 point, never left stale).
Pass --replace to overwrite a query's rows instead — ONLY for a
re-routed implementation whose new timings supersede the old path's
(verify the new path is faster at every sf first, as the r9 BLAS IVF
re-route was). The raw targeted runs are appended under
timings_per_run as run_aug_<i> so the provenance is inspectable.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--replace"]
    replace = "--replace" in sys.argv[1:]
    if len(args) < 2:
        raise SystemExit(__doc__)
    scaling = json.load(open(args[0]))
    runs = [json.load(open(p)) for p in args[1:]]

    names = sorted(set().union(*(r["timings"] for r in runs)))
    for q in names:
        vals = [r["exponents"][q] for r in runs if q in r.get("exponents", {})]
        if not replace and q in scaling["exponent_spread"]:
            old = scaling["exponent_spread"][q]
            vals += [old["min"], old["max"]]
        if vals:
            scaling["exponent_spread"][q] = {"min": min(vals),
                                             "max": max(vals)}
        vals1 = [r["exponents_sf1"][q] for r in runs
                 if q in r.get("exponents_sf1", {})]
        if not replace and q in scaling.get("exponent_spread_sf1", {}):
            old = scaling["exponent_spread_sf1"][q]
            vals1 += [old["min"], old["max"]]
        if vals1:
            scaling["exponent_spread_sf1"][q] = {"min": min(vals1),
                                                 "max": max(vals1)}
        sfs = set().union(*(r["timings"].get(q, {}) for r in runs))
        prev = {} if replace else scaling["timings_min"].get(q, {})
        tmin = {sf: min([r["timings"][q][sf] for r in runs
                         if sf in r["timings"].get(q, {})]
                        + ([prev[sf]] if sf in prev else []))
                for sf in sorted(sfs | set(prev))}
        scaling["timings_min"][q] = tmin
        if "0.1" in tmin and "1.0" in tmin and tmin["0.1"] > 0:
            scaling["exponents_sf1_min"][q] = round(
                math.log10(tmin["1.0"] / tmin["0.1"]), 2)
        else:
            scaling["exponents_sf1_min"].pop(q, None)

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
