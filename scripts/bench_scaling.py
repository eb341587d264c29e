#!/usr/bin/env python
"""Per-query scaling trend across the provided scale factors.

Runs every benched query at sf0.001 / sf0.01 / sf0.1 in ONE process
(shared JIT warmup), takes the median of N reps per (query, sf), and
reports the scaling exponent alpha from t ~ sf^alpha fitted on the
last decade (sf0.01 -> sf0.1):

    alpha = log10(t(0.1) / t(0.01))

alpha ~ 0 = fixed-overhead bound (job launch dominates), ~1 = linear
in data (the healthy shape for scans/aggs/joins at this size), > 1 =
superlinear — the queries to watch at 100 TB.

sf1.0 context: the driver provides sf{0.001,0.01,0.1} only and
TESTDATA.md forbids regenerating testdata; synthesizing sf1.0 by
replicating sf0.1 would multiply every document 10x and corrupt the
dedup/similarity workloads' semantics (10 exact copies of every text),
so the trend is fitted on real data and the sf1.0 hole is documented
rather than faked.

Prints one JSON line: {"exponents": {q: alpha}, "timings": {...}}.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]


def main() -> None:
    reps_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    import __spark_entry__ as e
    from bench import CORRECTNESS_ONLY, _clear_raw_cache
    from mr_mpi_blast_spark.session import get_spark

    spark = get_spark("bench_scaling")
    qs = {k: v for k, v in e.queries().items() if k not in CORRECTNESS_ONLY}

    timings: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[1]
        for name, fn in qs.items():
            if name == "blast_pipeline":
                _clear_raw_cache(sf_dir)
            runs = []
            try:
                for _ in range(reps_n):
                    t0 = time.time()
                    (fn(spark, sf_dir).write.format("noop")
                     .mode("overwrite").save())
                    runs.append(time.time() - t0)
                    spark.catalog.clearCache()
            except Exception as ex:
                print(f"scaling: {name}@{sf} failed: {ex}", file=sys.stderr)
                continue
            if name == "blast_pipeline" and len(runs) > 1:
                # rep 1 is the deliberately-cold kernel run; mixing it
                # into the median would blend kernel-execution scaling
                # with the warm read path's (bench.py separates these
                # for the same reason)
                runs = runs[1:]
            timings.setdefault(name, {})[sf] = round(
                statistics.median(runs), 3)

    exponents = {}
    for name, t in timings.items():
        if "0.01" in t and "0.1" in t and t["0.01"] > 0:
            exponents[name] = round(math.log10(t["0.1"] / t["0.01"]), 2)
    print(json.dumps({"exponents": exponents, "timings": timings,
                      "reps": reps_n}))


if __name__ == "__main__":
    main()
