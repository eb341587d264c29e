#!/usr/bin/env python
"""Optimization-round probe: isolate named queries, time them against
the noop sink (guide §1.4), and dump .explain("formatted") to
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default r13; guide §1.1 —
plan evidence the judge can
read without running Spark).

Usage:
    python scripts/opt_probe.py [--tag before|after] [--reps N]
                                [--sf-dir DIR] query [query ...]

Per query: one untimed warmup at sf0.001 (JIT/codegen), then N timed
noop-sink reps at the probe sf (default $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.1), cache cleared between queries. Prints min /
median / all reps — min is the steady-state signal on this bursty box,
median is what bench.py reports.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None,
                    help="dump plans/<round>/<q>_<tag>.txt (no dump if unset)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as e
    from mr_mpi_blast_spark.session import get_spark

    spark = get_spark("opt_probe")
    qs = e.queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))
    os.makedirs(plans_dir, exist_ok=True)

    warm_dir = "/root/testdata/sf0.001"
    for name in args.queries:
        fn = qs[name]
        if not args.no_warm and os.path.isdir(warm_dir) \
                and warm_dir != args.sf_dir:
            try:
                fn(spark, warm_dir).write.format("noop") \
                    .mode("overwrite").save()
            except Exception as ex:
                print(f"{name}: warmup failed: {ex}", file=sys.stderr)
            spark.catalog.clearCache()
        if args.tag:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir,
                                   f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        runs = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        print(f"{name}: min={min(runs):.3f} "
              f"median={statistics.median(runs):.3f} reps={runs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
