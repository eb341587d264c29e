#!/usr/bin/env python
"""Deterministic per-query efficiency profile: Spark JOB and STAGE
counts for every benched query at a given scale factor.

Wall-clock on this box is noisy (multi-second bursts — see bench.py's
methodology note); job/stage counts are exact and reproducible, so
they are the right signal for "did this refactor remove a Spark job"
and for spotting queries whose ~1 s cost is pure job-launch overhead
(SCALING.json alpha ~0.1 means the suite is fixed-overhead bound:
fewer jobs == directly less fixed overhead).

Method: each query gets a unique sparkContext job group; after a warm
run (artifact caches populated, JIT hot), the measured run executes
under the group and we count the job ids the status tracker attributes
to it, plus their stages. mapInPandas/applyInPandas barriers, driver
histograms, and artifact writes each show up as extra jobs — exactly
the costs we want visible.

Prints one JSON line: {"jobs": {q: n}, "stages": {q: n}, "sf": ...}.

Round-over-round regression flagging (r9): if a committed baseline
exists at JOB_PROFILE.json (repo root), the output gains
"job_regressions": {q: [baseline, now]} for every query whose job
count GREW since the baseline (the signal that a refactor added a
Spark job), plus "new_queries" for queries absent from the baseline —
so the profile diff is automatic instead of a manual read. Run with
--write-baseline to refresh the committed baseline after an
intentional change.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from bench import CORRECTNESS_ONLY, _clear_raw_cache
    from mr_mpi_blast_spark.session import get_spark

    spark = get_spark("job_profile")
    sc = spark.sparkContext
    qs = {k: v for k, v in e.queries().items() if k not in CORRECTNESS_ONLY}

    jobs: dict[str, int] = {}
    stages: dict[str, int] = {}
    for name, fn in qs.items():
        if name == "blast_pipeline":
            # profile the warm (persisted raw hits) path — the kernel's
            # cold job count is a property of the kernel bench, not the
            # relational read path
            _clear_raw_cache(sf_dir)
        try:
            # warm: populate artifact caches / persisted hits so the
            # measured run is the steady-state plan
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            group = f"profile_{name}"
            sc.setJobGroup(group, name)
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            finally:
                sc.setJobGroup(None, None)
            tracker = sc.statusTracker()
            ids = tracker.getJobIdsForGroup(group)
            jobs[name] = len(ids)
            n_stages = 0
            for jid in ids:
                info = tracker.getJobInfo(jid)
                if info is not None:
                    n_stages += len(info.stageIds)
            stages[name] = n_stages
            spark.catalog.clearCache()
        except Exception as ex:
            print(f"job_profile: {name} failed: {ex}", file=sys.stderr)
            jobs[name] = -1
            stages[name] = -1
    total = sum(v for v in jobs.values() if v > 0)
    out = {"jobs": jobs, "stages": stages,
           "total_jobs": total, "sf_dir": sf_dir}

    baseline_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "JOB_PROFILE.json")
    if "--write-baseline" in sys.argv:
        # failed queries (-1 sentinel) must NOT enter the baseline:
        # a persisted -1 would exempt that query from regression
        # detection forever (the compare guards on base > 0) — drop
        # them so they surface as new_queries until a clean refresh
        good = {q: n for q, n in jobs.items() if n > 0}
        with open(baseline_path, "w") as f:
            json.dump({"jobs": good,
                       "stages": {q: stages[q] for q in good},
                       "sf_dir": sf_dir}, f, indent=1, sort_keys=True)
            f.write("\n")
        out["baseline_written"] = baseline_path
        if len(good) < len(jobs):
            out["baseline_excluded_failures"] = sorted(
                q for q in jobs if q not in good)
    elif os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f).get("jobs", {})
        out["job_regressions"] = {
            q: [base[q], n] for q, n in jobs.items()
            if q in base and 0 < base[q] < n}
        out["new_queries"] = sorted(q for q in jobs if q not in base)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
