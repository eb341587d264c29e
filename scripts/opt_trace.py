#!/usr/bin/env python
"""Per-job / per-stage trace of one query (guide §7.1 without the UI):
run the query once with the event log enabled, then print every job
(duration, description) and its stages (duration, name, task count,
shuffle bytes). This is the measure-first tool for deciding WHERE a
query's wall-clock goes at local[32].

Usage: python scripts/opt_trace.py <query> [--sf-dir DIR] [--warm]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", action="store_true",
                    help="run once untimed before the traced run")
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="spark_trace_")
    import __spark_entry__ as e
    from mr_mpi_blast_spark.session import get_spark
    spark = get_spark("opt_trace", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
    })
    fn = e.queries()[args.query]
    if args.warm:
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.stop()

    jobs, stages = {}, {}
    paths = [p for p in glob.glob(os.path.join(log_dir, "**", "*"),
                                  recursive=True) if os.path.isfile(p)]
    for path in paths:
        for line in open(path, errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not isinstance(ev, dict):
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "dur": (com - sub) / 1000 if sub and com else None,
                    "tasks": si["Number of Tasks"],
                }

    print(f"\n=== {args.query}: wall {wall:.3f}s, {len(jobs)} jobs, "
          f"{len(stages)} completed stages ===")
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000
        print(f"job {jid:3d}  {dur:7.3f}s  {j['desc'][:60]}")
        for sid in sorted(j["stages"]):
            if sid in stages:
                s = stages[sid]
                d = f"{s['dur']:.3f}" if s["dur"] is not None else "  -  "
                print(f"    stage {sid:3d}  {d:>8}s  {s['tasks']:4d}t  "
                      f"{s['name']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
