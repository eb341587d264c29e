#!/usr/bin/env python
"""Kernel thread-scaling: the flagship kernel (no persisted-raw reuse)
at 4 / 16 / 32 local threads — the single-node analog of the
reference's strong-scaling plots (BASELINE.md rows from
mrblast_cameraready_plot1.py: map phase scales near-linearly until
fixed overhead dominates).

Each measurement is a FRESH subprocess (its own JVM + Python workers)
so thread counts can't share a warmed executor pool; staged volumes
and disk-cached subject indexes ARE shared across runs (the
makeblastdb format-once model — identical to the reference, where
every rank reads the same preformatted volumes), so the number is
kernel + scheduling, not re-staging.

Prints one JSON line: {"sf_dir": ..., "threads": {"4": s, ...},
"speedup_4_to_32": r}.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from mr_mpi_blast_spark.session import get_spark
from mr_mpi_blast_spark import entry_queries as EQ
from mr_mpi_blast_spark.plans.pipeline import run_kernel_raw
sf = %(sf)r
spark = get_spark()
qmod = int(os.environ.get("SPARK_GRAFT_BENCH_QMOD", "25"))
qdf, subjects = EQ._blast_inputs(spark, sf, qmod)
cfg = EQ._blast_cfg()
if os.environ.get("SPARK_GRAFT_BENCH_GAPPED"):
    cfg = EQ._blast_gapped_cfg()
t0 = time.perf_counter()
raw, dbsize, n_seqs = run_kernel_raw(qdf, subjects, cfg,
                                     cache_key=EQ._blast_volume_key(sf))
n = raw.count()
print("KERNEL_SECONDS %%.3f ROWS %%d" %% (time.perf_counter() - t0, n))
"""


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qmod = os.environ.get("SPARK_GRAFT_BENCH_QMOD", "25")
    out = {"sf_dir": sf, "qmod": int(qmod),
           "gapped": bool(os.environ.get("SPARK_GRAFT_BENCH_GAPPED")),
           "threads": {}, "rows": None}
    for cpus in (4, 16, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run([sys.executable, "-c",
                            CHILD % {"repo": REPO, "sf": sf}],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        secs = rows = None
        for line in p.stdout.splitlines():
            if line.startswith("KERNEL_SECONDS"):
                parts = line.split()
                secs, rows = float(parts[1]), int(parts[3])
        if secs is None:
            print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"no measurement at cpus={cpus}")
        out["threads"][str(cpus)] = round(secs, 3)
        if out["rows"] is None:
            out["rows"] = rows
        elif out["rows"] != rows:
            raise SystemExit(f"row drift across thread counts: "
                             f"{out['rows']} vs {rows}")
    t4, t32 = out["threads"]["4"], out["threads"]["32"]
    out["speedup_4_to_32"] = round(t4 / t32, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
