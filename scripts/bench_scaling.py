#!/usr/bin/env python
"""Per-query scaling trend across the provided scale factors.

Runs every benched query at sf0.001 / sf0.01 / sf0.1 in ONE process
(shared JIT warmup), takes the median of N reps per (query, sf), and
reports the scaling exponent alpha from t ~ sf^alpha fitted per
decade:

    alpha = log10(t(sf_hi) / t(sf_lo))   per adjacent decade

alpha ~ 0 = fixed-overhead bound (job launch dominates), ~1 = linear
in data (the healthy shape for scans/aggs/joins at this size), > 1 =
superlinear — the queries to watch at 100 TB.

sf1.0: the driver provides sf{0.001,0.01,0.1} only and TESTDATA.md
forbids regenerating testdata. scripts/make_scale_decade.py
synthesizes an sf1.0 by replicating sf0.1 with per-replica key-domain
offsets (join fan-outs and per-key densities preserved exactly) AND —
since r8 — a per-replica alphabet rotation on documents.text, which
makes replicas independent populations in text space too: duplicate /
collision / kernel-hit volume scales exactly 10x instead of
quadratically. That makes the blast kernel family, the text-hash
dedup operators, decontamination, and the curation pipeline
decade-eligible. Still excluded at sf1.0: ann_*/embedding_* (no
embeddings table is synthesized — vector replication would inflate
near-dup density) and fasta_roundtrip (single-file fixture by
design); their trend stops at the real data.

blast family at sf1.0: blast_pipeline's rep 1 is the deliberately
cold kernel execution and is recorded as its own series
(blast_pipeline_cold) — the kernel is 97.5% of the reference's wall,
so its decade exponent is the headline scaling datapoint; the warm
median stays the read-path series. The other blast_* queries get one
untimed warmup per sf so a first-ever kernel run at a fresh sf (their
configs persist raw hits per config) never contaminates the tail
median.

Prints one JSON line:
{"exponents": {q: a(0.01->0.1)}, "exponents_sf1": {q: a(0.1->1.0)},
 "timings": {...}}.
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
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1.0")

# replication-UNSAFE at the synthetic sf1.0 (see module docstring).
# PREFIX families, not an enumerated list: a newly registered
# ann_*/embedding_* query must never slip into the synthetic decade by
# omission (no embeddings table exists there). The r8 per-replica text
# rotation made the blast_/dedup_/decontam/curation families eligible:
# text replicas are independent populations, so their duplicate/hit
# volume scales linearly.
SF1_EXCLUDE_PREFIXES = ("ann_", "embedding_")
SF1_EXCLUDE = {
    "fasta_roundtrip",           # fixture generation, single-file by design
}


def sf1_excluded(name: str) -> bool:
    return name in SF1_EXCLUDE or name.startswith(SF1_EXCLUDE_PREFIXES)


def main() -> None:
    reps_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    import __spark_entry__ as e
    from bench import CORRECTNESS_ONLY, _clear_raw_cache
    from mr_mpi_blast_spark.session import get_spark

    spark = get_spark("bench_scaling")
    qs = {k: v for k, v in e.queries().items() if k not in CORRECTNESS_ONLY}

    sf_dirs = list(SFS)
    have_sf1 = os.path.isdir(SF1_DIR)
    if have_sf1:
        sf_dirs.append(SF1_DIR)

    timings: dict[str, dict[str, float]] = {}
    for sf_dir in sf_dirs:
        synthetic = sf_dir == SF1_DIR
        sf = "1.0" if synthetic else sf_dir.rsplit("sf", 1)[1]
        for name, fn in qs.items():
            if synthetic and sf1_excluded(name):
                continue
            if name == "blast_pipeline":
                _clear_raw_cache(sf_dir)
            runs = []
            try:
                if name.startswith("blast_") and name != "blast_pipeline":
                    # untimed warmup: a variant config's first-ever run
                    # at this sf executes its own kernel (per-config
                    # raw-hit persist); the timed reps measure the tail
                    (fn(spark, sf_dir).write.format("noop")
                     .mode("overwrite").save())
                    spark.catalog.clearCache()
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
                # rep 1 is the deliberately-cold kernel EXECUTION —
                # recorded as its own series (the kernel is 97.5% of
                # the reference's wall; its decade exponent is the
                # headline scaling datapoint); the warm median stays
                # the read-path series, as in bench.py
                timings.setdefault("blast_pipeline_cold", {})[sf] = round(
                    runs[0], 3)
                runs = runs[1:]
            timings.setdefault(name, {})[sf] = round(
                statistics.median(runs), 3)

    exponents = {}
    exponents_sf1 = {}
    for name, t in timings.items():
        if "0.01" in t and "0.1" in t and t["0.01"] > 0:
            exponents[name] = round(math.log10(t["0.1"] / t["0.01"]), 2)
        if "0.1" in t and "1.0" in t and t["0.1"] > 0:
            exponents_sf1[name] = round(math.log10(t["1.0"] / t["0.1"]), 2)
    out = {"exponents": exponents, "timings": timings, "reps": reps_n}
    if have_sf1:
        out["exponents_sf1"] = exponents_sf1
        out["sf1_dir"] = SF1_DIR
        out["sf1_excluded"] = sorted(
            n for n in qs if sf1_excluded(n)) + [
            f"prefix:{p}*" for p in SF1_EXCLUDE_PREFIXES]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
