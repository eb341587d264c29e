"""Resumable batched execution (SURVEY §4 restart/resume; NUMITER).

The reference bounds memory by slicing the work-item set into NUMITER
sequential iterations (mrblast.cpp:199-222, doc/USERGUIDE:508-517) and
its production scripts resume by scanning run dirs for SUCCESS markers,
skipping completed partitions and re-running the rest
(examples/refseq-all-vs-all/ranger-for-loop-run.sh:131-160,
examples/production-scripts/2.all-to-all/2.run-mrblast/check_hits.py).

Spark translation: one output subdirectory per DB partition, written
with Spark's own _SUCCESS commit marker; a resume pass lists markers
and re-runs only missing partitions. Writes are idempotent (overwrite
per partition dir), so a killed run re-converges. Spill/memory bounding
within an iteration is Tungsten's job — the loop exists for fault
isolation and bounded broadcast working set, not memory.
"""

from __future__ import annotations

import dataclasses
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_mpi_blast_spark.config import BlastConfig
from mr_mpi_blast_spark.plans.pipeline import run_search


def _part_dir(out_dir: str, part: str) -> str:
    return os.path.join(out_dir, f"db_part={part}")


def completed_parts(out_dir: str) -> set[str]:
    """Partitions whose output dir carries Spark's _SUCCESS marker."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("db_part=") and os.path.exists(
                os.path.join(out_dir, name, "_SUCCESS")):
            done.add(name.split("=", 1)[1])
    return done


def run_search_resumable(queries: DataFrame, subjects: DataFrame,
                         out_dir: str, cfg: BlastConfig | None = None,
                         ) -> tuple[DataFrame, list[str]]:
    """Run the search pipeline one DB partition at a time, committing
    each to ``out_dir/db_part=<part>/`` and skipping partitions already
    marked complete. Returns (hits DataFrame over all committed
    partitions, list of partitions executed this call).

    Top-k semantics: num_hit_cutoff is applied per (query, partition
    batch) here, exactly like the reference applies NUMHITCUTOFF per
    iteration (mrblast.cpp:1224-1241 runs inside one iteration's
    reduce) — a global cutoff across batches requires the single-pass
    run_search or a final top_hits over the union (see below).
    """
    cfg = cfg or BlastConfig()
    spark = queries.sparkSession
    # S8: e-value statistics use the WHOLE database's residue and
    # sequence counts (mrblast.cpp:404-433 broadcasts the full DB
    # length before any iteration). Computing both here — not inside
    # the per-partition run_search calls, which would see ~1/N of the
    # database — keeps batched e-values identical to the single-pass
    # pipeline and keeps the F1 evalue filter admitting the same set.
    residues, count = subjects.agg(
        F.sum(F.length("seq")), F.count(F.lit(1))).first()
    cfg = dataclasses.replace(
        cfg,
        dbsize=cfg.dbsize if cfg.dbsize is not None else int(residues),
        n_seqs=cfg.n_seqs if cfg.n_seqs is not None else int(count))
    parts = [r[0] for r in
             subjects.select("db_part").distinct().orderBy("db_part").collect()]
    done = completed_parts(out_dir)
    ran: list[str] = []
    for part in parts:
        if part in done:
            continue
        part_hits = run_search(
            queries, subjects.filter(F.col("db_part") == part), cfg)
        part_hits.write.mode("overwrite").parquet(_part_dir(out_dir, part))
        ran.append(part)
    all_hits = spark.read.parquet(
        *[_part_dir(out_dir, p) for p in parts])
    return all_hits, ran
