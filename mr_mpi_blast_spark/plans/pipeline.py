"""The end-to-end search pipeline (SURVEY §3.1 translated to Spark).

Reference lifecycle per iteration (mrblast.cpp:513-628):
  map(run_blast over block x db-partition work items)
  -> histogram hits/query (MPI_Allreduce) -> aggregate(balanced hash)
  -> sort_keys(qid) -> convert() -> reduce(sort by evalue, top-k, save)

Spark translation implemented here:
  assign_blocks(queries)                       # S5 bp bin-packing
  per db partition (NUMITER-style driver loop, one broadcast each):
      queries.groupBy(block_id).applyInPandas(kernel)   # K1/K2
  union partitions                              # E14
  -> project_hits (P2-P9, e-values vs WHOLE dbsize)     # S8
  -> filter evalue                              # F1
  -> [optional max_target_seqs cap]             # F2
  -> top_hits window                            # O2+O3 (replaces
     histogram+aggregate+sort+convert+reduce: Catalyst plans a
     WindowGroupLimit = map-side partial top-k, and AQE handles the
     per-qid skew the reference balanced by hand, mrblast.cpp:556-575)

Scale notes (100 TB): the queries side is horizontally partitioned by
block; each DB partition is broadcast once per iteration exactly like
the reference ships volume files to every node (doc/USERGUIDE:224-264
sizes volumes ~1 GB for this reason). The driver loop over partitions
is the reference's NUMITER batching (doc/USERGUIDE:508-517) and keeps
the broadcast working set to one partition at a time.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_mpi_blast_spark.config import BlastConfig
from mr_mpi_blast_spark.functions.projections import project_hits, subject_display_id
from mr_mpi_blast_spark.kernel.builtin import RAW_HITS, make_block_kernel
from mr_mpi_blast_spark.operators.blocks import assign_blocks
from mr_mpi_blast_spark.operators.topk import top_hits, topk_per_key

# monotone id so executor-side index caches key on partition CONTENT
# (a same-named partition from a different run must not hit a stale index)
_BROADCAST_GEN = itertools.count()


def effective_dbsize(subjects: DataFrame, cfg: BlastConfig) -> int:
    """S8 (mrblast.cpp:404-433): total residue length of the WHOLE
    database, so per-partition e-values are comparable. -dbsize
    override wins when set."""
    if cfg.dbsize is not None:
        return cfg.dbsize
    return int(subjects.agg(F.sum(F.length("seq"))).first()[0])


def run_search(queries: DataFrame, subjects: DataFrame,
               cfg: BlastConfig | None = None) -> DataFrame:
    """queries(qid, seq, ...) x subjects(sid|defline, db_part, seq)
    -> canonical HITS DataFrame."""
    cfg = cfg or BlastConfig()
    spark = queries.sparkSession
    dbsize = effective_dbsize(subjects, cfg)

    # P2 once on the dimension side, before the kernel sees subjects
    if "sid" not in subjects.columns:
        subjects = subjects.withColumn("sid", subject_display_id(F.col("defline")))

    blocked = assign_blocks(queries, cfg.block_size).select("block_id", "qid", "seq")

    parts = [r[0] for r in
             subjects.select("db_part").distinct().orderBy("db_part").collect()]
    per_part: list[DataFrame] = []
    for part in parts:
        subj = [(r["sid"], r["seq"]) for r in
                subjects.filter(F.col("db_part") == part)
                        .select("sid", "seq").collect()]
        bc = spark.sparkContext.broadcast(subj)
        kernel = make_block_kernel(
            bc, cfg, cache_key=f"{part}:{next(_BROADCAST_GEN)}")
        per_part.append(
            blocked.groupBy("block_id").applyInPandas(kernel, schema=RAW_HITS))

    raw = per_part[0]
    for df in per_part[1:]:
        raw = raw.unionByName(df)           # E14 add()

    hits = project_hits(raw, dbsize=dbsize, classifier=cfg.is_classifier)
    hits = hits.filter(F.col("evalue") <= cfg.evalue)        # F1

    if cfg.max_target_seqs > 0:                              # F2
        best_per_subject = topk_per_key(
            hits, ["qid", "sid"],
            [F.col("evalue").asc(), F.col("bitscore").desc(),
             F.col("qstart").asc()], 1, rank_col="_sr").drop("_sr")
        subj_rank = topk_per_key(
            best_per_subject.select("qid", "sid", "evalue", "bitscore"),
            ["qid"],
            [F.col("evalue").asc(), F.col("bitscore").desc(), F.col("sid").asc()],
            cfg.max_target_seqs, rank_col="_tr").select("qid", "sid")
        hits = hits.join(subj_rank, ["qid", "sid"], "left_semi")

    return top_hits(hits, cfg.num_hit_cutoff)                # O2+O3


def attach_deflines(hits: DataFrame, deflines: DataFrame) -> DataFrame:
    """J3 (load_csv.py:104-142): re-attach query deflines — the
    reference's sorted sequential merge-join becomes a broadcast hash
    join; qids missing from the sidecar yield null qdef (the reference
    raises; we keep the row, SURVEY FIXTURES §4)."""
    d = deflines.select(F.col("qid"), F.col("defline").alias("_qdef"))
    return (hits.join(F.broadcast(d), "qid", "left")
                .withColumn("qdef", F.col("_qdef"))
                .drop("_qdef"))
