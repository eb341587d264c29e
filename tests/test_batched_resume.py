"""Resumable batched execution tests (SURVEY §4 restart/resume)."""

import os
import shutil

import pytest

from pyspark.sql import functions as F

from mr_mpi_blast_spark.config import BlastConfig
from mr_mpi_blast_spark.plans.batched import completed_parts, run_search_resumable
from mr_mpi_blast_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs_subjects(spark):
    docs = load_table(spark, SF_DIR, "documents")
    queries = (docs.filter(F.col("doc_id") % 20 == 0)
               .select(F.col("doc_id").alias("qid"),
                       F.concat(F.lit("doc_"), "doc_id").alias("defline"),
                       F.concat(F.lit("doc_"), "doc_id").alias("defline_part"),
                       F.col("text").alias("seq"),
                       F.col("n_chars").cast("int").alias("length")))
    subjects = docs.select(
        F.concat(F.lit("s_"), "doc_id").alias("sid"),
        F.concat(F.lit("s_"), "doc_id").alias("defline"),
        F.concat(F.lit("p"), (F.col("doc_id") % 3).cast("string")).alias("db_part"),
        F.col("text").alias("seq"),
        F.col("n_chars").cast("int").alias("length"))
    return queries, subjects


CFG = BlastConfig(task="blastp", word_size=16, evalue=1e-3,
                  block_size=8000, num_hit_cutoff=0, max_kmer_hits=128)


def test_run_then_resume(spark, qs_subjects, tmp_path):
    queries, subjects = qs_subjects
    out = str(tmp_path / "hits")

    hits, ran = run_search_resumable(queries, subjects, out, CFG)
    assert sorted(ran) == ["p0", "p1", "p2"]
    assert completed_parts(out) == {"p0", "p1", "p2"}
    n_all = hits.count()
    assert n_all > 0

    # no-op resume: everything committed
    _, ran2 = run_search_resumable(queries, subjects, out, CFG)
    assert ran2 == []

    # knock out one partition -> only it re-runs, results converge
    shutil.rmtree(os.path.join(out, "db_part=p1"))
    hits3, ran3 = run_search_resumable(queries, subjects, out, CFG)
    assert ran3 == ["p1"]
    assert hits3.count() == n_all


@pytest.mark.slow
def test_batched_matches_single_pass(spark, qs_subjects, tmp_path):
    from mr_mpi_blast_spark.plans.pipeline import run_search
    queries, subjects = qs_subjects
    out = str(tmp_path / "hits2")
    batched, _ = run_search_resumable(queries, subjects, out, CFG)
    single = run_search(queries, subjects, CFG)
    # evalue is in the key on purpose: it is the one column the batched
    # path would compute differently if dbsize were taken per-partition
    # instead of over the whole database (S8).
    key = lambda r: (r.qid, r.sid, r.qstart, r.send, round(r.bitscore, 6),
                     float("%.6g" % r.evalue))
    assert sorted(map(key, batched.collect())) == sorted(map(key, single.collect()))
