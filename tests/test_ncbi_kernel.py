"""NCBI kernel tests: the outfmt-6 parser and canonical mapping are
pure and tested without BLAST+; the subprocess path is gated."""

import pytest

from pyspark.sql import functions as F

from mr_mpi_blast_spark.config import BlastConfig
from mr_mpi_blast_spark.kernel.ncbi import (
    NCBI_HITS, available, parse_outfmt6, run_search_ncbi, to_canonical,
)

SAMPLE = (
    "7\tsubj_a\t98.305\t118\t2\t0\t1\t118\t531\t648\t3.2e-55\t211.0\t120\n"
    "7\tsubj_b\t75.000\t80\t18\t2\t5\t84\t979\t900\t0.0021\t48.1\t120\n"
    "9\tsubj_a\t100.000\t40\t0\t0\t1\t40\t1\t40\t4.2\t35.8\t40\n"
)


def test_parse_outfmt6():
    pdf = parse_outfmt6(SAMPLE)
    assert len(pdf) == 3
    r = pdf.iloc[0]
    assert r["qid"] == 7 and r["sid"] == "subj_a"
    assert r["pident"] == pytest.approx(98.305) and r["length"] == 118
    assert r["evalue"] == pytest.approx(3.2e-55, rel=1e-9) and r["qlen"] == 120
    # reverse-strand hit keeps BLAST's swapped subject coords
    assert pdf.iloc[1]["sstart"] == 979 and pdf.iloc[1]["send"] == 900
    assert list(pdf["qid"].dtype.name for _ in [0]) == ["int64"]


def test_parse_outfmt6_empty():
    assert parse_outfmt6("").empty
    assert parse_outfmt6("\n").empty


def test_to_canonical(spark):
    df = spark.createDataFrame(parse_outfmt6(SAMPLE), schema=NCBI_HITS)
    out = to_canonical(df, classifier=True)
    cols = [f.name for f in out.schema.fields]
    assert cols == ["qid", "qdef", "sid", "ident", "align_len", "mismatches",
                    "gaps", "qstart", "qend", "sstart", "send", "evalue",
                    "bitscore", "perc_ident", "perc_cover"]
    r = {x.qid: x for x in out.collect()}[9]
    assert r.ident == 100.0 and r.align_len == 40
    assert r.perc_ident == 100.0            # 100 * 40 / 40
    assert abs(r.perc_cover - (39 * 100.0 / 40)) < 1e-6
    # generic mode leaves classifier columns null
    g = to_canonical(df, classifier=False).first()
    assert g.perc_ident is None and g.perc_cover is None


@pytest.mark.skipif(available(), reason="BLAST+ installed: gate not hit")
def test_gated_without_blast(spark):
    docs = spark.createDataFrame(
        [(1, "ACGT" * 30)], ["qid", "seq"]).withColumn(
        "length", F.length("seq").cast("int"))
    subj = spark.createDataFrame(
        [("s1", "ACGT" * 30, "p0")], ["sid", "seq", "db_part"])
    with pytest.raises(NotImplementedError, match="not on PATH"):
        run_search_ncbi(docs, subj, BlastConfig())


@pytest.mark.skipif(not available(), reason="NCBI BLAST+ not installed")
def test_blastp_threshold_parity_with_ncbi(spark):
    """Builtin neighborhood seeding (word_size=3, T=11) vs real blastp:
    the builtin's (qid, sid) hit set must cover NCBI's for a small
    protein corpus (builtin is ungapped by default, so compare against
    blastp -ungapped; scores differ in rounding, membership must not).
    Runs only where BLAST+ exists; the in-container contract is the
    exact-arithmetic pinning in test_neighborhood.py."""
    import numpy as np
    from mr_mpi_blast_spark.plans.pipeline import run_search

    rng = np.random.default_rng(11)
    res = list("ARNDCQEGHILKMFPSTWYV")
    base = "".join(rng.choice(res, 120))
    # three subjects: one near-identical (5 substitutions), one with a
    # shared 40-residue domain, one unrelated
    mut = list(base)
    for p in (10, 35, 60, 85, 110):
        mut[p] = "A" if mut[p] != "A" else "G"
    subj_rows = [("near", "".join(mut), "p0"),
                 ("domain", "".join(rng.choice(res, 40)) + base[30:70]
                  + "".join(rng.choice(res, 40)), "p0"),
                 ("unrel", "".join(rng.choice(res, 120)), "p0")]
    queries = spark.createDataFrame(
        [(1, "q1", "q1", base, 120)],
        ["qid", "defline", "defline_part", "seq", "length"])
    subjects = spark.createDataFrame(subj_rows, ["sid", "seq", "db_part"])

    cfg = BlastConfig(task="blastp", word_size=3, threshold=11,
                      evalue=1e-3, min_score=10)
    builtin_pairs = {(r.qid, r.sid) for r in
                     run_search(queries, subjects, cfg).collect()}
    ncbi_pairs = {(r.qid, r.sid) for r in run_search_ncbi(
        queries, subjects,
        BlastConfig(task="blastp", word_size=3, evalue=1e-3,
                    extra_opts=("-threshold", "11", "-ungapped"))).collect()}
    assert ncbi_pairs <= builtin_pairs
