"""NCBI kernel tests: the outfmt-6 parser and canonical mapping are
pure and tested without BLAST+; the subprocess path is gated."""

import os

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


FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ncbi_blastn_outfmt6_std_qlen.tsv")


def test_ncbi_kernel_subprocess_path_with_fake_blast(spark, tmp_path,
                                                     monkeypatch):
    """Ungated end-to-end drive of the subprocess kernel: fake
    makeblastdb/blastn executables on PATH let the REAL kernel code
    run — staged-volume read, FASTA materialization, makeblastdb
    invocation + db cache, the full blastn command line, and the
    outfmt-6 decode of bytes delivered through an actual subprocess.

    The committed fixture is hand-constructed to BLAST's documented
    ``-outfmt '6 std qlen'`` conventions (pident %.3f, e-values
    "2e-55"/"0.001"/"0.0", integer and fractional bit scores, a
    minus-strand row with sstart > send) — this container has no
    BLAST+, so the bytes are format-faithful, not captured from a
    run; cross-engine value parity still requires a real install
    (the gated parity test above). What IS pinned here, against the
    reference's contract (mrblast.cpp:700-1176, doc/USERGUIDE:53-66):
    -dbsize carries the WHOLE database residue count (S8), config
    options are forwarded, and the decode + canonical projection is
    exercised on realistic bytes end-to-end."""
    from mr_mpi_blast_spark.kernel.ncbi import make_ncbi_block_kernel
    from mr_mpi_blast_spark.plans.pipeline import stage_volumes

    subj_rows = [("s_near", "ACGT" * 50, "p0"), ("s_rc", "TTGA" * 60, "p0"),
                 ("s_other", "GATTACA" * 20, "p1")]
    subjects = spark.createDataFrame(subj_rows, ["sid", "seq", "db_part"])
    db_dir, residues, n_seqs = stage_volumes(
        subjects, scratch_dir=str(tmp_path / "vols"))
    assert residues == sum(len(s) for _, s, _ in subj_rows)

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    capture = tmp_path / "argv.txt"
    qcap = tmp_path / "queries.fa"
    (bin_dir / "makeblastdb").write_text(
        "#!/bin/sh\n"
        "out=; prev=; for a in \"$@\"; do "
        "[ \"$prev\" = '-out' ] && out=$a; prev=$a; done\n"
        "touch \"$out.ndb\"\n")
    (bin_dir / "blastn").write_text(
        "#!/bin/sh\n"
        f"echo \"$@\" >> {capture}\n"
        "q=; prev=; for a in \"$@\"; do "
        "[ \"$prev\" = '-query' ] && q=$a; prev=$a; done\n"
        f"cat \"$q\" >> {qcap}\n"
        f"cat {FIXTURE}\n")
    for b in ("makeblastdb", "blastn"):
        os.chmod(bin_dir / b, 0o755)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    cfg = BlastConfig(task="blastn", word_size=16, reward=2, penalty=-3,
                      evalue=1e-3, max_target_seqs=10)
    kernel = make_ncbi_block_kernel(db_dir, cfg, gen="t0", dbsize=residues)
    import pandas as pd
    pdf = pd.DataFrame({"qid": [101, 102], "seq": ["ACGT" * 30, "TTGA" * 25],
                        "db_part": ["p0", "p0"]})
    out = kernel(pdf)

    # decode path: the subprocess bytes round-trip the parser exactly
    want = parse_outfmt6(open(FIXTURE).read())
    pd.testing.assert_frame_equal(out.reset_index(drop=True), want)
    assert out.iloc[1]["sstart"] == 200 and out.iloc[1]["send"] == 141
    assert out.iloc[3]["evalue"] == 0.0

    # command contract: whole-db -dbsize (S8), outfmt, forwarded options
    argv = capture.read_text().strip().split("\n")
    assert len(argv) == 1                    # one block -> one invocation
    args = argv[0].split()
    def val(flag):
        return args[args.index(flag) + 1]
    assert val("-dbsize") == str(residues)   # whole DB, not partition p0
    assert "6 std qlen" in argv[0]
    assert val("-word_size") == "16" and val("-reward") == "2" \
        and val("-penalty") == "-3"
    assert val("-evalue") == "0.001" and val("-max_target_seqs") == "10"
    # the query FASTA the kernel materialized reached the subprocess
    assert ">101" in qcap.read_text() and ">102" in qcap.read_text()

    # db cache: a second call in the same worker must NOT re-run
    # makeblastdb (fake blastn appends -> argv grows by exactly one)
    kernel(pdf)
    assert len(capture.read_text().strip().split("\n")) == 2

    # canonical projection over the decoded rows (golden values)
    canon = {(r.qid, r.sid): r for r in to_canonical(
        spark.createDataFrame(out, schema=NCBI_HITS)).collect()}
    r = canon[(101, "s_rc")]
    assert r.sstart == 200 and r.send == 141      # strand swap preserved
    assert r.ident == pytest.approx(91.667) and r.gaps == 2
    assert canon[(102, "s_exact")].evalue == 0.0
    assert canon[(102, "s_exact")].bitscore == pytest.approx(167.0)
