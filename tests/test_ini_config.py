"""mrblast.ini compatibility reader (mrblast.cpp:296-325): every ini
the reference ships — tutorial, test examples, production scripts —
parses unmodified, and the mapped values match an independent regex
scan of the raw file (so the parser can't drift from the format)."""

import glob
import os
import re

import pytest

from mr_mpi_blast_spark.config import BlastConfig, load_mrblast_ini

INIS = sorted(glob.glob("/root/reference/**/mrblast.ini", recursive=True))

pytestmark = pytest.mark.skipif(not INIS, reason="reference inis absent")


def raw_value(path: str, key: str) -> str | None:
    """Independent extraction: KEY = value with '#' comments."""
    pat = re.compile(rf"^\s*{key}\s*=\s*([^#\n]*)")
    with open(path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                return m.group(1).strip()
    return None


@pytest.mark.parametrize("path", INIS)
def test_reference_inis_parse_unmodified(path):
    """Older production inis omit some keys (NUMHITCUTOFF predates
    them) — those fall back to the base config, everything present
    must match the raw file."""
    base = BlastConfig()
    run = load_mrblast_ini(path, base=base)

    def want(key, conv, fallback):
        v = raw_value(path, key)
        return fallback if v is None else conv(v)

    assert run.cfg.block_size == want("BLOCKSIZE", int, base.block_size)
    assert run.cfg.num_hit_cutoff == want("NUMHITCUTOFF", int,
                                          base.num_hit_cutoff)
    assert run.cfg.is_classifier == want("ISCLASSIFIER",
                                         lambda v: bool(int(v)),
                                         base.is_classifier)
    assert run.out_prefix == want("OUTFILEPREFIX", str, "output")
    # file pointers resolve relative to the ini's directory
    q = raw_value(path, "QUERYFILENAME")
    if q is not None:
        assert run.query_file == os.path.normpath(
            os.path.join(os.path.dirname(os.path.abspath(path)), q))
    # engine knobs Spark owns are reported, not applied
    assert "MEMSIZE" in run.ignored


def test_classifier_flag_distinguishes_examples():
    flags = {os.path.dirname(p).split("/")[-1]:
             load_mrblast_ini(p).cfg.is_classifier for p in INIS
             if "test/" in p}
    assert flags.get("classifier-test") is True
    assert flags.get("generic-test") is False


def test_base_config_survives_unmapped_fields(tmp_path):
    ini = tmp_path / "m.ini"
    ini.write_text("BLOCKSIZE = 500\nNUMHITCUTOFF = 7\nISCLASSIFIER = 0\n")
    base = BlastConfig(task="blastp", evalue=1e-4, word_size=5)
    run = load_mrblast_ini(str(ini), base=base)
    assert run.cfg.block_size == 500
    assert run.cfg.num_hit_cutoff == 7
    assert (run.cfg.task, run.cfg.evalue, run.cfg.word_size) == \
        ("blastp", 1e-4, 5)


def test_apply_blast_cli_opts_gap_options():
    from mr_mpi_blast_spark.config import BlastConfig, apply_blast_cli_opts

    cfg = apply_blast_cli_opts(
        BlastConfig(task="blastp"),
        ("-gapopen", "9", "-gapextend", "2", "-evalue", "1e-5"))
    assert cfg.gapped and cfg.gap_open_eff == 9 and cfg.gap_extend_eff == 2
    assert cfg.evalue == 1e-5

    ug = apply_blast_cli_opts(
        BlastConfig(task="blastp"),
        ("-ungapped", "-gapopen", "9"))
    assert not ug.gapped

    # unknowns are ignored (left for the NCBI CLI), known ones applied
    mixed = apply_blast_cli_opts(
        BlastConfig(), ("-num_threads", "4", "-word_size", "7"))
    assert mixed.word_size == 7 and mixed.extra_opts == ()


def test_apply_blast_cli_opts_threshold_real_valued():
    """BLAST+ accepts real-valued -threshold and compares word score
    >= T; with integer matrix scores that means ceil(T), never a
    truncation (11.5 must behave like 12, not 11)."""
    from mr_mpi_blast_spark.config import BlastConfig, apply_blast_cli_opts
    base = BlastConfig(task="blastp")
    assert apply_blast_cli_opts(base, ["-threshold", "11"]).threshold == 11
    assert apply_blast_cli_opts(base, ["-threshold", "11.5"]).threshold == 12
    assert apply_blast_cli_opts(base, ["-threshold", "11.0"]).threshold == 11
