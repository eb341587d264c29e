"""Golden decode of the reference's own committed .bin hit files.

The round-trip test (test_sinks) proves writer and reader agree with
each other; this one proves they agree with REALITY: the fixtures under
/root/reference/tools/converter/examples/hits/ (generic) and
.../classifier/examples/hits/ (classifier) were produced by the actual
C++ engine (mrblast.cpp:1216-1242), so any drift in our struct layout
(=Q40sdIIIIIII4xdd vs the converters' native 'L40sdIIIIIIIdd',
load_csv.py:107-109) fails here.

The independent decode below re-expresses load_csv.py's loop (native-
alignment struct, NUL-partitioned sId, defline sidecar merge) in a few
lines of test code — it is the oracle, read_legacy_bin is the subject.
"""

import glob
import os
import struct

import pytest

from pyspark.sql import functions as F

from mr_mpi_blast_spark.sinks.legacy_bin import legacy_record_size, read_legacy_bin

GENERIC_DIR = "/root/reference/tools/converter/examples/hits"
CLASSIFIER_DIR = "/root/reference/tools/converter/classifier/examples/hits"
GENERIC_DEF = "/root/reference/tools/converter/examples/30_real_seqs.fa.def"
CLASSIFIER_DEF = "/root/reference/tools/converter/classifier/examples/100_simul_seqs.fa.def"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GENERIC_DIR), reason="reference fixtures not present")


def native_decode(path: str, classifier: bool):
    """The reference converter's decode, re-expressed: native-alignment
    struct 'L40sdIIIIIIIdd' (+'dd' classifier), sId cut at first NUL."""
    st = struct.Struct("L40sdIIIIIIIdd" + ("dd" if classifier else ""))
    out = []
    with open(path, "rb") as f:
        data = f.read()
    assert len(data) % st.size == 0, "partial record => corrupt/misaligned"
    for rec in st.iter_unpack(data):
        sid = rec[1].partition(b"\0")[0].decode("ascii")
        out.append((rec[0], sid) + rec[2:])
    return out


def load_def(path: str) -> dict[int, str]:
    """.def sidecar: 'uid<TAB>>defline' per line (seqindexer.py:188-197)."""
    d = {}
    with open(path) as f:
        for line in f:
            uid, defline = line.rstrip("\n").split("\t", 1)
            d[int(uid)] = defline.lstrip(">")
    return d


@pytest.mark.parametrize("hits_dir,classifier", [
    (GENERIC_DIR, False), (CLASSIFIER_DIR, True)])
def test_decode_matches_reference_converter(spark, hits_dir, classifier):
    files = sorted(glob.glob(os.path.join(hits_dir, "*.bin")))
    assert files, hits_dir

    expected = []
    for p in files:
        expected.extend(native_decode(p, classifier))
    rec_size = legacy_record_size(classifier)
    assert sum(os.path.getsize(p) for p in files) == rec_size * len(expected)

    df = read_legacy_bin(spark, hits_dir, classifier=classifier)
    rows = df.collect()
    assert len(rows) == len(expected)

    got = sorted(
        (r.qid, r.sid, r.ident, r.align_len, r.mismatches, r.gaps,
         r.qstart, r.qend, r.sstart, r.send, r.evalue, r.bitscore)
        + ((r.perc_ident, r.perc_cover) if classifier else ())
        for r in rows)
    assert got == sorted(expected)


def test_generic_fixture_values_are_plausible(spark):
    """Engine-produced hits obey the record's own invariants — catches
    a wrong-offset decode that still happens to parse (field shear)."""
    df = read_legacy_bin(spark, GENERIC_DIR, classifier=False)
    bad = df.filter(
        ~((F.col("ident") > 0) & (F.col("ident") <= 100.0)
          & (F.col("align_len") > 0)
          & (F.col("qend") >= F.col("qstart"))
          & (F.col("evalue") >= 0) & (F.col("evalue") <= 10.0)
          & (F.col("bitscore") > 0)
          & (F.col("mismatches") <= F.col("align_len"))
          & (F.col("gaps") <= F.col("align_len")))).count()
    assert bad == 0
    # the classifier-only columns must be absent (NULL) in generic mode
    assert df.filter(F.col("perc_ident").isNotNull()).count() == 0


@pytest.mark.parametrize("hits_dir,classifier,def_path", [
    (GENERIC_DIR, False, GENERIC_DEF),
    (CLASSIFIER_DIR, True, CLASSIFIER_DEF)])
def test_defline_sidecar_covers_all_qids(spark, hits_dir, classifier, def_path):
    """J3: every qid the engine emitted resolves in the .def sidecar the
    reference shipped next to it (load_csv.py:133-139 raises on a miss;
    attach_deflines keeps the row with null qdef — here there must be
    no nulls at all)."""
    from mr_mpi_blast_spark.plans.pipeline import attach_deflines
    deflines = load_def(def_path)
    hits = read_legacy_bin(spark, hits_dir, classifier=classifier)
    d = spark.createDataFrame(
        [(k, v) for k, v in deflines.items()], "qid long, defline string")
    merged = attach_deflines(hits, d)
    assert merged.filter(F.col("qdef").isNull()).count() == 0
    # spot-check one known mapping from the sidecar text itself
    some = merged.select("qid", "qdef").first()
    assert deflines[some.qid] == some.qdef


def test_classifier_perc_fields_populated(spark):
    df = read_legacy_bin(spark, CLASSIFIER_DIR, classifier=True)
    n = df.count()
    assert df.filter(F.col("perc_ident").isNotNull()
                     & F.col("perc_cover").isNotNull()).count() == n
    assert df.filter((F.col("perc_cover") < 0)
                     | (F.col("perc_cover") > 100.0)).count() == 0
