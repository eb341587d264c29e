"""W4 HDF5 sink: the built-in classic-format writer round-trips through
an independently-implemented spec reader, carrying the reference's own
golden hits (tests the whole chain .bin -> HITS -> .hd5).

The reader (sinks/hdf5_minimal.read_compound_hdf5) shares no layout
constants with the writer — it walks superblock -> root symbol table ->
B-tree/SNOD/heap -> object header messages per the public HDF5 spec, so
a structural mistake in either side fails the round-trip.
"""

import os
import struct

import numpy as np
import pytest

from mr_mpi_blast_spark.sinks.hdf5_minimal import read_compound_hdf5
from mr_mpi_blast_spark.sinks.legacy_bin import read_legacy_bin
from mr_mpi_blast_spark.sinks.writers import write_hdf5

GENERIC_DIR = "/root/reference/tools/converter/examples/hits"
CLASSIFIER_DIR = "/root/reference/tools/converter/classifier/examples/hits"


@pytest.fixture(scope="module")
def golden_hits(spark):
    return read_legacy_bin(spark, GENERIC_DIR, classifier=False).cache()


def test_hdf5_roundtrip_golden(spark, golden_hits, tmp_path):
    path = str(tmp_path / "hits.hd5")
    n = write_hdf5(golden_hits, path)
    rec = read_compound_hdf5(path, "blhits/blhitstab")
    assert len(rec) == n == golden_hits.count()

    want = sorted((r.qid, r.sid, r.ident, r.align_len, r.mismatches,
                   r.gaps, r.qstart, r.qend, r.sstart, r.send,
                   r.evalue, r.bitscore)
                  for r in golden_hits.collect())
    got = sorted((int(x["qId"]), x["sId"].decode(), float(x["dIdent"]),
                  int(x["alignLen"]), int(x["nMismatches"]), int(x["nGaps"]),
                  int(x["qStart"]), int(x["qEnd"]), int(x["sStart"]),
                  int(x["sEnd"]), float(x["eValue"]), float(x["bitScore"]))
                 for x in rec)
    assert got == want                      # doubles bit-exact through f8


def test_hdf5_classifier_layout(spark, tmp_path):
    df = read_legacy_bin(spark, CLASSIFIER_DIR, classifier=True)
    path = str(tmp_path / "chits.hd5")
    n = write_hdf5(df, path, classifier=True)
    rec = read_compound_hdf5(path, "blhits/blhitstab")
    assert len(rec) == n
    assert "percIdent" in rec.dtype.names and "percCover" in rec.dtype.names
    want = sorted((r.qid, round(r.perc_ident, 9), round(r.perc_cover, 9))
                  for r in df.collect())
    got = sorted((int(x["qId"]), round(float(x["percIdent"]), 9),
                  round(float(x["percCover"]), 9)) for x in rec)
    assert got == want


def test_hdf5_file_structure(spark, golden_hits, tmp_path):
    """Spot-check spec invariants a foreign reader depends on: magic,
    superblock v0, EOF address == file size, record size matches the
    PyTables description (164 bytes generic)."""
    path = str(tmp_path / "s.hd5")
    n = write_hdf5(golden_hits, path)
    with open(path, "rb") as f:
        b = f.read()
    assert b[:8] == b"\x89HDF\r\n\x1a\n"
    assert b[8] == 0
    eof = struct.unpack_from("<Q", b, 40)[0]
    assert eof == len(b) == os.path.getsize(path)
    rec = read_compound_hdf5(path, "blhits/blhitstab")
    assert rec.dtype.itemsize == 8 + 40 + 40 + 8 + 7 * 4 + 8 + 8
    assert len(rec) == n


def test_hdf5_null_fields_coalesced(spark, tmp_path):
    """Generic hits have NULL qdef/perc columns; classifier export must
    encode them as ''/0.0, not crash (same contract as the .bin
    writer)."""
    hits = read_legacy_bin(spark, GENERIC_DIR, classifier=False)
    path = str(tmp_path / "n.hd5")
    n = write_hdf5(hits, path, classifier=True)
    rec = read_compound_hdf5(path, "blhits/blhitstab")
    assert len(rec) == n
    assert np.all(rec["percIdent"] == 0.0)
    assert all(x == b"" for x in rec["qIdDef"])
