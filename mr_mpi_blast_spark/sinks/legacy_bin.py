"""Legacy packed-binary hit-file codec (S9/W1 compatibility).

The reference engine appends fixed-layout C structs per hit, one file
per rank per iteration (mrblast.cpp:1216-1242); its converters decode
them with struct format ``'L40sdIIIIIIIdd'`` (generic, 104 bytes with
native alignment — tools/converter/load_csv.py:107-109) or
``'L40sdIIIIIIIdddd'`` (classifier, 120 bytes —
tools/converter/classifier/load_csv_classifier.py:110).

Field order (mrblast.hpp:281-313 / load_sql.py:98-114)::

    qId:u64  sId:char[40](NUL-padded)  dIdent:f64
    alignLen nMismatches nGaps qStart qEnd sStart sEnd : u32 x 7
    eValue bitScore : f64   [+ percIdent percCover : f64]

Reading is distributed: ``binaryFile`` source -> Arrow-batched decode in
``mapInPandas`` (one task per file, exactly the reference's per-rank
file granularity). Writing is per-partition, mirroring "one file per
rank": every Spark task writes ``<prefix>-hits-<iter>-<partitionId>.bin``.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_mpi_blast_spark.schemas import HITS

_FMT_GENERIC = "=Q40sdIIIIIII4xdd"      # explicit pad: native 'L40sdIIIIIIIdd'
_FMT_CLASSIFIER = "=Q40sdIIIIIII4xdddd"

_COLS = ["qid", "sid", "ident", "align_len", "mismatches", "gaps",
         "qstart", "qend", "sstart", "send", "evalue", "bitscore"]


def _fmt(classifier: bool) -> struct.Struct:
    return struct.Struct(_FMT_CLASSIFIER if classifier else _FMT_GENERIC)


def _decode(content: bytes, classifier: bool) -> pd.DataFrame:
    st = _fmt(classifier)
    rows = []
    for rec in st.iter_unpack(content):
        qid, sid_raw = rec[0], rec[1]
        # char[40] is NUL-padded; strncpy may leave it unterminated at
        # exactly 40 chars (mrblast.cpp:1072) — partition on first NUL.
        sid = sid_raw.partition(b"\0")[0].decode("ascii", "replace")
        row = [qid, None, sid, *rec[2:12]]
        row += list(rec[12:14]) if classifier else [None, None]
        rows.append(row)
    return pd.DataFrame(rows, columns=HITS.fieldNames())


def read_legacy_bin(spark: SparkSession, path: str,
                    classifier: bool = False) -> DataFrame:
    """Decode a directory/glob of reference ``*.bin`` hit files into the
    canonical HITS DataFrame. One Spark task per file (binaryFile
    source), Arrow-batched back to the JVM."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.bin").load(path)
             .select("path", "content"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                yield _decode(bytes(content), classifier)

    return files.mapInPandas(decode, schema=HITS)


def write_legacy_bin(df: DataFrame, out_dir: str, prefix: str = "output",
                     iteration: int = 0, classifier: bool = False) -> None:
    """W1: per-partition packed-struct files,
    ``{prefix}-hits-{iter}-{partition:07d}.txt.bin`` (name scheme
    mrblast.cpp:615-621). qdef is not part of the legacy record."""
    os.makedirs(out_dir, exist_ok=True)
    st_fmt = _FMT_CLASSIFIER if classifier else _FMT_GENERIC
    cols = list(_COLS) + (["perc_ident", "perc_cover"] if classifier else [])
    # struct.pack raises TypeError on None; perc_ident/perc_cover are
    # nullable in HITS (generic-produced hits carry NULL there), so a
    # classifier-mode write of such a table must not crash mid-
    # foreachPartition. The legacy record has no NULL notion — 0.0 is
    # the only faithful encoding.
    proj = df.select(*[
        F.coalesce(F.col(c), F.lit(0.0)).alias(c)
        if c in ("ident", "evalue", "bitscore", "perc_ident", "perc_cover")
        else F.col(c)
        for c in cols])

    def write_partition(rows) -> None:
        from pyspark import TaskContext
        st = struct.Struct(st_fmt)
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-hits-{iteration}-{pid:07d}.txt.bin")
        buf = bytearray()
        for r in rows:
            vals = list(r)
            vals[1] = vals[1].encode("ascii", "replace")[:40]
            buf += st.pack(*vals)
        if buf:
            with open(path, "wb") as f:
                f.write(bytes(buf))

    proj.foreachPartition(write_partition)


def legacy_record_size(classifier: bool = False) -> int:
    return _fmt(classifier).size
