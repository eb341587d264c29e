"""FASTA source/sink (S1/S2 ingestion surface).

Reference: tools/seqindexer/seqindexer.py:12-120 (FastaReader) iterates
'>'-delimited records single-threaded; mrblast.cpp:93-99 then mmaps the
whole file and navigates by byte offsets from the .idx sidecar.

Spark expression: set the Hadoop text record delimiter to "\\n>" so the
input format splits *on record boundaries* — the file becomes splittable
and every partition parses its own records; no mmap, no sidecar index.
The .idx byte-offset artifact disappears entirely (SURVEY §1.4): a parsed
DataFrame subsumes it. Serial qids are assigned by a sort on
(file order, byte offset) + zipWithIndex — deterministic and parallel
(the sort key is tiny; zipWithIndex is two narrow passes).

This is one of the rare justified RDD uses (SURVEY §7.1): the raw format
needs per-record imperative parsing before a schema exists.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from mr_mpi_blast_spark.schemas import QUERIES


def _parse_record(file_idx: int, offset: int, text: str):
    text = text.strip()
    if text.startswith(">"):
        text = text[1:]
    if not text:
        return
    header, _, body = text.partition("\n")
    defline = header.strip()
    seq = "".join(body.split()).upper()
    yield (file_idx, offset, defline, seq)


def read_fasta(spark: SparkSession, path: str, qid_start: int = 1) -> DataFrame:
    """Parse FASTA file(s) into the QUERIES schema.

    qid_start mirrors seqindexer's ``-s`` serial start option
    (seqindexer.py:141-142; doc/USERGUIDE:139-144).
    """
    sc = spark.sparkContext
    files = sorted(glob.glob(path)) if any(ch in path for ch in "*?[") else [path]
    if not files:
        raise FileNotFoundError(path)

    rdds = []
    for i, f in enumerate(files):
        raw = sc.newAPIHadoopFile(
            os.path.abspath(f),
            "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
            "org.apache.hadoop.io.LongWritable",
            "org.apache.hadoop.io.Text",
            conf={"textinputformat.record.delimiter": "\n>"},
        )
        rdds.append(raw.flatMap(lambda kv, i=i: _parse_record(i, kv[0], kv[1])))
    merged = rdds[0] if len(rdds) == 1 else sc.union(rdds)

    indexed = merged.sortBy(lambda r: (r[0], r[1])).zipWithIndex()
    rows = indexed.map(lambda t: (
        t[1] + qid_start,               # qid
        t[0][2],                        # defline
        t[0][2].split(" ")[0],          # defline_part (-b 0 form)
        t[0][3],                        # seq
        len(t[0][3]),                   # length
    ))
    return spark.createDataFrame(rows, QUERIES)


def write_fasta(df: DataFrame, path: str,
                defline_col: str = "defline", seq_col: str = "seq") -> None:
    """Render a sequence DataFrame back to FASTA text files (one per task)."""
    from pyspark.sql import functions as F
    (df.select(F.concat(F.lit(">"), F.col(defline_col), F.lit("\n"),
                        F.col(seq_col)).alias("value"))
       .write.mode("overwrite").text(path))
