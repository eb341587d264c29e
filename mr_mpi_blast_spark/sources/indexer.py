"""Query indexer (S2) — serial uid assignment + defline sidecar.

Reference: tools/seqindexer/seqindexer.py:166-197 writes two sidecars:
.idx ``offset \\t lengthBp \\t uid`` and .def ``uid \\t defline``, with
uid a serial number from ``-s`` and ``-b 0`` keeping only the defline
token before the first blank.

In the Spark engine the .idx byte offsets are meaningless (no mmap); the
uid and defline columns live on the queries DataFrame itself
(read_fasta already assigns them). This module provides the sidecar
*compatibility* exports for interop with reference tooling: offsets are
recomputed against the normalized single-line FASTA our writer emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.blocks import ordered_prefix_sum


def defline_table(queries: DataFrame, part: bool = True) -> DataFrame:
    """The .def sidecar as a DataFrame: (qid, defline).

    part=True is the -b 0 form (token before first blank,
    seqindexer.py:188-192)."""
    col = F.col("defline_part") if part else F.col("defline")
    return queries.select(F.col("qid"), col.alias("defline"))


def index_table(queries: DataFrame) -> DataFrame:
    """The .idx sidecar as a DataFrame: (offset, length, qid).

    Offsets are cumulative over the normalized FASTA rendering
    ('>'+defline+'\\n'+seq+'\\n') in qid order — the hierarchical
    prefix sum from operators/blocks.py (bucketed windows + driver
    scan of bucket totals), so the sidecar export parallelizes the
    same way block assignment does instead of funnelling through one
    global-window task."""
    rec_len = F.length("defline") + F.length("seq") + 3  # '>' + 2 newlines
    out = ordered_prefix_sum(queries, rec_len, ["qid"], "offset")
    return out.select(
        F.col("offset"),
        F.col("length").cast("long").alias("length"),
        F.col("qid"))


def write_sidecars(queries: DataFrame, idx_path: str, def_path: str,
                   part: bool = True) -> None:
    """Write tab-delimited .idx/.def files readable by reference tools
    (mrblast.cpp:128-140 parses .idx; converters merge-join on .def)."""
    (index_table(queries)
     .select(F.concat_ws("\t", "offset", "length", "qid").alias("value"))
     .coalesce(1).write.mode("overwrite").text(idx_path))
    (defline_table(queries, part=part)
     .select(F.concat_ws("\t", "qid", "defline").alias("value"))
     .coalesce(1).write.mode("overwrite").text(def_path))
