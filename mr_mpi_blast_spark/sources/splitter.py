"""Sequence splitter / shredder (S3).

Reference: tools/splitter/splitter.py:144-189 cuts each sequence into
fixed-length windows overlapping by ``overlap`` bp; each chunk's header
encodes provenance:

    >{defline_part}_{cid}_{case}_{start}_{end}_{start}_{end}

where cid is a global serial chunk id and case is 0 = first of several,
1 = only chunk, 2 = middle, 3 = last. The next window starts at
``end - overlap``. (The reference forgets to uppercase one branch —
last chunk shorter than the overlap, splitter.py:175-177; we uppercase
uniformly and note the divergence here.)

Spark expression: pure column arithmetic — explode a generated start
sequence, substring the windows. Chunk starts are multiples of
(query_len - overlap); chunk i >= 1 exists iff start_i < seq_len -
overlap (derived from the reference's ``while end < seqLen`` loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.blocks import serial_number


def split_sequences(queries: DataFrame, query_len: int, overlap: int,
                    serial_cid: bool = False) -> DataFrame:
    """Shred sequences into overlapping windows.

    Output: qid, chunk_idx (per-sequence), chunk_start/chunk_end
    (0-based, end-exclusive like the reference headers), case, header,
    chunk, chunk_len. With serial_cid=True the header carries the
    reference's global serial cid, numbered hierarchically
    (operators/blocks.serial_number) so even the serial form stays
    parallel; the per-sequence (qid, chunk_idx) pair remains the
    natural join key either way.
    """
    if overlap >= query_len:
        raise ValueError("overlap must be < query_len")
    step = query_len - overlap

    starts = F.sequence(
        F.lit(0),
        F.greatest(F.lit(0), F.col("length") - overlap - 1),
        F.lit(step))
    df = (queries
          .select("qid", "defline_part", "seq", "length",
                  F.posexplode(starts).alias("chunk_idx", "chunk_start"))
          # sequence() overshoots when length-overlap-1 < step but > 0;
          # keep chunk 0 unconditionally, later chunks per the loop bound
          .filter((F.col("chunk_idx") == 0)
                  | (F.col("chunk_start") < F.col("length") - overlap)))

    end = F.least(F.col("chunk_start") + query_len, F.col("length"))
    df = df.withColumn("chunk_end", end)
    case = (F.when((F.col("chunk_start") == 0) & (F.col("chunk_end") < F.col("length")), 0)
             .when((F.col("chunk_start") == 0), 1)
             .when(F.col("chunk_end") < F.col("length"), 2)
             .otherwise(3))
    df = df.withColumn("case", case.cast("int"))

    if serial_cid:
        df = serial_number(df, ["qid", "chunk_start"], "cid")
    else:
        df = df.withColumn("cid", F.col("chunk_idx").cast("long"))

    header = F.concat_ws("_",
                         F.col("defline_part"), F.col("cid"), F.col("case"),
                         F.col("chunk_start"), F.col("chunk_end"),
                         F.col("chunk_start"), F.col("chunk_end"))
    chunk = F.upper(F.substring(
        F.col("seq"), F.col("chunk_start") + 1,
        F.col("chunk_end") - F.col("chunk_start")))
    return (df.select("qid", "chunk_idx", "cid", "case",
                      "chunk_start", "chunk_end",
                      header.alias("header"),
                      chunk.alias("chunk"))
              .withColumn("chunk_len", F.length("chunk")))
