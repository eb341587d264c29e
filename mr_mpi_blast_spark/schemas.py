"""Canonical schemas of the engine.

The hit table is the reference's one output contract
(mrblast.hpp:281-313; SQL DDL at tools/converter/load_sql.py:98-114).
Generic mode = 13 columns, classifier mode adds perc_ident / perc_cover
(mrblast.cpp:1062-1068, doc/USERGUIDE:328-337) — here always present,
nullable when not in classifier mode.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Output hit table (SURVEY §1.3). qdef is populated by the defline join
# (J3, tools/converter/load_csv.py:137-142), null before it.
HITS = StructType([
    StructField("qid", LongType(), False),
    StructField("qdef", StringType(), True),
    StructField("sid", StringType(), False),
    StructField("ident", DoubleType(), False),
    StructField("align_len", IntegerType(), False),
    StructField("mismatches", IntegerType(), False),
    StructField("gaps", IntegerType(), False),
    StructField("qstart", IntegerType(), False),
    StructField("qend", IntegerType(), False),
    StructField("sstart", IntegerType(), False),
    StructField("send", IntegerType(), False),
    StructField("evalue", DoubleType(), False),
    StructField("bitscore", DoubleType(), False),
    StructField("perc_ident", DoubleType(), True),
    StructField("perc_cover", DoubleType(), True),
])

# Parsed query sequences (replaces FASTA + .idx + .def sidecars,
# doc/USERGUIDE:131-155 — byte offsets disappear, a DataFrame of parsed
# records subsumes the index).
QUERIES = StructType([
    StructField("qid", LongType(), False),
    StructField("defline", StringType(), False),
    StructField("defline_part", StringType(), False),
    StructField("seq", StringType(), False),
    StructField("length", IntegerType(), False),
])

# Subject (database) sequences with a partition label — the DataFrame
# analog of NCBI DB volumes named in dblist.txt (doc/USERGUIDE:224-264).
SUBJECTS = StructType([
    StructField("sid", StringType(), False),
    StructField("defline", StringType(), False),
    StructField("db_part", StringType(), False),
    StructField("seq", StringType(), False),
    StructField("length", IntegerType(), False),
])

# Work item = one (query block, db partition) pair (mrblast.hpp:190-195).
WORK_ITEMS = StructType([
    StructField("block_id", LongType(), False),
    StructField("qid_start", LongType(), False),
    StructField("db_part", StringType(), False),
])

# Multimodal asset table: opaque binary payload + typed metadata
# (beyond-reference: training-data pipeline surface).
ASSETS = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),     # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("meta", MapType(StringType(), StringType()), True),
])

# Extracted multimodal features (see mr_mpi_blast_spark.operators.multimodal).
ASSET_FEATURES = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("duration_s", DoubleType(), True),
    StructField("feature", ArrayType(FloatType()), True),
])
