#!/usr/bin/env python
"""End-to-end tutorial flow (the reference's tutorial/README:39-105 at
toy scale): synthesize a FASTA, shred it into overlapping query windows
(splitter), assign serial uids (indexer), build a 2-partition subject
DB, run the search pipeline, and write every sink the converters
support (parquet, CSV with %.3g + deflines, SQLite, legacy .bin,
search-strategy dump).

Usage: python scripts/run_tutorial.py [out_dir] [--ini mrblast.ini]

--ini accepts a reference mrblast.ini unmodified (e.g.
examples/test/generic-test/mrblast.ini): BLOCKSIZE / NUMHITCUTOFF /
ISCLASSIFIER / OUTFILEPREFIX apply; QUERYFILENAME is used when the
file exists, else the synthetic FASTA stands in (the reference's
example data is not shipped with its repo either).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mr_mpi_blast_spark.config import BlastConfig, load_mrblast_ini
from mr_mpi_blast_spark.plans.pipeline import run_search, attach_deflines
from mr_mpi_blast_spark.session import get_spark
from mr_mpi_blast_spark.sinks import (write_csv, write_legacy_bin,
                                      write_parquet, write_sqlite)
from mr_mpi_blast_spark.sinks.writers import write_hdf5, write_search_strategy
from mr_mpi_blast_spark.sources.fasta import read_fasta
from mr_mpi_blast_spark.sources.splitter import split_sequences


def synth_fasta(path: str, n: int = 40, length: int = 3000, seed: int = 7):
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(n):
            seq = "".join(rng.choice("ACGT") for _ in range(length))
            f.write(f">seq_{i} synthetic record {i}\n")
            for j in range(0, length, 70):
                f.write(seq[j:j + 70] + "\n")


def main(out_dir: str, ini_path: str | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("tutorial")

    run = None
    prefix = "output"
    if ini_path:
        run = load_mrblast_ini(ini_path, base=BlastConfig(
            task="blastn", word_size=16, evalue=1e-6))
        prefix = run.out_prefix
        print(f"ini: block_size={run.cfg.block_size} "
              f"num_hit_cutoff={run.cfg.num_hit_cutoff} "
              f"classifier={run.cfg.is_classifier} "
              f"spark-owned keys ignored: {sorted(run.ignored)}")

    fasta = os.path.join(out_dir, "input.fa")
    if run and run.query_file and os.path.exists(run.query_file):
        fasta = run.query_file
    else:
        synth_fasta(fasta)

    # 1. ingest + shred (reference: splitter.py then seqindexer.py);
    #    window qid = src_qid * 100 + chunk_idx keeps ids serial-unique
    raw = read_fasta(spark, fasta)
    windows = split_sequences(raw, query_len=1000, overlap=500)
    queries = windows.select(
        (F.col("qid") * 100 + F.col("chunk_idx")).alias("qid"),
        F.col("header").alias("defline"),
        F.col("header").alias("defline_part"),
        F.col("chunk").alias("seq"),
        F.col("chunk_len").cast("int").alias("length"))

    # 2. subjects: the same records as a 2-partition database
    subjects = raw.select(
        F.col("defline_part").alias("sid"), "defline",
        F.concat(F.lit("vol"), (F.crc32("defline") % 2).cast("string")).alias("db_part"),
        "seq", F.length("seq").cast("int").alias("length"))

    # 3. search (builtin kernel; swap kernel.ncbi.run_search_ncbi when
    #    BLAST+ is installed)
    cfg = run.cfg if run else BlastConfig(
        task="blastn", word_size=16, evalue=1e-6,
        block_size=20_000, num_hit_cutoff=25)
    hits = run_search(queries, subjects, cfg).cache()
    n = hits.count()

    # 4. every sink the reference's converters provide
    deflines = queries.select("qid", "defline")
    write_parquet(hits, os.path.join(out_dir, f"{prefix}.parquet"))
    write_csv(hits, os.path.join(out_dir, f"{prefix}.csv"), deflines=deflines)
    write_sqlite(hits, os.path.join(out_dir, f"{prefix}.sqlite"))
    write_legacy_bin(attach_deflines(hits, deflines),
                     os.path.join(out_dir, f"{prefix}.bin"),
                     classifier=cfg.is_classifier)
    write_hdf5(hits, os.path.join(out_dir, f"{prefix}.hd5"),
               classifier=cfg.is_classifier)
    if run is None or run.opt_dump:
        write_search_strategy(cfg, out_dir, prefix=prefix)

    print(f"tutorial complete: {n} hits -> {out_dir}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    ini = None
    if "--ini" in args:
        i = args.index("--ini")
        ini = args[i + 1]
        del args[i:i + 2]
    main(args[0] if args else "/tmp/mrblast_tutorial", ini_path=ini)
