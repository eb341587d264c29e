"""Sink tests (SURVEY §2.9): legacy binary codec round-trip, CSV
formatting contract, SQLite/DuckDB loads — mirrors the reference's
converter round-trip tests (tools/converter/examples/test.sh)."""

import csv
import glob
import sqlite3
import struct

import pytest

from pyspark.sql import functions as F

from mr_mpi_blast_spark.schemas import HITS
from mr_mpi_blast_spark.sinks import (
    read_legacy_bin, write_legacy_bin, write_csv, write_sqlite, write_duckdb,
)
from mr_mpi_blast_spark.sinks.legacy_bin import legacy_record_size
from mr_mpi_blast_spark.sinks.writers import write_search_strategy
from mr_mpi_blast_spark.config import BlastConfig


@pytest.fixture(scope="module")
def hits_df(spark):
    rows = [
        (1, None, "subj_a", 98.5, 120, 1, 1, 1, 120, 11, 130, 1.5e-30, 222.0, 98.5, 99.2),
        (1, None, "subj_b", 75.0, 80, 18, 2, 5, 84, 900, 979, 0.0021, 88.5, 75.0, 66.0),
        (2, None, "subj_a", 100.0, 40, 0, 0, 1, 40, 1, 40, 4.2, 35.75, 100.0, 100.0),
    ]
    return spark.createDataFrame(rows, HITS).coalesce(2)


def test_legacy_record_sizes():
    # native struct 'L40sdIIIIIIIdd' = 104 bytes, classifier +2 doubles
    # (load_csv.py:107-109, load_csv_classifier.py:110)
    assert legacy_record_size(False) == struct.calcsize("L40sdIIIIIIIdd") == 104
    assert legacy_record_size(True) == struct.calcsize("L40sdIIIIIIIdddd") == 120


@pytest.mark.parametrize("classifier", [
    False,
    # classifier=True flips one writer flag; full mode still runs it
    pytest.param(True, marks=pytest.mark.slow),
])
def test_legacy_bin_roundtrip(spark, hits_df, tmp_path, classifier):
    out = str(tmp_path / "bin")
    write_legacy_bin(hits_df, out, classifier=classifier)
    files = glob.glob(out + "/*.txt.bin")
    assert files, "per-partition bin files written"
    back = read_legacy_bin(spark, out, classifier=classifier)
    got = sorted((r.qid, r.sid, r.ident, r.align_len, r.qstart, r.send,
                  round(r.evalue, 12), r.bitscore,
                  r.perc_ident if classifier else None)
                 for r in back.collect())
    want = sorted((r.qid, r.sid, r.ident, r.align_len, r.qstart, r.send,
                   round(r.evalue, 12), r.bitscore,
                   r.perc_ident if classifier else None)
                  for r in hits_df.collect())
    assert got == want


def test_csv_sink_formatting(spark, hits_df, tmp_path):
    deflines = spark.createDataFrame(
        [(1, "query one defline"), (2, "query two")], ["qid", "defline"])
    out = str(tmp_path / "csv")
    write_csv(hits_df, out, deflines=deflines)
    rows = []
    for f in glob.glob(out + "/*.csv"):
        with open(f) as fh:
            rd = csv.DictReader(fh)
            rows.extend(rd)
    assert len(rows) == 3
    by_sid = {(r["qid"], r["sid"]): r for r in rows}
    r = by_sid[("1", "subj_a")]
    # %.3g float contract (load_csv.py:144-147)
    assert r["evalue"] == "1.5e-30"
    assert r["ident"] == "98.5"
    assert r["qdef"] == "query one defline"
    r2 = by_sid[("1", "subj_b")]
    assert r2["evalue"] == "0.0021"


def test_sqlite_sink(hits_df, tmp_path):
    db = str(tmp_path / "hits.sqlite")
    n = write_sqlite(hits_df, db, classifier=True)
    assert n == 3
    con = sqlite3.connect(db)
    cnt, emin = con.execute("SELECT count(*), min(eValue) FROM hits").fetchone()
    con.close()
    assert cnt == 3 and abs(emin - 1.5e-30) < 1e-40


def test_duckdb_sink(hits_df, tmp_path):
    db = str(tmp_path / "hits.duckdb")
    n = write_duckdb(hits_df.drop("qdef"), db, tmp_dir=str(tmp_path / "stage"))
    assert n == 3
    import duckdb
    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM hits WHERE evalue <= 0.01").fetchone()[0] == 2
    con.close()


def test_search_strategy_dump(tmp_path):
    cfg = BlastConfig(task="blastp", evalue=1e-4, num_hit_cutoff=7)
    p = write_search_strategy(cfg, str(tmp_path))
    import json
    with open(p) as f:
        d = json.load(f)
    assert d["task"] == "blastp" and d["evalue"] == 1e-4 and d["num_hit_cutoff"] == 7
