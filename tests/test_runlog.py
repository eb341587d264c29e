"""W7 per-rank timing logs (reference TIMING=1, mrblast.cpp:454-483,
900-935): worker-local log files, reference line shape, DataFrame
read-back, and end-to-end wiring through run_search(log_dir=...)."""

import glob
import os

import pandas as pd

from mr_mpi_blast_spark.runlog import (log_event, read_run_logs,
                                       run_summary, timed_kernel)


def test_log_line_shape(tmp_path):
    d = str(tmp_path / "logs")
    log_event(d, "mr-mpi-blast starts")
    files = glob.glob(os.path.join(d, "output-*.log"))
    assert len(files) == 1
    line = open(files[0]).read().strip()
    # Rank:{host}:{pid} {event},{wtime},{wall_us},{user_us},{sys_us}
    assert line.startswith("Rank:")
    head, rest = line.split(" ", 1)
    fields = rest.split(",")
    assert fields[0] == "mr-mpi-blast starts"
    assert float(fields[1]) >= 0
    assert all(int(x) > 0 for x in fields[2:5])


def test_timed_kernel_logs_call_pair(tmp_path):
    d = str(tmp_path / "logs")

    def kernel(pdf):
        return pd.DataFrame({"x": [1, 2, 3]})

    wrapped = timed_kernel(kernel, d)
    out = wrapped(pd.DataFrame({"db_part": ["p0"], "block_id": [7],
                                "qid": [1], "seq": ["ACGT"]}))
    assert len(out) == 3
    text = open(glob.glob(os.path.join(d, "*.log"))[0]).read()
    assert "blast call starts" in text and "blast call ends" in text
    assert "n_queries=1" in text and "n_hits=3" in text
    assert ",p0," in text and ",7," in text


def test_read_back_and_summary(spark, tmp_path):
    d = str(tmp_path / "logs")

    def kernel(pdf):
        return pd.DataFrame({"x": list(range(len(pdf)))})

    wrapped = timed_kernel(kernel, d)
    for block in (1, 2):
        wrapped(pd.DataFrame({"db_part": ["p0"], "block_id": [block],
                              "qid": [1], "seq": ["ACGT"]}))
    logs = read_run_logs(spark, d)
    rows = logs.collect()
    assert len(rows) == 4                       # 2 calls x start+end
    assert {r.event for r in rows} == {"blast call starts",
                                       "blast call ends"}
    assert all(r.wall_us > 0 and r.user_us > 0 for r in rows)
    s = run_summary(logs).collect()
    assert len(s) == 1
    assert s[0].n_calls == 2
    assert s[0].busy_s >= 0


def test_run_search_writes_rank_logs(spark, tmp_path):
    from mr_mpi_blast_spark.config import BlastConfig
    from mr_mpi_blast_spark.plans.pipeline import run_search

    seq = "ACGTTGACCTGATCGATACGGATCCATG"
    qdf = spark.createDataFrame([(1, seq, len(seq))],
                                ["qid", "seq", "length"])
    sdf = spark.createDataFrame(
        [("s1", "TTACGTTGACCTGATCGATACGGATCCATGTT", "p0")],
        ["sid", "seq", "db_part"])
    d = str(tmp_path / "ranklogs")
    hits = run_search(qdf, sdf, BlastConfig(word_size=8, min_score=8),
                      log_dir=d)
    assert hits.count() >= 1
    logs = read_run_logs(spark, d)
    ends = logs.filter(logs.event == "blast call ends").count()
    assert ends >= 1
