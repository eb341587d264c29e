"""Streaming tests (SURVEY §2.10): batch/stream parity for windowed
aggregates, session windows, and the custom stateful operator.

Strategy: split the sf0.001 events table into multiple parquet files,
stream them with maxFilesPerTrigger=1 (multiple micro-batches), and
compare the drained streaming result against the equivalent batch
aggregate on the same data."""

import os

import pytest

from pyspark.sql import functions as F

from mr_mpi_blast_spark.session import load_table
from mr_mpi_blast_spark.streaming import (
    read_event_stream, hourly_counts, session_aggregate,
    stateful_user_totals, run_available_now,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(3).write.mode("overwrite").parquet(path)
    return path


def test_hourly_counts_parity(spark, event_dir):
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    # files arrive in arbitrary order -> a watermark wider than the
    # 30-day data span keeps every event on-time for the parity check
    # (the narrow-watermark late-drop contract is Spark's own)
    got = run_available_now(
        hourly_counts(stream, watermark="60 days"), "t_hourly").collect()
    # rewritten files carry TIMESTAMP(MICROS) — no nanos conversion
    batch = (spark.read.parquet(event_dir)
             .groupBy(F.date_format(F.date_trunc("hour", "ts"),
                                    "yyyy-MM-dd HH:mm").alias("hour"),
                      "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 4).alias("total_value"))).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) > 0


def test_session_aggregate_parity(spark, event_dir):
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    got = run_available_now(
        session_aggregate(stream, gap="5 minutes", watermark="60 days"),
        "t_sessions").collect()
    batch = (spark.read.parquet(event_dir)
             .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 4).alias("total_value"))
             .select("user_id", F.col("w.start").alias("session_start"),
                     F.col("w.end").alias("session_end"),
                     "n_events", "total_value")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # sessions actually merge events (not one session per event)
    assert any(r.n_events > 1 for r in got)


def test_stateful_user_totals(spark, event_dir):
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    drained = run_available_now(stateful_user_totals(stream),
                                "t_totals", output_mode="update")
    # update mode re-emits a key each micro-batch it changes in; the
    # LAST emission per user must equal the overall batch totals
    last = (drained.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("total_value").alias("total_value")))
    batch = (spark.read.parquet(event_dir)
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 4).alias("total_value")))
    got = {r.user_id: (r.n_events, r.total_value) for r in last.collect()}
    want = {r.user_id: (r.n_events, round(r.total_value, 4))
            for r in batch.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6
    # state really crossed micro-batches: emissions per user > 1
    multi = (drained.groupBy("user_id").count()
             .filter(F.col("count") > 1).count())
    assert multi > 0


def test_dedup_stream_drops_duplicate_keys(spark, tmp_path):
    """Duplicated event_ids across micro-batches survive exactly once;
    state is key-based so the first arrival wins."""
    from mr_mpi_blast_spark.streaming import dedup_stream

    path = str(tmp_path / "dup_events")
    ev = load_table(spark, SF_DIR, "events").limit(200).cache()
    # write the same 200 events twice -> two files -> two micro-batches
    ev.coalesce(1).write.mode("overwrite").parquet(path)
    ev.coalesce(1).write.mode("append").parquet(path)
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    got = run_available_now(
        dedup_stream(stream, watermark="60 days"), "t_dedup",
        output_mode="append")
    assert got.count() == 200
    assert got.select("event_id").distinct().count() == 200


def test_dedup_content_stream(spark, tmp_path):
    """Same payload, different event_id -> one survivor per distinct
    payload digest."""
    from mr_mpi_blast_spark.streaming import dedup_content_stream

    path = str(tmp_path / "dup_content")
    ev = load_table(spark, SF_DIR, "events").limit(100)
    ev.coalesce(1).write.mode("overwrite").parquet(path)
    # re-emit the same payloads with shifted event_ids
    (ev.withColumn("event_id", F.col("event_id") + 1_000_000)
       .coalesce(1).write.mode("append").parquet(path))
    distinct_payloads = (spark.read.parquet(path)
                         .select("user_id", "event_type", "value", "props")
                         .distinct().count())
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    got = run_available_now(
        dedup_content_stream(stream, watermark="60 days"), "t_dedup_c",
        output_mode="append")
    assert got.count() == distinct_payloads


@pytest.mark.slow
def test_interval_join_stream_batch_parity(spark, event_dir):
    """Stream-stream interval join drains to exactly the batch join's
    rows: every click paired with the same user's errors in the
    preceding hour."""
    from mr_mpi_blast_spark.streaming import (click_error_interval_join,
                                              read_event_stream)
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    # watermark spans the whole fixture: the files arrive unordered, so
    # a short horizon would (correctly, for a stream) evict rows that
    # the all-at-once batch join still sees — parity needs the horizon
    # to cover the data span
    sj = click_error_interval_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "error"),
        watermark="90 days")
    got = run_available_now(sj, "interval_join_t", output_mode="append")

    batch = spark.read.parquet(event_dir)
    bj = click_error_interval_join(
        batch.filter(F.col("event_type") == "click"),
        batch.filter(F.col("event_type") == "error"))
    assert bj.count() > 0
    assert got.exceptAll(bj).count() == 0
    assert bj.exceptAll(got).count() == 0


def test_parquet_sink_exactly_once_across_restart(spark, tmp_path):
    """The file sink + checkpoint must survive a stop/restart without
    re-reading committed input or double-writing output."""
    from mr_mpi_blast_spark.streaming import (read_event_stream,
                                              stream_to_parquet)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_DIR, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    first.coalesce(1).write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src)
    stream_to_parquet(stream.select("event_id", "user_id"), out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    # restart with MORE input in the source dir and the same checkpoint
    second = ev.filter(F.col("event_id") % 2 == 1)
    second.coalesce(1).write.mode("append").parquet(src)
    stream2 = read_event_stream(spark, src)
    stream_to_parquet(stream2.select("event_id", "user_id"), out, ckpt)

    got = spark.read.parquet(out)
    assert got.count() == ev.count()                     # no duplicates
    assert got.select("event_id").distinct().count() == ev.count()


def test_kernel_stream_equals_batch(spark, tmp_path):
    """Streaming search parity: query files delivered as a stream (one
    file per micro-batch) through the block kernel must produce
    EXACTLY the batch pipeline's rows over the same query set — and a
    rerun against the same checkpoint must commit nothing new
    (exactly-once across restart)."""
    from mr_mpi_blast_spark.config import BlastConfig
    from mr_mpi_blast_spark.plans.pipeline import run_kernel_raw
    from mr_mpi_blast_spark.streaming.kernel_stream import (
        read_stream_hits, search_query_stream)

    docs = load_table(spark, SF_DIR, "documents")
    queries = (docs.filter(F.col("doc_id") % 14 == 0)
               .select(F.col("doc_id").alias("qid"),
                       F.concat(F.lit("q_"), "doc_id").alias("defline"),
                       F.col("text").alias("seq"),
                       F.col("n_chars").cast("int").alias("length")))
    subjects = (docs.filter(F.col("doc_id") % 3 == 0)
                .select(F.concat(F.lit("s_"), "doc_id").alias("sid"),
                        F.concat(F.lit("s_"), "doc_id").alias("defline"),
                        F.lit("db.0").alias("db_part"),
                        F.col("text").alias("seq"),
                        F.col("n_chars").cast("int").alias("length")))
    cfg = BlastConfig(task="blastp", word_size=12, block_size=5000)

    # deliver the queries as TWO files -> two micro-batches
    src = str(tmp_path / "qsrc")
    queries.repartition(2).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(queries.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")
    search_query_stream(stream, subjects, cfg, out, ckpt)

    got = read_stream_hits(spark, out)
    want, _, _ = run_kernel_raw(queries, subjects, cfg)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    n_batches = len([d for d in os.listdir(out) if d.startswith("batch=")])
    assert n_batches >= 2, "stream must actually micro-batch"

    # restart against the same checkpoint: nothing new to commit
    import time as _t
    mtimes = {d: os.path.getmtime(os.path.join(out, d))
              for d in os.listdir(out)}
    stream2 = (spark.readStream.schema(queries.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    search_query_stream(stream2, subjects, cfg, out, ckpt)
    assert {d: os.path.getmtime(os.path.join(out, d))
            for d in os.listdir(out)} == mtimes
    assert read_stream_hits(spark, out).count() == want.count()


def test_read_stream_hits_skips_torn_batch(spark, tmp_path):
    """A batch directory without _SUCCESS (hard crash mid-write) must
    not surface partial rows; the cumulative read sees only committed
    batches, and an out_dir with ONLY torn batches reads as empty."""
    from mr_mpi_blast_spark.kernel.builtin import RAW_HITS
    from mr_mpi_blast_spark.streaming.kernel_stream import read_stream_hits

    out = str(tmp_path / "hits")
    row = [(1, "s_1", 10, 5, 5, 0, 0, 5, 0, 5, 1, 1, 5)]
    cols = RAW_HITS.fieldNames()
    df = spark.createDataFrame(row, RAW_HITS)
    df.write.parquet(os.path.join(out, "batch=0"))          # committed
    df.write.parquet(os.path.join(out, "batch=1"))
    os.remove(os.path.join(out, "batch=1", "_SUCCESS"))     # torn
    got = read_stream_hits(spark, out)
    assert got.columns == cols
    assert got.count() == 1                                 # torn excluded
    os.remove(os.path.join(out, "batch=0", "_SUCCESS"))
    assert read_stream_hits(spark, out).count() == 0        # all torn


@pytest.mark.slow
def test_stream_tail_equals_batch_tail_across_batches(spark, tmp_path):
    """End-to-end streamed RELATIONAL TAIL parity: the canonical HITS
    derived from accumulated stream commits (projections + statistics
    + e-value filter + per-query top-k) must equal the batch
    pipeline's over the same inputs — including a query whose raw
    hits SPAN micro-batches (delivered in two separate files), where
    a per-batch top-k would rank only half its hits."""
    from mr_mpi_blast_spark.config import BlastConfig
    from mr_mpi_blast_spark.plans.pipeline import (run_kernel_raw,
                                                   search_from_raw)
    from mr_mpi_blast_spark.streaming.kernel_stream import (
        read_stream_hits, search_from_stream, search_query_stream)

    docs = load_table(spark, SF_DIR, "documents")
    qbase = (docs.filter(F.col("doc_id") % 7 == 0)
             .select(F.col("doc_id").alias("qid"),
                     F.concat(F.lit("q_"), "doc_id").alias("defline"),
                     F.col("text").alias("seq"),
                     F.col("n_chars").cast("int").alias("length")))
    # the spanning query: doc 0 re-delivered in a second file
    dup = qbase.filter(F.col("qid") == 0)
    assert dup.count() == 1
    subjects = (docs.filter(F.col("doc_id") % 3 == 0)
                .select(F.concat(F.lit("s_"), "doc_id").alias("sid"),
                        F.concat(F.lit("s_"), "doc_id").alias("defline"),
                        F.lit("db.0").alias("db_part"),
                        F.col("text").alias("seq"),
                        F.col("n_chars").cast("int").alias("length")))
    cfg = BlastConfig(task="blastp", word_size=12, block_size=5000,
                      evalue=10.0, num_hit_cutoff=10)

    src = str(tmp_path / "qsrc")
    qbase.repartition(2).write.mode("overwrite").parquet(src)
    dup.coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(qbase.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")
    search_query_stream(stream, subjects, cfg, out, ckpt)

    # the duplicated query's raw hits must actually span >= 2 batches
    per_batch = [
        spark.read.parquet(os.path.join(out, d))
        .filter(F.col("qid") == 0).count()
        for d in sorted(os.listdir(out)) if d.startswith("batch=")]
    assert sum(1 for n in per_batch if n > 0) >= 2, per_batch

    got = search_from_stream(spark, out, cfg)
    batch_queries = qbase.unionByName(dup)  # same multiset of inputs
    raw, dbsize, n_seqs = run_kernel_raw(batch_queries, subjects, cfg)
    want = search_from_raw(raw, dbsize, n_seqs, cfg)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.filter(F.col("qid") == 0).count() > 0


def test_search_from_stream_empty_stream(spark, tmp_path):
    """An out_dir with no committed batches (all-empty stream: dir
    exists, no meta) must yield the empty canonical HITS frame, not a
    FileNotFoundError."""
    from mr_mpi_blast_spark.config import BlastConfig
    from mr_mpi_blast_spark.streaming.kernel_stream import search_from_stream
    out = str(tmp_path / "hits")
    os.makedirs(out)
    got = search_from_stream(spark, out, BlastConfig(task="blastp"))
    assert got.count() == 0
    assert "evalue" in got.columns and "bitscore" in got.columns


def test_cdc_stream_equals_batch(spark, tmp_path):
    """Streaming MERGE parity: a changeset delivered across multiple
    micro-batches folds into EXACTLY the batch apply_changeset result
    on the whole changeset (keys appear once each — the compaction
    contract), and a rerun against the same checkpoint commits
    nothing new (exactly-once across restart)."""
    from mr_mpi_blast_spark.operators.cdc import apply_changeset
    from mr_mpi_blast_spark.streaming.cdc_stream import (
        apply_changeset_stream, read_cdc_state)

    target = spark.createDataFrame(
        [(k, f"v{k}", k * 10) for k in range(1, 21)],
        "k long, s string, v long")
    rows = ([(k, f"V{k}", k * 100, "U") for k in range(1, 8)]     # updates
            + [(k, None, 0, "D") for k in range(8, 13)]           # deletes
            + [(k, f"n{k}", k, "I") for k in range(30, 39)])      # inserts
    changes = spark.createDataFrame(rows, "k long, s string, v long, "
                                          "op string")
    src = str(tmp_path / "csrc")
    changes.repartition(3).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(changes.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    apply_changeset_stream(target, stream, ["k"], state, ckpt)

    got = read_cdc_state(spark, state)
    want = apply_changeset(target, changes, ["k"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    n_batches = len([d for d in os.listdir(state)
                     if d.startswith("batch=")])
    assert n_batches >= 3, "changeset must actually micro-batch"

    # restart against the same checkpoint: no new commits, same state
    mtimes = {d: os.path.getmtime(os.path.join(state, d))
              for d in os.listdir(state) if d.startswith("batch=")}
    stream2 = (spark.readStream.schema(changes.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    apply_changeset_stream(target, stream2, ["k"], state, ckpt)
    assert {d: os.path.getmtime(os.path.join(state, d))
            for d in os.listdir(state)
            if d.startswith("batch=")} == mtimes
    assert read_cdc_state(spark, state).count() == want.count()


def test_cdc_stream_sequential_key_revisit(spark, tmp_path):
    """A key inserted by an earlier batch and updated by a later one is
    sequential MERGE application: the final state carries the LATER
    batch's payload. Delivered as two explicit single-file batches so
    the order is deterministic."""
    from mr_mpi_blast_spark.streaming.cdc_stream import (
        apply_changeset_stream, read_cdc_state)

    target = spark.createDataFrame([(1, "a")], "k long, s string")
    schema = "k long, s string, op string"
    src = str(tmp_path / "csrc")
    os.makedirs(src)
    b1 = spark.createDataFrame([(2, "first", "I")], schema)
    b2 = spark.createDataFrame([(2, "second", "U"), (1, None, "D")],
                               schema)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    for i, b in enumerate((b1, b2)):
        b.coalesce(1).write.mode("append").parquet(src)
        stream = (spark.readStream.schema(b.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        apply_changeset_stream(target, stream, ["k"], state, ckpt)
    got = {r.k: r.s for r in read_cdc_state(spark, state).collect()}
    assert got == {2: "second"}


def test_cdc_stream_rejects_different_target_on_resume(spark, tmp_path):
    """r11 advisory closure: once the base snapshot is staged, the
    target is fixed for that state_dir. A resume passing a DIFFERENT
    target must raise (schema+rowcount fingerprint disagreement), not
    silently merge new changes onto the stale staged snapshot."""
    from mr_mpi_blast_spark.streaming.cdc_stream import \
        apply_changeset_stream

    schema = "k long, s string, op string"
    src = str(tmp_path / "csrc")
    spark.createDataFrame([(2, "x", "I")], schema) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    def mkstream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    target = spark.createDataFrame([(1, "a")], "k long, s string")
    apply_changeset_stream(target, mkstream(), ["k"], state, ckpt)
    # same target resumes fine (fingerprint agrees)
    apply_changeset_stream(target, mkstream(), ["k"], state, ckpt)
    # different row count, same schema -> rejected
    other = spark.createDataFrame([(1, "a"), (9, "z")],
                                  "k long, s string")
    with pytest.raises(ValueError, match="different target"):
        apply_changeset_stream(other, mkstream(), ["k"], state, ckpt)
    # different schema -> rejected
    wide = spark.createDataFrame([(1, "a", 0)],
                                 "k long, s string, extra long")
    with pytest.raises(ValueError, match="different target"):
        apply_changeset_stream(wide, mkstream(), ["k"], state, ckpt)


def test_read_cdc_state_requires_stage(spark, tmp_path):
    from mr_mpi_blast_spark.streaming.cdc_stream import read_cdc_state
    with pytest.raises(FileNotFoundError, match="staged base"):
        read_cdc_state(spark, str(tmp_path / "nope"))


def test_watermark_drops_late_data_across_restart(spark, tmp_path):
    """The late-data contract, exercised rather than narrated: with a
    1-hour watermark, an event arriving in a LATER micro-batch for a
    window already finalized (window end < watermark) is dropped — and
    the watermark itself is recovered from the checkpoint across a
    stream restart, so the drop happens even when the late file
    arrives in a separate run."""
    import datetime as dt

    from mr_mpi_blast_spark.streaming import hourly_counts

    def ev(h, m, typ):
        return (dt.datetime(2024, 3, 1, h, m), typ, 1.0)

    schema = "ts timestamp, event_type string, value double"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = (hourly_counts(stream, watermark="1 hour")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    # run 1: two 10:00-window events + a 14:00 event that pushes the
    # watermark to 13:00, finalizing (and emitting) the 10:00 window
    drain([ev(10, 0, "view"), ev(10, 5, "view"), ev(14, 0, "click")])
    # run 2 (restart from checkpoint): a LATE 10:10 event — its window
    # closed below the recovered watermark — plus an on-time 14:10
    drain([ev(10, 10, "view"), ev(14, 10, "click")])

    got = {(r.hour, r.event_type): r.n
           for r in spark.read.parquet(out).collect()}
    # the finalized 10:00 window counts exactly the two ON-TIME events
    assert got[("2024-03-01 10:00", "view")] == 2
    # the 14:00 window is not yet past the watermark: absent, not torn
    assert not any(h.startswith("2024-03-01 14") for h, _ in got)


def test_asof_join_stream_equals_batch_with_spanning_pair(spark, tmp_path):
    """r11 streaming as-of twin: the error arrives in an EARLIER
    micro-batch than its click (join state spans batches), ties at one
    (user, ts) resolve to the max err_id, an out-of-horizon error and
    a no-error user both yield left rows with nulls, and every real
    click's answer equals the horizon-bounded batch twin's."""
    import datetime as dt

    from mr_mpi_blast_spark.streaming import (click_error_asof_join,
                                              run_available_now)
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    src = str(tmp_path / "src")
    batches = [
        [(101, 1, base, "error"), (102, 1, base, "error"),
         (103, 2, base - dt.timedelta(minutes=90), "error")],
        [(201, 1, base + dt.timedelta(minutes=30), "click"),
         (202, 2, base + dt.timedelta(minutes=30), "click"),
         (203, 3, base + dt.timedelta(minutes=20), "click")],
        # watermark-advancing sentinels on BOTH inputs: the global
        # watermark is the MIN across all watermarked sides, so a
        # click-only sentinel would leave the error-side watermark
        # (and with it every flush) stalled at the last real error.
        # The second pair forces the extra micro-batches that drain
        # the join's unmatched-left buffer and then the aggregation.
        [(901, 99, base + dt.timedelta(hours=10), "click"),
         (801, 99, base + dt.timedelta(hours=10), "error")],
        [(902, 99, base + dt.timedelta(hours=20), "click"),
         (802, 99, base + dt.timedelta(hours=20), "error")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    def split(df):
        return (df.filter(F.col("event_type") == "click"),
                df.filter(F.col("event_type") == "error"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    sj = click_error_asof_join(*split(stream), horizon="1 hour",
                               watermark="10 minutes")
    got = {r.click_id: (r.err_id, r.e_ts)
           for r in run_available_now(sj, "asof_t",
                                      output_mode="append").collect()}
    assert got[201] == (102, base)           # latest error, tie -> max id
    assert got[202] == (None, None)          # error outside the horizon
    assert got[203] == (None, None)          # user with no errors
    # batch twin (watermarks no-op) agrees click-for-click
    want = {r.click_id: (r.err_id, r.e_ts)
            for r in click_error_asof_join(
                *split(spark.read.parquet(src)),
                horizon="1 hour").collect()}
    for k in (201, 202, 203):
        assert got[k] == want[k]


def test_hdr_sketch_stream_equals_batch(spark, event_dir):
    """r11: the HDR quantile sketch maintained as a streaming
    aggregation (complete mode, state bounded by the value domain —
    no watermark needed) drains to exactly the batch sketch."""
    from mr_mpi_blast_spark.operators.profile import hdr_sketch
    from mr_mpi_blast_spark.streaming import (hdr_sketch_stream,
                                              read_event_stream)
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    got = {r.bucket: r.cnt
           for r in run_available_now(hdr_sketch_stream(stream),
                                      "t_hdr",
                                      output_mode="complete").collect()}
    batch = spark.read.parquet(event_dir).selectExpr(
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v")
    want = {r.bucket: r.cnt for r in hdr_sketch(batch, "v").collect()}
    assert got == want and len(want) > 10


def test_hdr_sketch_stream_guards_like_batch(spark):
    """r11 review regression: the streaming twin must reject
    NULL/negative values with the SAME loud guard as the batch sketch
    (it previously bucketed them silently)."""
    from mr_mpi_blast_spark.streaming import hdr_sketch_stream
    bad = spark.createDataFrame([(1, -3.0)], "event_id long, value double")
    with pytest.raises(Exception, match="non-negative"):
        hdr_sketch_stream(bad).collect()


def test_cdc_stream_legacy_state_without_fingerprint(spark, tmp_path):
    """A pre-fingerprint (or torn-fingerprint) state dir falls back to
    the documented legacy contract — target ignored once staged, no
    crash — instead of IndexError-ing on an uncommitted sidecar."""
    import shutil

    from mr_mpi_blast_spark.streaming.cdc_stream import (
        apply_changeset_stream, read_cdc_state)

    schema = "k long, s string, op string"
    src = str(tmp_path / "csrc")
    spark.createDataFrame([(2, "x", "I")], schema) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    def mkstream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    target = spark.createDataFrame([(1, "a")], "k long, s string")
    apply_changeset_stream(target, mkstream(), ["k"], state, ckpt)
    # simulate a legacy dir: drop the fingerprint commit marker
    shutil.rmtree(os.path.join(state, "base_fp"))
    other = spark.createDataFrame([(9, "z")], "k long, s string")
    apply_changeset_stream(other, mkstream(), ["k"], state, ckpt)
    assert read_cdc_state(spark, state).count() == 2  # {1,2} unchanged


def test_asof_join_exactly_once_across_restart(spark, tmp_path):
    """r11: the as-of twin's two stateful operators (join buffer +
    per-click aggregation) must survive a stop/restart on the same
    checkpoint: every click's answer is emitted exactly once across
    the two drains, and the union equals the horizon-bounded batch
    twin over all delivered data."""
    import datetime as dt

    from mr_mpi_blast_spark.streaming import click_error_asof_join
    from mr_mpi_blast_spark.streaming.events import stream_to_parquet

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ck"))
    wave1 = [
        [(101, 1, base, "error")],
        [(201, 1, base + dt.timedelta(minutes=30), "click")],
    ]
    # sentinels advance BOTH sides (min-global-watermark rule)
    wave2 = [
        [(301, 2, base + dt.timedelta(hours=5), "click"),
         (302, 2, base + dt.timedelta(hours=5, minutes=-10), "error")],
        [(901, 99, base + dt.timedelta(hours=10), "click"),
         (801, 99, base + dt.timedelta(hours=10), "error")],
        [(902, 99, base + dt.timedelta(hours=20), "click"),
         (802, 99, base + dt.timedelta(hours=20), "error")],
    ]

    def deliver(batches):
        for rows in batches:
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(src)

    def drain():
        s = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", 1).parquet(src))
        j = click_error_asof_join(
            s.filter(F.col("event_type") == "click"),
            s.filter(F.col("event_type") == "error"),
            horizon="1 hour", watermark="10 minutes")
        stream_to_parquet(j, out, ckpt)

    deliver(wave1)
    drain()                      # click 201 may not flush yet (wm low)
    deliver(wave2)
    drain()                      # restart on the same checkpoint
    got = spark.read.parquet(out)
    # exactly-once: no click id appears twice across the two drains
    assert (got.groupBy("click_id").count()
            .filter(F.col("count") > 1).count()) == 0
    res = {r.click_id: r.err_id for r in got.collect()}
    assert res[201] == 101       # pair delivered before the restart
    assert res[301] == 302       # pair delivered after the restart
    assert 901 in res or 902 in res  # sentinels flushed too


def test_zorder_ingest_stream_equals_batch(spark, tmp_path):
    """r12 streaming layout ingest: a delta delivered across multiple
    micro-batches lands in the layout with (a) the final committed
    manifest equal to a from-scratch manifest, (b) values equal to
    base+delta (cells SPAN micro-batches — several batches append
    files into the same cell), and (c) a rerun against the same
    checkpoint committing nothing new (exactly-once across restart:
    manifest head and version list unchanged)."""
    from mr_mpi_blast_spark.operators.layout import (
        manifest_versions, pruned_read, read_zorder_manifest,
        write_zorder_layout, zorder_manifest)
    from mr_mpi_blast_spark.streaming.layout_stream import \
        ingest_zorder_stream

    base = spark.createDataFrame(
        [(i, i % 23, (i * 3) % 19) for i in range(1000)],
        "id long, x long, y long")
    layout = str(tmp_path / "zs")
    write_zorder_layout(base, "x", "y", layout, target_files=8)
    delta = spark.createDataFrame(
        [(5000 + i, i % 23, (i * 3) % 19) for i in range(300)],
        "id long, x long, y long")
    src = str(tmp_path / "zsrc")
    delta.repartition(3).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    ckpt = str(tmp_path / "zckpt")
    ingest_zorder_stream(stream, layout, ckpt)

    vs = manifest_versions(spark, layout)
    assert len(vs) >= 4, vs          # v1 (base) + >=3 batch publishes
    man, _ = read_zorder_manifest(spark, layout)
    fresh = zorder_manifest(spark, layout)
    assert sorted(map(tuple, man.collect())) \
        == sorted(map(tuple, fresh.collect()))
    # cells span micro-batches: some cell accumulated files from
    # several appends (base + >=2 batches)
    assert any(len(r.files) >= 3 for r in man.collect())
    got, _, _ = pruned_read(spark, layout)
    want = sorted([r.id for r in base.collect()]
                  + [r.id for r in delta.collect()])
    assert sorted(r.id for r in got.collect()) == want

    # restart against the same checkpoint: nothing new commits
    stream2 = (spark.readStream.schema(delta.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    ingest_zorder_stream(stream2, layout, ckpt)
    assert manifest_versions(spark, layout) == vs
    assert pruned_read(spark, layout)[0].count() == len(want)


def test_zorder_ingest_replay_after_partial_publish(spark, tmp_path):
    """The crash window between data write and manifest commit: the
    orphan batch directory is invisible, and a rerun republishes it
    exactly once (append_published guard keeps a COMMITTED batch's
    files untouched; the torn one is re-appended under its own id)."""
    from mr_mpi_blast_spark.operators.layout import (
        append_published, append_to_zorder_layout, pruned_read,
        upsert_zorder_manifest, write_zorder_layout)

    base = spark.createDataFrame(
        [(i, i % 13, i % 7) for i in range(400)],
        "id long, x long, y long")
    layout = str(tmp_path / "zp")
    write_zorder_layout(base, "x", "y", layout, target_files=4)
    b0 = spark.createDataFrame([(9000 + i, i % 13, i % 7)
                                for i in range(50)],
                               "id long, x long, y long")
    # simulate the torn first attempt: data committed, publish lost
    append_to_zorder_layout(b0, layout, append_id="b0")
    assert not append_published(spark, layout, "b0")
    assert pruned_read(spark, layout)[0].count() == 400  # invisible
    # replay: re-append under the same id (overwrites only its own
    # dir), then publish — rows appear exactly once
    res = append_to_zorder_layout(b0, layout, append_id="b0")
    upsert_zorder_manifest(spark, layout, res)
    assert append_published(spark, layout, "b0")
    assert pruned_read(spark, layout)[0].count() == 450
    # a second replay after the committed publish is a no-op
    assert upsert_zorder_manifest(spark, layout, res) \
        == upsert_zorder_manifest(spark, layout, res)
    assert pruned_read(spark, layout)[0].count() == 450


def test_zorder_merge_stream_upserts_exactly_once(spark, tmp_path):
    """r12 streaming MERGE: a CDC-upsert stream drained one
    micro-batch at a time replaces matched keys and inserts new ones;
    a key touched in two micro-batches resolves to the LATER batch
    (serialized merges = last-write-wins); a rerun against the same
    checkpoint commits nothing (the merge replay guard)."""
    import os
    import time
    from mr_mpi_blast_spark.operators.layout import (
        fsck_zorder_layout, manifest_versions, pruned_read,
        write_zorder_layout)
    from mr_mpi_blast_spark.streaming.layout_stream import \
        merge_zorder_stream

    base = spark.createDataFrame(
        [(i, i % 17, (i * 3) % 13, "old") for i in range(800)],
        "id long, x long, y long, s string")
    layout = str(tmp_path / "zm")
    write_zorder_layout(base, "x", "y", layout, target_files=8)

    src = str(tmp_path / "zmsrc")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [(i, i % 17, (i * 3) % 13, "b1") for i in range(0, 60)]
        + [(9000, 40, 40, "b1")],                 # brand-new cell
        "id long, x long, y long, s string")
    b2 = spark.createDataFrame(
        [(i, i % 17, (i * 3) % 13, "b2") for i in range(50, 80)],
        "id long, x long, y long, s string")      # ids 50..59 re-hit
    # one source dir, one plain parquet FILE per micro-batch;
    # FileStreamSource orders files by modification time, so force b1
    # strictly earlier to make the cross-batch last-write-wins
    # assertion deterministic
    import shutil
    now = time.time()
    for name, df, t in (("b1", b1, now - 100), ("b2", b2, now)):
        scratch = str(tmp_path / f"scratch_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(scratch)
        part = next(f for f in os.listdir(scratch)
                    if f.endswith(".parquet"))
        dst = os.path.join(src, f"{name}.parquet")
        shutil.move(os.path.join(scratch, part), dst)
        os.utime(dst, (t, t))
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false")
              .parquet(src))
    ckpt = str(tmp_path / "zmckpt")
    merge_zorder_stream(stream, layout, ckpt, ["id"])

    vs = manifest_versions(spark, layout)
    got = {r.id: r.s for r in pruned_read(spark, layout)[0].collect()}
    assert len(got) == 801                        # 800 base + 1 insert
    assert got[9000] == "b1"
    assert all(got[i] == "b1" for i in range(0, 50))
    assert all(got[i] == "b2" for i in range(50, 80))   # later batch won
    assert all(got[i] == "old" for i in range(80, 800))
    assert fsck_zorder_layout(spark, layout).count() == 0

    # rerun against the same checkpoint: nothing commits
    stream2 = (spark.readStream.schema(b1.schema)
               .option("maxFilesPerTrigger", 1)
               .option("latestFirst", "false")
               .parquet(src))
    merge_zorder_stream(stream2, layout, ckpt, ["id"])
    assert manifest_versions(spark, layout) == vs
    assert {r.id: r.s for r in
            pruned_read(spark, layout)[0].collect()} == got


def test_zorder_merge_stream_independent_streams(spark, tmp_path):
    """r12 review: two INDEPENDENT CDC streams (different checkpoints)
    draining into one layout must not mistake each other's committed
    batch ids for replays — the per-stream prefix keeps feed B's
    batch 0 from silently no-opping on feed A's."""
    import os
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout)
    from mr_mpi_blast_spark.streaming.layout_stream import \
        merge_zorder_stream

    base = spark.createDataFrame(
        [(i, i % 5, i % 3, "old") for i in range(200)],
        "id long, x long, y long, s string")
    layout = str(tmp_path / "zind")
    write_zorder_layout(base, "x", "y", layout, target_files=2)
    schema = "id long, x long, y long, s string"
    for tag, ckpt_name in (("a", "ck_a"), ("b", "ck_b")):
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src, exist_ok=True)
        (spark.createDataFrame([(5, 0, 2, tag)], schema)
         .coalesce(1).write.mode("overwrite").parquet(src))
        stream = spark.readStream.schema(base.schema).parquet(src)
        merge_zorder_stream(stream, layout,
                            str(tmp_path / ckpt_name), ["id"])
    got = {r.id: r.s for r in pruned_read(spark, layout)[0].collect()}
    # feed B ran as its own batch 0 and applied (a bare b<batch_id>
    # namespace would have no-opped it against feed A's commit)
    assert got[5] == "b"
    assert len(got) == 200


def test_zorder_merge_stream_intra_batch_order(spark, tmp_path):
    """order_col collapses intra-batch duplicate keys to the row with
    the greatest sequence number BEFORE the merge — one upsert per
    key per batch, the CDC consumer contract."""
    import os
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout)
    from mr_mpi_blast_spark.streaming.layout_stream import \
        merge_zorder_stream

    base = spark.createDataFrame(
        [(i, i % 5, i % 3, 0, "old") for i in range(100)],
        "id long, x long, y long, seq long, s string")
    layout = str(tmp_path / "ziob")
    write_zorder_layout(base, "x", "y", layout, target_files=2)
    src = str(tmp_path / "ziob_src")
    os.makedirs(src, exist_ok=True)
    # one batch, three versions of key 7 plus one of key 8
    (spark.createDataFrame(
        [(7, 2, 1, 3, "v3"), (7, 2, 1, 1, "v1"), (7, 2, 1, 2, "v2"),
         (8, 3, 2, 1, "w1")],
        "id long, x long, y long, seq long, s string")
     .coalesce(1).write.mode("overwrite").parquet(src))
    stream = spark.readStream.schema(base.schema).parquet(src)
    merge_zorder_stream(stream, layout, str(tmp_path / "ziob_ck"),
                        ["id"], order_col="seq")
    got = {r.id: (r.seq, r.s) for r in
           pruned_read(spark, layout)[0].collect()}
    assert len(got) == 100                 # collapsed: no duplicates
    assert got[7] == (3, "v3")             # greatest seq won
    assert got[8] == (1, "w1")


def test_zorder_merge_replay_guard(spark, tmp_path):
    """merge_id exactly-once: a post-commit replay is a no-op BEFORE
    touching data (even with different input — the guard fires on the
    committed manifest, not the payload); a TORN merge (delta written,
    commit lost) republishes exactly once under the same id."""
    from mr_mpi_blast_spark.operators.layout import (
        append_to_zorder_layout, merge_into_zorder_layout, pruned_read,
        read_zorder_manifest, write_zorder_layout)
    import pytest as _pytest

    base = spark.createDataFrame(
        [(i, i % 11, i % 7, "old") for i in range(300)],
        "id long, x long, y long, s string")
    layout = str(tmp_path / "zr")
    write_zorder_layout(base, "x", "y", layout, target_files=4)
    upd = spark.createDataFrame([(5, 5, 5, "new")],
                                "id long, x long, y long, s string")
    res = merge_into_zorder_layout(spark, layout, upd, ["id"],
                                   merge_id="job1")
    assert res["version"] == 2 and res["rows_written"] == 1
    # post-commit replay: no-op even with a different payload
    other = spark.createDataFrame([(6, 6, 6, "evil")],
                                  "id long, x long, y long, s string")
    res2 = merge_into_zorder_layout(spark, layout, other, ["id"],
                                    merge_id="job1")
    assert res2["version"] == 2 and res2["rows_written"] == 0
    got = {r.id: r.s for r in pruned_read(spark, layout)[0].collect()}
    assert got[5] == "new" and got[6] == "old"
    # torn merge: delta dir exists, no commit - invisible; the replay
    # overwrites its own dir and publishes exactly once
    append_to_zorder_layout(upd.withColumn("s", F.lit("torn")),
                            layout, append_id="mjob2.u")
    assert pruned_read(spark, layout)[0].count() == 300
    res3 = merge_into_zorder_layout(spark, layout, upd, ["id"],
                                    merge_id="job2")
    assert res3["version"] == 3
    man, v = read_zorder_manifest(spark, layout)
    assert v == 3
    got3 = {r.id: r.s for r in pruned_read(spark, layout)[0].collect()}
    assert got3[5] == "new" and len(got3) == 300
    # dotted merge ids are refused (dots delimit the .u/.r suffixes)
    with _pytest.raises(ValueError, match="dot-free"):
        merge_into_zorder_layout(spark, layout, upd, ["id"],
                                 merge_id="a.b")
