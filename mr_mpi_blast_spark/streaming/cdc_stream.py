"""Streaming CDC MERGE: a changeset arrives as a STREAM and is folded
into a maintained snapshot one micro-batch at a time — the streaming
twin of operators/cdc.apply_changeset (the lakehouse MERGE INTO fed by
a CDC feed), under the same exactly-once discipline as the kernel
stream (streaming/kernel_stream.py):

- Each micro-batch's post-merge snapshot commits to its OWN
  ``state/batch=<id>`` directory (copy-on-write: no snapshot is ever
  rewritten in place — exactly what apply_changeset's anti-join+union
  plan produces, materialized). A batch replayed after a crash
  OVERWRITES its own directory, never duplicating rows; the _SUCCESS
  marker gates visibility, so a torn write is invisible until the
  rerun replaces it. The checkpoint prevents source re-delivery of
  committed batches on restart.
- Batch ``id`` merges on top of the latest COMMITTED snapshot below
  ``id`` (falling back to the staged base), so a replayed batch folds
  onto the same predecessor state it saw the first time — the merge is
  deterministic given the source's batch slicing.
- Values are the batch operator's by construction: every micro-batch
  runs the SAME apply_changeset (unknown-op validation included), so
  stream(changeset split any way) == batch(whole changeset) whenever
  each key appears in at most one batch overall (the CDC compaction
  contract apply_changeset documents); keys revisited in LATER batches
  are fine too — that is just sequential MERGE application. Pinned by
  tests/test_streaming.py::test_cdc_stream_equals_batch.

Scale shape: per micro-batch cost is one anti-join of the current
snapshot against a changeset-sized key set (broadcastable — the
common case) plus a snapshot write. At 100 TB the copy-on-write
target would be a partitioned lakehouse table where only touched
partitions rewrite; the per-batch directory here is that contract's
single-table degenerate form, chosen because it keeps replay
idempotence trivially auditable (one directory per batch, one
_SUCCESS per directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mr_mpi_blast_spark.streaming.kernel_stream import (_committed_batch_dirs,
                                                        _hadoop_fs)


def _latest_committed(spark: SparkSession, state_dir: str,
                      below: int | None = None) -> str | None:
    """Path of the highest-id committed ``batch=<id>`` snapshot in
    ``state_dir`` (optionally only ids < ``below``, so a replayed
    batch never reads its own torn predecessor-of-itself)."""
    best_id, best = -1, None
    for p in _committed_batch_dirs(spark, state_dir):
        bid = int(p.rsplit("batch=", 1)[1])
        if (below is None or bid < below) and bid > best_id:
            best_id, best = bid, p
    return best


def apply_changeset_stream(target: DataFrame, changes_stream: DataFrame,
                           key_cols: list[str], state_dir: str,
                           checkpoint_dir: str, op_col: str = "op",
                           timeout_s: int = 300) -> str:
    """Drain a (bounded) CDC stream into a maintained snapshot with
    Trigger.AvailableNow; returns ``state_dir``. The base snapshot
    (``target``) is staged once under ``state_dir/base`` before any
    batch commits; each micro-batch then writes the merged snapshot to
    ``state_dir/batch=<id>``. Raises TimeoutError (checkpoint
    preserved — a rerun resumes without recomputing committed batches)
    if the drain exceeds ``timeout_s``.

    Once the base is staged, ``target`` is FIXED for that state_dir: a
    schema+rowcount fingerprint of the staged base is stored beside it
    and a resume passing a disagreeing target raises ValueError
    instead of silently merging onto the stale snapshot (r11
    advisory). The check costs one count() of the passed target per
    resume — snapshot-sized by contract."""
    from mr_mpi_blast_spark.operators.cdc import apply_changeset

    spark = changes_stream.sparkSession
    fs, hpath = _hadoop_fs(spark, state_dir)
    base = f"{state_dir}/base"
    fp_dir = f"{state_dir}/base_fp"
    if not fs.exists(hpath(f"{base}/_SUCCESS")):
        # fingerprint FIRST, base second: every committed base then
        # has a committed fingerprint, and a crash between the two
        # re-enters this branch (base absent) and rewrites both — the
        # torn state can never reach the verify arm (r11 review: the
        # old order left a _SUCCESS-less fp_dir that IndexError'd
        # every later resume). Written through Spark so the sidecar
        # lives on the same filesystem as the state. The fingerprint
        # lets a resume detect a caller passing a DIFFERENT target
        # (r11 advisory: without it, staging is skipped and the new
        # target silently merges onto the stale snapshot).
        (spark.createDataFrame(
            [(target.schema.simpleString(), target.count())],
            "schema_str string, n_rows long")
         .coalesce(1).write.mode("overwrite").json(fp_dir))
        # idempotent: a concurrent/replayed stager overwrites with the
        # same deterministic content
        target.write.mode("overwrite").parquet(base)
    elif fs.exists(hpath(f"{fp_dir}/_SUCCESS")):
        rec = spark.read.schema("schema_str string, n_rows long") \
            .json(fp_dir).collect()[0]
        got = (target.schema.simpleString(), target.count())
        if got != (rec["schema_str"], rec["n_rows"]):
            raise ValueError(
                f"apply_changeset_stream: state_dir {state_dir!r} was "
                f"staged from a different target (staged schema/rows "
                f"{rec['schema_str']!r}/{rec['n_rows']}, got "
                f"{got[0]!r}/{got[1]}). Once the base is staged the "
                f"target is fixed for that state_dir — use a fresh "
                f"state_dir for a new target.")
    # else: legacy pre-fingerprint state dir — target is ignored once
    # base is staged (documented contract), no way to verify

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = f"{state_dir}/batch={batch_id}"
        if fs.exists(hpath(f"{part}/_SUCCESS")):
            return                    # crash replay: already committed
        prev = _latest_committed(spark, state_dir, below=batch_id) or base
        cur = spark.read.parquet(prev)
        merged = apply_changeset(cur, batch_df, key_cols, op_col)
        merged.write.mode("overwrite").parquet(part)

    q = (changes_stream.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"apply_changeset_stream did not drain within {timeout_s}s "
            f"(checkpoint {checkpoint_dir!r} preserved; rerun resumes)")
    return state_dir


def read_cdc_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained snapshot: the highest-id COMMITTED batch
    directory, or the staged base if no batch has committed (an
    all-empty stream's answer is the unchanged target). Torn
    directories without _SUCCESS are never surfaced — the exactly-once
    contract."""
    fs, hpath = _hadoop_fs(spark, state_dir)
    latest = _latest_committed(spark, state_dir)
    if latest is None:
        base = f"{state_dir}/base"
        if not fs.exists(hpath(f"{base}/_SUCCESS")):
            raise FileNotFoundError(
                f"{state_dir}: neither a committed batch nor a staged "
                f"base snapshot — run apply_changeset_stream first")
        latest = base
    return spark.read.parquet(latest)
