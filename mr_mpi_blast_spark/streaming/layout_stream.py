"""Streaming z-layout ingest: a row stream drains into a
snapshot-versioned z-order layout one micro-batch at a time — the
streaming twin of the batch append path
(operators/layout.append_to_zorder_layout + upsert_zorder_manifest),
and the lakehouse loop the stream side was missing (r11 verdict item
4): CDC and kernel streams already maintain STATE; this one maintains
a TABLE whose readers prune by manifest.

Exactly-once comes from the layout's own commit protocol, not from
extra bookkeeping:

- each micro-batch appends under the DETERMINISTIC id ``b<batch_id>``
  (its own immutable ``data/a=b<id>`` directory — a replay overwrites
  only its own files, never another batch's);
- rows become visible ONLY when the batch's manifest version commits
  (_SUCCESS-gated), so a crash between data write and publish leaves
  an invisible orphan the replay republishes (and gc would collect if
  abandoned);
- a replay of a batch whose manifest already committed is a no-op
  BEFORE touching data (append_published) — it must not re-append,
  because a committed manifest references the first attempt's files.

stream(rows split any way) == batch(write + one append) in VALUES by
construction — every batch runs the same curve arithmetic — and the
final manifest equals the from-scratch manifest (both pinned by
tests/test_streaming.py, including an append spanning micro-batches
and a restart).

Scale shape: per micro-batch cost is one delta-sized clustered write
+ one files-not-rows manifest merge (never re-reads committed data).
Micro-batches serialize on the manifest head (availableNow triggers
run batches sequentially; the optimistic commit fails loudly if an
external writer interleaves) — the single-writer contract every
lakehouse format's streaming sink also carries.

Reference analog: the run restart/SUCCESS-marker protocol of
examples/refseq-all-vs-all/ranger-for-loop-run.sh:131-160 — readers
see only committed state; a rerun republishes, never duplicates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def _stream_prefix(checkpoint_dir: str) -> str:
    """Deterministic per-stream namespace for batch append/merge ids,
    derived from the checkpoint path: the checkpoint IS the stream's
    identity (same checkpoint = same batch numbering = a genuine
    replay), so two INDEPENDENT streams draining into one layout get
    disjoint id namespaces and cannot silently no-op on each other's
    committed batches (r12 review finding — a bare b<batch_id> made
    feed B's batch 0 look like a replay of feed A's). Caveat, same
    as any path-keyed idempotence: relocating a checkpoint directory
    changes the prefix, so finish or discard in-flight work first."""
    h = hashlib.md5(checkpoint_dir.rstrip("/").encode()).hexdigest()
    return f"s{h[:8]}"


def ingest_zorder_stream(rows_stream: DataFrame, layout_dir: str,
                         checkpoint_dir: str,
                         timeout_s: int = 300) -> str:
    """Drain a (bounded) row stream into an EXISTING layout with
    Trigger.AvailableNow; returns ``layout_dir``. The layout must be
    initialized first (write_zorder_layout — the stream needs the
    stored curve/Bloom parameters, the staged-base discipline of
    apply_changeset_stream). Raises TimeoutError (checkpoint
    preserved — a rerun resumes and republishes any half-done batch)
    if the drain exceeds ``timeout_s``."""
    from mr_mpi_blast_spark.operators.layout import (
        append_committed, append_to_zorder_layout, layout_meta,
        upsert_zorder_manifest)

    spark = rows_stream.sparkSession
    layout_meta(spark, layout_dir)      # fail loudly before starting
    sid = _stream_prefix(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        aid = f"{sid}b{batch_id}"
        # crash replay after a committed publish must not re-append —
        # judged against EVERY retained version (a compaction between
        # runs can drop the id from the head while an older retained
        # snapshot still references its files)
        if append_committed(spark, layout_dir, aid):
            return
        res = append_to_zorder_layout(batch_df, layout_dir,
                                      append_id=aid)
        upsert_zorder_manifest(spark, layout_dir, res)

    q = (rows_stream.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"ingest_zorder_stream did not drain within {timeout_s}s "
            f"(checkpoint {checkpoint_dir!r} preserved; rerun resumes)")
    return layout_dir


def merge_zorder_stream(changes_stream: DataFrame, layout_dir: str,
                        checkpoint_dir: str, key_cols: list,
                        order_col: str | None = None,
                        timeout_s: int = 300) -> str:
    """Drain a (bounded) CDC-upsert stream into an EXISTING layout:
    each micro-batch is one merge_into_zorder_layout under the
    DETERMINISTIC id ``<stream_prefix>b<batch_id>`` (prefix derived
    from the checkpoint path — independent streams into one layout
    get disjoint namespaces) — matched rows replaced, new rows
    inserted, both atomically per batch. Exactly-once comes from the
    merge's own replay guard (a batch whose manifest committed in any
    RETAINED version is a no-op before touching data; a torn batch
    redoes its own directories only), the ingest twin's discipline
    applied to upserts. Keys recurring ACROSS micro-batches resolve to the
    latest batch's row because availableNow batches serialize on the
    manifest head — the per-key last-write-wins a CDC consumer
    expects. Within one micro-batch, duplicate keys are collapsed to
    the row with the greatest ``order_col`` when one is given (the
    CDC sequence number / event timestamp; ties break arbitrarily —
    supply a unique ordering column for determinism); without
    ``order_col`` intra-batch duplicates are NOT collapsed (both rows
    land — pre-aggregate upstream if the source carries dups).
    Raises TimeoutError with the checkpoint preserved, like
    ingest_zorder_stream."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mr_mpi_blast_spark.operators.layout import (
        layout_meta, merge_into_zorder_layout)

    spark = changes_stream.sparkSession
    layout_meta(spark, layout_dir)      # fail loudly before starting
    sid = _stream_prefix(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if order_col is not None:
            w = (Window.partitionBy(*key_cols)
                 .orderBy(F.col(order_col).desc()))
            batch_df = (batch_df
                        .withColumn("_rn", F.row_number().over(w))
                        .filter(F.col("_rn") == 1).drop("_rn"))
        merge_into_zorder_layout(spark, layout_dir, batch_df, key_cols,
                                 merge_id=f"{sid}b{batch_id}")

    q = (changes_stream.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"merge_zorder_stream did not drain within {timeout_s}s "
            f"(checkpoint {checkpoint_dir!r} preserved; rerun resumes)")
    return layout_dir
