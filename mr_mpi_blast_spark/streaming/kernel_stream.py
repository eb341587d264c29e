"""Streaming search: query batches arrive as a STREAM against a
static, pre-formatted subject database — the reference's operational
mode re-expressed as Structured Streaming. The HiCOMB production runs
delivered queries as numbered file parts against fixed DB volumes
(examples/refseq-all-vs-all/README:36-60 — 63 query-file parts, 3 DB
partitions; the scheduler consumed (query part x volume) work items);
here `readStream` over a query directory is the arrival mechanism,
and every micro-batch runs the SAME applyInPandas block kernel as the
batch pipeline (plans/pipeline.run_kernel_raw), so stream and batch
results are identical by construction — pinned by
tests/test_streaming.py::test_kernel_stream_equals_batch.

Exactly-once without a two-phase sink: each micro-batch commits to its
own `batch=<id>` directory. A batch replayed after a crash overwrites
ITS OWN directory (mode=overwrite), never appending duplicates — the
idempotent-by-path contract the reference gets from one output file
per work item (mrblast.cpp hit-file naming). The checkpoint makes
re-delivery of already-committed source files impossible on restart;
the per-batch overwrite makes the torn-batch window harmless.

Scale shape: the subject volumes are staged ONCE (content-keyed
makeblastdb analog shared with the batch path), so a long-running
stream pays indexing once per volume per executor and each arriving
query file costs only its own kernel compute — exactly the
amortization the reference's resident DB handle provides across query
parts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mr_mpi_blast_spark.config import BlastConfig


def search_query_stream(query_stream: DataFrame, subjects: DataFrame,
                        cfg: BlastConfig, out_dir: str,
                        checkpoint_dir: str,
                        cache_key: str | None = None,
                        timeout_s: int = 300) -> str:
    """Drain a (bounded) query stream through the block kernel with
    Trigger.AvailableNow; returns out_dir. Raises TimeoutError (query
    stopped, checkpoint preserved) if the drain exceeds timeout_s —
    a rerun resumes from the checkpoint without recomputing committed
    batches."""
    from mr_mpi_blast_spark.plans.pipeline import run_kernel_raw

    # an all-empty stream commits no batch; the out_dir must still
    # exist so read_stream_hits returns the empty RAW_HITS frame
    # instead of PATH_NOT_FOUND
    os.makedirs(out_dir, exist_ok=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = os.path.join(out_dir, f"batch={batch_id}")
        if os.path.exists(os.path.join(part, "_SUCCESS")):
            return                    # crash replay: already committed
        if batch_df.isEmpty():
            return
        raw, dbsize, n_seqs = run_kernel_raw(batch_df, subjects, cfg,
                                             cache_key=cache_key)
        # the DB is static across the stream, so (dbsize, n_seqs) are
        # batch-invariant — record them once so search_from_stream can
        # derive the canonical tail without re-staging the subjects.
        # Written BEFORE the batch parquet commit: a crash in between
        # leaves meta-without-batch (harmless), never a committed
        # batch the tail can't derive statistics for
        meta = os.path.join(out_dir, "_db_meta.json")
        if not os.path.exists(meta):
            import json
            tmp = f"{meta}.{os.getpid()}.tmp"
            with open(tmp, "w") as fh:
                json.dump({"dbsize": dbsize, "n_seqs": n_seqs}, fh)
            os.replace(tmp, meta)
        raw.write.mode("overwrite").parquet(part)

    q = (query_stream.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"search_query_stream did not drain within {timeout_s}s "
            f"(checkpoint {checkpoint_dir!r} preserved; rerun resumes)")
    return out_dir


def _committed_batch_dirs(spark: SparkSession, out_dir: str) -> list[str]:
    """batch=* children of out_dir bearing _SUCCESS, listed through
    the Hadoop FileSystem API so the sink may live on ANY
    Spark-readable filesystem (hdfs://, s3a://, ...), not only the
    driver's local disk as a plain os.listdir would require."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        p = st.getPath()
        if st.isDirectory() and p.getName().startswith("batch=") \
                and fs.exists(jvm.org.apache.hadoop.fs.Path(p, "_SUCCESS")):
            out.append(p.toString())
    return out


def read_stream_hits(spark: SparkSession, out_dir: str) -> DataFrame:
    """All COMMITTED batches' RAW_HITS as one DataFrame (the stream's
    cumulative answer). Only `batch=*` directories bearing _SUCCESS are
    read: a hard crash mid-write leaves a torn directory without the
    marker, and surfacing its partial rows would break the
    exactly-once contract until the rerun overwrites it. basePath
    keeps the batch=<id> partition column out of the schema so rows
    are directly comparable to the batch pipeline's."""
    from mr_mpi_blast_spark.kernel.builtin import RAW_HITS
    committed = sorted(_committed_batch_dirs(spark, out_dir))
    if not committed:
        return spark.createDataFrame([], RAW_HITS)
    # partition discovery appends the batch=<id> column under basePath;
    # project back to the bare RAW_HITS columns so rows compare equal
    # to the batch pipeline's
    return (spark.read.schema(RAW_HITS)
            .option("basePath", out_dir)
            .parquet(*committed)
            .select(*RAW_HITS.fieldNames()))


def search_from_stream(spark: SparkSession, out_dir: str,
                       cfg: BlastConfig) -> DataFrame:
    """Canonical HITS over everything the stream has committed so far:
    projections, Karlin-Altschul statistics, e-value filter, and the
    per-query top-k computed ACROSS accumulated batches — the one
    semantic a per-batch derivation would get wrong, since a query
    whose raw hits span micro-batches (re-delivered or split input)
    must rank all of them together exactly as the batch pipeline
    would. Statistics use the (dbsize, n_seqs) the stream recorded at
    its first commit (the DB is static for the stream's lifetime)."""
    import json

    from mr_mpi_blast_spark.plans.pipeline import search_from_raw
    hits = read_stream_hits(spark, out_dir)
    meta_p = os.path.join(out_dir, "_db_meta.json")
    if not os.path.exists(meta_p):
        # meta is written BEFORE any batch commits, so a missing meta
        # means nothing committed: an all-empty stream's canonical
        # answer is the empty HITS frame (placeholder statistics touch
        # zero rows)
        if not hits.isEmpty():          # defensive: pre-ordering layout
            raise FileNotFoundError(
                f"{meta_p} missing but committed batches exist — "
                "out_dir written by an older layout? rerun the stream")
        return search_from_raw(hits, 1, 0, cfg)
    with open(meta_p) as fh:
        meta = json.load(fh)
    return search_from_raw(hits, int(meta["dbsize"]), int(meta["n_seqs"]),
                           cfg)
