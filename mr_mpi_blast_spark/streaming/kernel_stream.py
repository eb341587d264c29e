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
    import json

    from pyspark.sql import functions as F

    from mr_mpi_blast_spark.plans.pipeline import run_kernel_raw

    spark = query_stream.sparkSession
    # an all-empty stream commits no batch; the out_dir must still
    # exist so read_stream_hits returns the empty RAW_HITS frame
    # instead of PATH_NOT_FOUND. All out_dir filesystem traffic goes
    # through the Hadoop FS API (like _committed_batch_dirs) so the
    # sink may live on any Spark-readable filesystem, not only the
    # driver's local disk.
    fs, hpath = _hadoop_fs(spark, out_dir)
    fs.mkdirs(hpath(out_dir))

    def ensure_meta() -> None:
        # the DB is static across the stream, so (dbsize, n_seqs) are
        # batch-invariant — recorded once so search_from_stream can
        # derive the canonical tail without re-staging the subjects.
        # Derived from the subjects frame directly (the same residue
        # sum / row count run_kernel_raw reports, with the same cfg
        # overrides) so a MISSING meta next to already-committed
        # batches — pre-meta layout, or deleted — is repairable by a
        # rerun even though the replay guard skips the kernel.
        meta = hpath(f"{out_dir}/_db_meta.json")
        if fs.exists(meta):
            return
        agg = subjects.agg(F.sum(F.length("seq")).alias("r"),
                           F.count(F.lit(1)).alias("n")).first()
        dbsize = cfg.dbsize if cfg.dbsize is not None else int(agg["r"] or 0)
        n_seqs = cfg.n_seqs if cfg.n_seqs is not None else int(agg["n"])
        tmp = hpath(f"{out_dir}/_db_meta.json.{os.getpid()}.tmp")
        stream = fs.create(tmp, True)
        stream.write(json.dumps(
            {"dbsize": dbsize, "n_seqs": n_seqs}).encode())
        stream.close()
        if not fs.rename(tmp, meta):
            # rename-to-existing fails on some filesystems; fine iff a
            # concurrent writer already produced the meta (contents are
            # deterministic) — otherwise the failure must surface
            fs.delete(tmp, False)
            if not fs.exists(meta):
                raise IOError(f"could not publish {meta}")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = f"{out_dir}/batch={batch_id}"
        ensure_meta()       # BEFORE any commit: meta-without-batch is
        # harmless; a committed batch without meta would strand the tail
        if fs.exists(hpath(f"{part}/_SUCCESS")):
            return                    # crash replay: already committed
        if batch_df.isEmpty():
            return
        raw, _dbsize, _n_seqs = run_kernel_raw(batch_df, subjects, cfg,
                                               cache_key=cache_key)
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


def _hadoop_fs(spark: SparkSession, base: str):
    """(FileSystem, Path-factory) for ``base`` through the JVM Hadoop
    API — the one filesystem abstraction every out_dir touch uses, so
    hdfs://, s3a:// and plain local paths all behave identically."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def hpath(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = hpath(base).getFileSystem(conf)
    return fs, hpath


def _committed_batch_dirs(spark: SparkSession, out_dir: str) -> list[str]:
    """batch=* children of out_dir bearing _SUCCESS, listed through
    the Hadoop FileSystem API so the sink may live on ANY
    Spark-readable filesystem (hdfs://, s3a://, ...), not only the
    driver's local disk as a plain os.listdir would require."""
    fs, hpath = _hadoop_fs(spark, out_dir)
    path = hpath(out_dir)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        p = st.getPath()
        if st.isDirectory() and p.getName().startswith("batch=") \
                and fs.exists(hpath(f"{p.toString()}/_SUCCESS")):
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
    fs, hpath = _hadoop_fs(spark, out_dir)
    meta_p = hpath(f"{out_dir}/_db_meta.json")
    if not fs.exists(meta_p):
        # meta is written BEFORE any batch commits, so a missing meta
        # means nothing committed: an all-empty stream's canonical
        # answer is the empty HITS frame (placeholder statistics touch
        # zero rows). A pre-meta-layout out_dir WITH committed batches
        # is repairable: rerunning the stream writes meta before the
        # replay guard, so the advice below actually works.
        if not hits.isEmpty():
            raise FileNotFoundError(
                f"{out_dir}/_db_meta.json missing but committed batches "
                "exist (pre-meta layout?) — rerun the stream once; it "
                "records the meta before the replay guard")
        return search_from_raw(hits, 1, 0, cfg)
    jvm = spark.sparkContext._jvm
    stream = fs.open(meta_p)
    baos = jvm.java.io.ByteArrayOutputStream()
    # hadoop's own IOUtils is always on Spark's classpath; closes both
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    meta = json.loads(bytes(baos.toByteArray()).decode())
    return search_from_raw(hits, int(meta["dbsize"]), int(meta["n_seqs"]),
                           cfg)
