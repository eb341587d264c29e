"""Z-order (Morton) layout: the multi-dimensional data-clustering
technique behind OPTIMIZE ZORDER BY in lakehouse table formats.

A 100 TB fact table sorted on ONE key gives perfect min/max file
pruning on that key and none on any other; interleaving the bits of
two keys gives bounded per-file ranges on BOTH, so a range predicate
on either dimension skips most files. The z-value is pure integer
arithmetic (shift = div/mod by powers of two), identical in any
engine — the DuckDB oracle replays the same generated expression.

Two tiers live here: the raw curve arithmetic (zorder_sql / zvalue /
zorder_file_stats — the registered lineitem_zorder manifest), and —
r12 — a SNAPSHOT-VERSIONED layout table built on it (see the section
comment below): immutable per-write data directories, _SUCCESS-gated
versioned manifests carrying per-cell stats + file lists, pruned
reads, exactly-once append/publish, transactional compaction, gc.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_sql(x: str, y: str, bits: int, div_op: str) -> str:
    """The interleaved z-value as a SQL expression over integer
    columns ``x`` and ``y`` (low ``bits`` bits each; callers mask or
    size ``bits`` to cover the domain — 2*bits must stay < 63).
    ``div_op`` is the engine's integer floor division ('div' for
    Spark SQL, '//' for DuckDB).

    PRECONDITION: ``x`` and ``y`` must be NON-NEGATIVE. Both engines'
    ``%``/integer-division semantics on negatives (sign-of-dividend
    remainders) make the bit extraction produce a NON-MONOTONIC, wrong
    interleave for negative inputs — silently, since every value is
    still a valid-looking long. The raw expression carries no guard
    (it must stay replayable verbatim in DuckDB); Spark-side callers
    go through ``zvalue(checked=True)``, which fails loudly instead.
    Map signed domains first (e.g. ``x - min_x``, or a zigzag
    ``2x``/``-2x-1`` encoding) — a stated policy, not a silent clamp.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return zorder_sql_n([x, y], bits, div_op)


def _interleave_stages(k: int, bits: int) -> list:
    """(shift, mask) ladder spreading bit i of a ``bits``-wide value
    to position i*k — the 'binary magic numbers' bit-twiddling
    interleave, generated for ANY k instead of hard-coding the
    classic k=2/k=3 constants (which this reproduces exactly; the
    property tests pin the result against a per-bit mirror). After
    processing power 2^mm, original bit i sits at
    i + (k-1)*((i >> mm) << mm)."""
    out = []
    m = 0
    while (1 << m) < bits:
        m += 1
    for mm in range(m - 1, -1, -1):
        shift = (k - 1) * (1 << mm)
        mask = 0
        for i in range(bits):
            mask |= 1 << (i + (k - 1) * ((i >> mm) << mm))
        out.append((shift, mask))
    return out


def zorder_sql_n(cols: list, bits: int, div_op: str) -> str:
    """N-column generalization (r12): bit i of column j lands at
    interleaved position i*k + j (k = len(cols)) — the multi-column
    OPTIMIZE ZORDER BY (c1, c2, c3, ...) form every lakehouse format
    offers. Same NON-NEGATIVE precondition as the 2-D curve (high
    bits past ``bits`` are masked off, as the per-bit form dropped
    them); k*bits must stay < 63. The 2-D zorder_sql IS
    zorder_sql_n([x, y], ...).

    Rendering (r12 perf): O(log bits) shift/OR/mask stages per column
    (_interleave_stages), NOT the O(bits) per-bit div/mod sum — the
    per-bit form crossed Spark's whole-stage-codegen size cliff at
    ~46 terms and fell back to 10x-slower interpreted evaluation
    (measured: 3x17-bit 4.6 s -> 0.4 s at sf0.1). ``div_op`` selects
    the engine's shift syntax: 'div' -> Spark ``shiftleft(e, n)``,
    '//' -> DuckDB ``(e << n)``; '&'/'|' parse identically in both.
    Value identity across renderings and engines is pinned by the
    grid/mirror tests and the lineitem_zorder/lineitem_zorder3
    oracles."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_sql_n needs at least 2 columns")
    if bits < 1 or k * bits >= 63:
        raise ValueError(
            f"k*bits must stay in [k, 62], got {k}*{bits} = {k * bits}")
    if div_op == "div":
        def shl(e, n):
            return f"shiftleft({e}, {n})"
    elif div_op == "//":
        def shl(e, n):
            return f"({e} << {n})"
    else:
        raise ValueError(f"unknown div_op {div_op!r} ('div' or '//')")
    parts = []
    for j, c in enumerate(cols):
        x = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for sh, mask in _interleave_stages(k, bits):
            x = f"(({x} | {shl(x, sh)}) & {mask})"
        parts.append(x if j == 0 else shl(x, j))
    return "(" + " | ".join(parts) + ")"


def zvalue(x: str, y: str, bits: int = 20, *,
           checked: bool = True) -> Column:
    """Spark column: z-interleave of two non-negative integer columns.

    ``checked=True`` (default, r10 advisory closure) wraps the
    interleave in a guard that raises executor-side on a negative
    input instead of emitting the silently-wrong curve value
    ``zorder_sql`` documents; the cost is one codegen'd CASE per row.
    Pass ``checked=False`` only where the domain is proven
    non-negative upstream (e.g. synthetic keys)."""
    return zvalue_n([x, y], bits, checked=checked)


def zvalue_n(cols: list, bits: int, *, checked: bool = True) -> Column:
    """Spark column: N-way z-interleave with the same loud
    NULL-arm-first / negative guard discipline as ``zvalue`` (the
    NULL arm must come first — an OR of comparisons over a NULL
    input is NULL, not true; r11 advisory)."""
    z = zorder_sql_n(cols, bits, "div")
    if not checked:
        return F.expr(z).cast("long")
    null_arm = " OR ".join(f"{c} IS NULL" for c in cols)
    neg_arm = " OR ".join(f"{c} < 0" for c in cols)
    vals = ", ' ', ".join(cols)
    # guard as a ZERO-VALUED ADDEND, never a CASE wrapping z (r12
    # perf): a CASE whose ELSE branch is the multi-KB interleave text
    # pushes the whole expression over the codegen size cliff and the
    # curve drops to 10x-slower interpreted eval (measured 0.7 s ->
    # 6 s on the 3-way manifest at sf0.1). The tiny guard CASE yields
    # bigint 0 on good rows and raises otherwise; adding it preserves
    # the loud NULL-arm-first / negative contract (r10/r11
    # advisories) while z itself stays codegen-able.
    guard = F.expr(
        f"CASE WHEN {null_arm} THEN "
        f"raise_error('zorder: NULL dimension; the curve is defined "
        f"only on non-negative integers - filter or impute NULLs "
        f"first') "
        f"WHEN {neg_arm} THEN "
        f"raise_error(concat('zorder: negative input (', {vals}, "
        f"'); the interleave is undefined on negatives - shift or "
        f"zigzag-encode the domain first')) "
        f"ELSE CAST(0 AS BIGINT) END")
    return (guard + F.expr(z)).cast("long")


def zorder_file_stats(df: DataFrame, x: str, y: str, *, bits: int = 20,
                      file_width_bits: int = 32) -> DataFrame:
    """Per-file min/max manifest under a z-order layout: rows are
    assigned to files by fixed-width z-range cells (file_id =
    z div 2^file_width_bits — pure arithmetic, no global sort, no
    single-task window), and each file reports its row count and its
    min/max on BOTH dimensions — the statistics a reader prunes with.

    PRECONDITION (inherited from ``zorder_sql``): both dimension
    columns must be non-negative — the manifest would otherwise bin
    rows by a silently-wrong curve. The ``zvalue`` guard below raises
    executor-side on the first negative row.

    One hash aggregate over one scan; at scale the same z-value feeds
    repartitionByRange + sortWithinPartitions to actually write the
    layout, and this manifest is a byproduct of the write.
    """
    z = zvalue(x, y, bits)
    return (df.select(F.col(x).alias("x"), F.col(y).alias("y"),
                      z.alias("z"))
            .groupBy(F.expr(f"z div {1 << file_width_bits}")
                     .alias("file_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                 F.min("y").alias("min_y"), F.max("y").alias("max_y")))



# ---------------------------------------------------------------------------
# Snapshot-versioned z-order layout (r12): the payoff step of the
# z-order family, restructured from r11's overwrite-in-place parquet
# dirs into the commit protocol real lakehouse formats use. The
# reference analog is still the DB-partition selection of
# mrblast.cpp:105-117 (the dblist as the scan scope) plus its
# restart/SUCCESS-marker run protocol
# (examples/refseq-all-vs-all/ranger-for-loop-run.sh) — "readers see
# only committed state", generalized to min/max + Bloom file skipping.
#
# On-disk layout (all reads/writes through Spark or the Hadoop
# FileSystem API — no driver-local os.* calls, so hdfs:// and s3a://
# layouts behave like local ones; r11 advisory):
#
#   <layout_dir>/
#     data/a=<append_id>/zcell=<c>/part-*.parquet
#         -- data files, IMMUTABLE once their append dir commits
#            (_SUCCESS at the a= root); every write (base load,
#            append, compaction) lands in its OWN a= dir, so a torn
#            writer can never corrupt committed files
#     _layout_meta/          one-row JSON: curve + Bloom parameters
#                            (written through Spark, like the CDC
#                            stream's base fingerprint)
#     _manifest/v=<N>/       snapshot manifests (parquet; _SUCCESS
#                            gates the commit). One row per zcell:
#                            stats + the RELATIVE paths of the files
#                            that version references.
#
# The COMMITTED MANIFEST IS THE TABLE: readers resolve the highest
# committed v (or pin one) and open exactly the files it lists.
# Consequences, each test-pinned:
#   - torn/duplicate appends are INVISIBLE until their manifest
#     commit (exactly-once for the streaming ingest twin);
#   - compaction writes new files and flips the manifest — a reader
#     pinned to v=N is value-stable while v=N+1 commits (no torn
#     reads; r11's documented race is closed);
#   - old files stay until gc_zorder_layout, whose retention is the
#     versions still readable.
# Concurrency contract: single WRITER at a time (commit is optimistic
# — a racing commit of the same version fails loudly rather than
# clobbering); readers are unrestricted.
# ---------------------------------------------------------------------------

_LAYOUT_META = "_layout_meta"
_MANIFEST = "_manifest"
_META_SCHEMA = ("x string, y string, bits int, width_bits int, "
                "bloom_col string, bloom_bits int")


class AppendResult(NamedTuple):
    """What an append committed: its data directory id and the cells
    it landed rows in (cells-not-rows sized — the scope of the
    incremental manifest upsert)."""
    append_id: str
    touched: list


def _fs(spark: SparkSession, base: str):
    from mr_mpi_blast_spark.streaming.kernel_stream import _hadoop_fs
    return _hadoop_fs(spark, base)


_META_CACHE: dict = {}


def layout_meta(spark: SparkSession, layout_dir: str) -> dict:
    """The layout's stored curve + Bloom parameters. Every maintainer
    (append/upsert/compact) and the Bloom probe read these from the
    table rather than taking them as arguments — the parameters are
    table properties, so a caller cannot probe with a bloom_bits the
    manifest was not built with (the silent-no-prune drift r11's
    argument-passing form allowed).

    Cached per layout_dir for the process lifetime: the meta is
    WRITE-ONCE by contract (stamped by write_zorder_layout, never
    rewritten — appends/compaction must bin with the same curve), so
    the cache can never go stale, and repeated pruned reads skip the
    metadata-read job (r12 job-profile trim)."""
    cached = _META_CACHE.get(layout_dir)
    if cached is not None:
        return dict(cached)
    fs, hpath = _fs(spark, layout_dir)
    meta_dir = f"{layout_dir}/{_LAYOUT_META}"
    if not fs.exists(hpath(f"{meta_dir}/_SUCCESS")):
        raise FileNotFoundError(
            f"{layout_dir}: no committed {_LAYOUT_META} - not a "
            f"write_zorder_layout output (or a pre-r12 layout; "
            f"rewrite it once to stamp the table parameters)")
    row = spark.read.schema(_META_SCHEMA).json(meta_dir).collect()[0]
    _META_CACHE[layout_dir] = row.asDict()
    return dict(_META_CACHE[layout_dir])


def manifest_versions(spark: SparkSession, layout_dir: str) -> list:
    """Committed manifest versions, ascending. Commit = the v=<N>
    directory bears _SUCCESS — the same marker discipline as the
    streaming sinks' batch= dirs, and atomic on every Hadoop
    filesystem (the marker lands after the files)."""
    fs, hpath = _fs(spark, layout_dir)
    mdir = hpath(f"{layout_dir}/{_MANIFEST}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v=") \
                and fs.exists(hpath(f"{st.getPath().toString()}/_SUCCESS")):
            out.append(int(name[2:]))
    return sorted(out)


def read_zorder_manifest(spark: SparkSession, layout_dir: str,
                         version: int | None = None):
    """(manifest DataFrame, resolved version). ``version=None``
    resolves the snapshot ONCE — the caller's plan then reads exactly
    that version's files however long it runs, which is the
    racing-reader isolation the r11 design lacked."""
    vs = manifest_versions(spark, layout_dir)
    if not vs:
        raise FileNotFoundError(
            f"{layout_dir}: no committed manifest - not a "
            f"write_zorder_layout output")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"{layout_dir}: manifest version {v} is not committed "
            f"(have {vs}) - gc'd, torn, or never written")
    return spark.read.parquet(f"{layout_dir}/{_MANIFEST}/v={v}"), v


def _commit_manifest(spark: SparkSession, layout_dir: str,
                     mdf: DataFrame, expect_version: int) -> int:
    """Commit ``mdf`` as version expect_version+1. Optimistic: if the
    committed head moved past ``expect_version``, fail loudly instead
    of publishing a manifest that silently forgets the interleaved
    writer's files (the lost-update anomaly). A torn v=<N+1> dir from
    a previous crashed commit (no _SUCCESS) is trash and is replaced."""
    head = manifest_versions(spark, layout_dir)
    cur = head[-1] if head else 0
    if cur != expect_version:
        raise RuntimeError(
            f"{layout_dir}: concurrent manifest commit (expected head "
            f"v={expect_version}, found v={cur}) - re-read the "
            f"manifest and retry; layouts are single-writer")
    new = cur + 1
    vdir = f"{layout_dir}/{_MANIFEST}/v={new}"
    fs, hpath = _fs(spark, layout_dir)
    if fs.exists(hpath(vdir)):          # torn earlier attempt
        fs.delete(hpath(vdir), True)
    # a manifest is files-not-rows sized BY CONSTRUCTION (one row per
    # cell; ~1e5 rows for 100 TB at 1 GB files) — one output file
    mdf.coalesce(1).write.mode("errorIfExists").parquet(vdir)
    return new


def _rel_file(col: Column) -> Column:
    # manifest paths are RELATIVE to <layout_dir>/data so the table
    # survives a directory move/rename (and the manifest never bakes
    # in a scheme like file:// vs s3a://). a=/zcell=/part names never
    # contain "/data/", so the LAST occurrence splits correctly even
    # if layout_dir itself contains one.
    return F.substring_index(col, "/data/", -1)


def _manifest_of(df: DataFrame, x: str, y: str,
                 bloom_col: str | None, bloom_bits: int) -> DataFrame:
    """Per-zcell manifest rows of a (subset of a) layout frame read
    from parquet: stats + referenced files (+ optional Bloom). Shared
    by the initial write, the incremental upsert (delta only) and the
    from-scratch verification manifest."""
    withf = df.withColumn("_f", _rel_file(F.input_file_name()))
    stats = withf.groupBy("zcell").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(x).alias("min_x"), F.max(x).alias("max_x"),
        F.min(y).alias("min_y"), F.max(y).alias("max_y"),
        F.array_sort(F.collect_set("_f")).alias("files"))
    if bloom_col is None:
        return stats
    from mr_mpi_blast_spark.operators.profile import \
        _bloom_positions_spark
    pos = F.array(*[F.expr(p) for p in
                    _bloom_positions_spark(bloom_col, bloom_bits)])
    # dedup BEFORE collecting (r11 review): exploding to (zcell, pos)
    # and going through a DISTINCT bounds the pre-collect stream at
    # bloom_bits rows per cell by construction; both aggregates
    # combine map-side.
    blooms = (df.select("zcell", F.explode(pos).alias("p")).distinct()
              .groupBy("zcell")
              .agg(F.array_sort(F.collect_set("p")).alias("bloom_pos")))
    return stats.join(blooms, "zcell")


def _merge_manifests(cur: DataFrame, fresh: DataFrame) -> DataFrame:
    """Manifest merge is a pure aggregation — counts add, envelopes
    widen, file lists and Bloom position sets union — so incremental
    maintenance costs one groupBy over two files-not-rows inputs and
    NEVER re-reads committed data (the mergeable-sketch discipline
    applied to table metadata)."""
    u = cur.unionByName(fresh)
    aggs = [F.sum("n_rows").alias("n_rows"),
            F.min("min_x").alias("min_x"), F.max("max_x").alias("max_x"),
            F.min("min_y").alias("min_y"), F.max("max_y").alias("max_y"),
            F.array_sort(F.flatten(F.collect_list("files")))
            .alias("files")]
    if "bloom_pos" in u.columns:
        aggs.append(F.array_sort(F.array_distinct(
            F.flatten(F.collect_list("bloom_pos")))).alias("bloom_pos"))
    return u.groupBy("zcell").agg(*aggs)


def _read_files(spark: SparkSession, layout_dir: str,
                rel_files: list) -> DataFrame:
    df = spark.read.option("basePath", f"{layout_dir}/data").parquet(
        *[f"{layout_dir}/data/{f}" for f in rel_files])
    return df.drop("a")


def write_zorder_layout(df: DataFrame, x: str, y: str, out_dir: str, *,
                        bits: int = 20, target_files: int = 64,
                        bloom_col: str | None = None,
                        bloom_bits: int = 1 << 17) -> int:
    """Initialize a z-clustered layout from ``df`` and commit manifest
    v=1; returns the committed version. Cell width is sized so roughly
    ``target_files`` cells cover the observed z-domain (one O(1)-row
    max-aggregate — a staging-time job amortized over every later
    pruned read). With ``bloom_col`` set, every manifest version also
    carries per-cell Bloom positions over that column (size
    ``bloom_bits`` at ~10x expected distinct keys per cell — a
    saturated filter prunes nothing; both build and probe read the
    stored value, so they cannot drift).

    The manifest derives from the COMMITTED FILES (read back after
    the write), not from a second evaluation of ``df`` — so even a
    nondeterministic input (sample/rand, a re-read changing source)
    yields a manifest consistent with what was actually written; the
    separate max-aggregate evaluation can only affect cell geometry,
    never visibility (r11 advisory, applied to the base write too).

    At 100 TB this is the OPTIMIZE-ZORDER write: partitionBy clusters
    co-curve rows into the same files so BOTH dimensions get bounded
    per-file ranges; the cell id is pure arithmetic on the z-value —
    no global sort, no single-task window (at scale prepend a
    repartitionByRange on _z to bound open files per task)."""
    spark = df.sparkSession
    existing = manifest_versions(spark, out_dir)
    if existing:
        # refuse BEFORE touching anything (r12 review: overwriting
        # data/a=base first would delete files every committed
        # manifest still references — the table would be bricked by
        # the time the optimistic commit noticed)
        raise FileExistsError(
            f"{out_dir}: already an initialized layout (committed "
            f"manifest v={existing[-1]}); append with "
            f"append_to_zorder_layout, or delete the directory to "
            f"re-initialize")
    zdf = df.withColumn("_z", zvalue(x, y, bits))
    max_z = zdf.agg(F.max("_z")).collect()[0][0]
    if max_z is None:
        # loud and near the cause (r11 review): an empty layout writes
        # only _SUCCESS, and the FIRST reader then dies far away with
        # an opaque 'Unable to infer schema for Parquet'
        raise ValueError(
            "write_zorder_layout: input DataFrame is empty - a layout "
            "of zero rows has no schema to read back; check the "
            "staging input")
    width_bits = max(1, math.ceil(math.log2(max(2, (max_z + 1)
                                                / target_files))))
    adir = f"{out_dir}/data/a=base"
    (zdf.withColumn("zcell", F.expr(f"_z div {1 << width_bits}"))
        .drop("_z")
        .write.mode("overwrite").partitionBy("zcell").parquet(adir))
    # table parameters persisted WITH the layout, through Spark (the
    # CDC-stream fingerprint discipline — the sidecar lives on the
    # same filesystem as the data): appends must bin with the SAME
    # curve and Bloom probes with the SAME bits
    (spark.createDataFrame(
        [(x, y, bits, width_bits, bloom_col, bloom_bits)], _META_SCHEMA)
     .coalesce(1).write.mode("overwrite").json(
         f"{out_dir}/{_LAYOUT_META}"))
    # re-initializing a path (overwrite) must not leave a stale cache
    # entry — the write-once contract is per INITIALIZATION
    _META_CACHE.pop(out_dir, None)
    committed = spark.read.option("basePath", adir).parquet(adir)
    manifest = _manifest_of(committed, x, y, bloom_col, bloom_bits)
    return _commit_manifest(spark, out_dir, manifest, expect_version=0)


def append_to_zorder_layout(df: DataFrame, layout_dir: str,
                            append_id: str | None = None) -> AppendResult:
    """Write ``df`` into the layout through its stored curve
    parameters, as a NEW immutable append directory (base files are
    never rewritten; brand-new cells past the original domain are
    fine). Returns (append_id, touched cells). The rows are NOT
    visible to manifest-driven readers until upsert_zorder_manifest
    commits — which is what makes a torn or duplicated append
    harmless (its files are never referenced) and replay exactly-once
    for the streaming ingest twin.

    The touched set derives from the COMMITTED FILES after the write
    — the input is evaluated exactly once, so a nondeterministic
    source cannot write rows into a cell absent from ``touched``
    (r11 advisory closure). A caller-supplied ``append_id`` makes the
    write idempotent (a replay overwrites its own directory)."""
    import uuid
    spark = df.sparkSession
    meta = layout_meta(spark, layout_dir)
    import re
    aid = append_id if append_id is not None else uuid.uuid4().hex[:12]
    if not re.fullmatch(r"[A-Za-z0-9_.-]+", aid):
        raise ValueError(
            f"append_id must be a plain name ([A-Za-z0-9_.-]+), got "
            f"{aid!r}")
    adir = f"{layout_dir}/data/a={aid}"
    z = zvalue(meta["x"], meta["y"], meta["bits"])
    (df.withColumn("_z", z)
       .withColumn("zcell", F.expr(f"_z div {1 << meta['width_bits']}"))
       .drop("_z")
       .write.mode("overwrite").partitionBy("zcell").parquet(adir))
    fs, hpath = _fs(spark, adir)
    touched = sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(hpath(adir))
        if st.isDirectory() and st.getPath().getName().startswith("zcell="))
    return AppendResult(aid, touched)


def upsert_zorder_manifest(spark: SparkSession, layout_dir: str,
                           append: AppendResult) -> int:
    """Publish an append: merge its per-cell stats (computed from its
    OWN committed files only — orphans from torn earlier attempts are
    never read) into the current manifest and commit the next
    version. Maintenance cost scales with the delta, not the table:
    the merge is one groupBy over two files-not-rows frames
    (_merge_manifests), equal row-for-row to a from-scratch manifest
    (test-pinned). Idempotent: if the head manifest already
    references this append's files, returns the head unchanged (the
    crash-replay arm of the streaming ingest twin)."""
    aid, touched = append
    cur, curv = read_zorder_manifest(spark, layout_dir)
    if not touched:
        return curv
    if append_published(spark, layout_dir, aid, cur):
        return curv
    meta = layout_meta(spark, layout_dir)
    adir = f"{layout_dir}/data/a={aid}"
    delta = spark.read.option("basePath", adir).parquet(adir)
    fresh = _manifest_of(delta, meta["x"], meta["y"],
                         meta["bloom_col"], meta["bloom_bits"])
    return _commit_manifest(spark, layout_dir,
                            _merge_manifests(cur, fresh), curv)


def append_published(spark: SparkSession, layout_dir: str,
                     append_id: str, manifest: DataFrame | None = None
                     ) -> bool:
    """True iff the committed head manifest (or ``manifest``) already
    references files of ``append_id`` — the replay guard: a publisher
    that crashed AFTER its manifest commit must neither re-append
    (overwriting data files a committed manifest points at) nor
    re-publish. One manifest-sized filter."""
    if manifest is None:
        manifest, _ = read_zorder_manifest(spark, layout_dir)
    # EXACT first-path-segment equality, not LIKE (r12 review: '_'
    # and '%' in an id would act as wildcards and could falsely mark
    # an append published — silent data loss through the public id)
    return (manifest
            .withColumn("_seg", F.lit(f"a={append_id}"))
            .filter(F.expr(
                "exists(files, f -> substring_index(f, '/', 1) = _seg)"))
            .limit(1).count() > 0)


def append_committed(spark: SparkSession, layout_dir: str,
                     append_id: str) -> bool:
    """True iff ANY retained manifest version references files of
    ``append_id`` — the guard a REPLAY must use before overwriting
    its own directory. Head-only (append_published) is not enough
    there: a later rewrite (compaction, DELETE, UPDATE, another
    MERGE) can drop the id's files from the head while an older
    RETAINED snapshot still references them, and re-running the
    write would corrupt that snapshot (r12 review finding). One
    manifest-sized filter per retained version; retention is small
    by contract. The replay window IS the retention window: once gc
    retires every version referencing the id, a replay legitimately
    re-executes — the standard table-format idempotence contract
    (size retention to cover the orchestrator's retry horizon)."""
    for v in reversed(manifest_versions(spark, layout_dir)):
        man, _ = read_zorder_manifest(spark, layout_dir, v)
        if append_published(spark, layout_dir, append_id, man):
            return True
    return False


def zorder_manifest(spark: SparkSession, layout_dir: str) -> DataFrame:
    """From-scratch manifest over every COMMITTED append directory —
    the full-scan verification twin of the incremental path (their
    equality is test-pinned). Costs a scan of the whole layout; real
    maintenance uses upsert_zorder_manifest. VALIDITY WINDOW (r12
    review): correct only while every committed append dir is fully
    referenced by the head manifest — i.e. before any compaction, or
    after gc. Between a compaction and its gc, BOTH generations of a
    rewritten cell are committed on disk and this scan double-counts
    them; and after a crash between a committed append and its
    publish it sees the orphan the versioned manifest correctly
    hides. The committed manifest is the table; this is a
    repair/verify tool for the states above."""
    meta = layout_meta(spark, layout_dir)
    fs, hpath = _fs(spark, layout_dir)
    data = f"{layout_dir}/data"
    dirs = [st.getPath().toString() for st in fs.listStatus(hpath(data))
            if st.isDirectory()
            and fs.exists(hpath(f"{st.getPath().toString()}/_SUCCESS"))]
    df = spark.read.option("basePath", data).parquet(*dirs).drop("a")
    return _manifest_of(df, meta["x"], meta["y"],
                        meta["bloom_col"], meta["bloom_bits"])


def fsck_zorder_layout(spark: SparkSession, layout_dir: str,
                       version: int | None = None) -> DataFrame:
    """Verify a committed snapshot: recompute per-cell stats from
    EXACTLY the files the resolved manifest references and diff them
    against the stored rows. Unlike zorder_manifest (whose validity
    window excludes the between-compaction-and-gc state), this is
    correct in EVERY layout state, because it scans the snapshot's
    own file list — the expire-safe verify/maintenance op real
    formats ship. Returns one row per disagreeing cell
    ``(zcell, field, stored, recomputed)`` (values rendered as
    strings; a cell whose files are missing surfaces as a read
    failure, loudly). Empty result == snapshot is internally
    consistent. Cost: one scan of the snapshot's files + a
    manifest-sized join."""
    man, _v = read_zorder_manifest(spark, layout_dir, version)
    meta = layout_meta(spark, layout_dir)
    files = [f for r in man.select("files").collect() for f in r.files]
    fresh = _manifest_of(_read_files(spark, layout_dir, files),
                         meta["x"], meta["y"],
                         meta["bloom_col"], meta["bloom_bits"])
    fields = ["n_rows", "min_x", "max_x", "min_y", "max_y", "files"]
    if meta["bloom_col"]:
        fields.append("bloom_pos")
    a = man.select("zcell", *[F.col(f).alias(f"a_{f}") for f in fields])
    b = fresh.select("zcell",
                     *[F.col(f).alias(f"b_{f}") for f in fields])
    j = a.join(b, "zcell", "full_outer")
    checks = [
        F.when(~F.col(f"a_{f}").eqNullSafe(F.col(f"b_{f}")),
               F.struct(F.lit(f).alias("field"),
                        F.col(f"a_{f}").cast("string").alias("stored"),
                        F.col(f"b_{f}").cast("string")
                        .alias("recomputed")))
        for f in fields]
    return (j.select("zcell", F.explode(
        F.filter(F.array(*checks), lambda x: x.isNotNull()))
        .alias("d"))
        .select("zcell", "d.field", "d.stored", "d.recomputed"))


def _closed_range(name: str, rng):
    """DML scoping takes CLOSED (lo, hi) ranges only: the scope is
    both an envelope filter (None-tolerant) and a row-level BETWEEN
    conjunct (not None-tolerant) — refusing open bounds up front
    keeps the two renderings from silently diverging (r12 review)."""
    if rng is None:
        return None
    lo, hi = rng
    if lo is None or hi is None:
        raise ValueError(
            f"{name} must be a closed (lo, hi) range for DML ops, "
            f"got {rng!r} - drop the bound entirely or close it")
    return rng


def _row_in_scope(r, x_range, y_range) -> bool:
    """Driver-side twin of _ranges_overlap over collected manifest
    rows (closed ranges only — _closed_range validates that)."""
    return ((x_range is None
             or (r.max_x >= x_range[0] and r.min_x <= x_range[1]))
            and (y_range is None
                 or (r.max_y >= y_range[0] and r.min_y <= y_range[1])))


def _ranges_overlap(lo_col: str, hi_col: str, lo, hi):
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(hi_col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(lo_col) <= F.lit(hi))
    return cond


def pruned_read(spark: SparkSession, layout_dir: str,
                manifest: DataFrame | None = None, *,
                version: int | None = None,
                x_range: tuple | None = None,
                y_range: tuple | None = None,
                bloom_point=None) -> tuple:
    """Plan a pruned read: filter the MANIFEST (not the data) to the
    cells whose [min,max] envelopes can intersect the predicate, then
    read exactly the FILES the resolved snapshot references for the
    surviving cells. Returns ``(df, cells_kept, cells_total)``.

    Snapshot isolation: the manifest version is resolved once
    (``version`` pins an older one while retained); files are
    immutable once committed, so a concurrent append/compaction
    cannot tear this read — it will simply not see the later commit.

    The manifest filter runs driver-side via collect(): files-not-rows
    sized BY CONSTRUCTION (one row per cell; a 100 TB table at 1 GB
    files is ~1e5 rows), the quantity any lakehouse planner holds.
    The data itself is never collected.

    Pruning is CONSERVATIVE (envelope overlap / Bloom one-sidedness):
    every row matching the predicate lives in a surviving cell, so
    re-applying the exact predicate on the pruned frame is
    value-identical to the full scan — the caller applies it.

    ``bloom_point`` (int or str) prunes on the manifest's per-cell
    Bloom positions: a cell survives only if all K positions of the
    probed value are set (one-sided — never drops a true member);
    probe bits come from the layout's stored parameters, so they
    cannot disagree with the build."""
    if manifest is None:
        manifest, _ = read_zorder_manifest(spark, layout_dir, version)
    cond = F.lit(True)
    if x_range is not None:
        cond = cond & _ranges_overlap("min_x", "max_x", *x_range)
    if y_range is not None:
        cond = cond & _ranges_overlap("min_y", "max_y", *y_range)
    if bloom_point is not None:
        meta = layout_meta(spark, layout_dir)
        if not meta["bloom_col"]:
            raise ValueError(
                f"{layout_dir}: layout was written without bloom_col; "
                f"bloom_point pruning needs write_zorder_layout("
                f"bloom_col=...)")
        from mr_mpi_blast_spark.operators.profile import \
            _bloom_positions_spark
        # int or str only: the probe must render EXACTLY as the
        # manifest side's concat-cast of the column did (r11 review:
        # repr() of other types need not match Spark's rendering, and
        # unescaped quotes broke expression parsing)
        if isinstance(bloom_point, str):
            lit = "'" + bloom_point.replace("'", "''") + "'"
        elif isinstance(bloom_point, int) and not isinstance(
                bloom_point, bool):
            lit = str(bloom_point)
        else:
            raise TypeError(
                f"bloom_point must be int or str (the types whose "
                f"string rendering is engine-stable), got "
                f"{type(bloom_point).__name__}")
        probe = F.array(*[F.expr(p) for p in _bloom_positions_spark(
            f"CAST({lit} AS STRING)", meta["bloom_bits"])])
        cond = cond & (F.size(F.array_except(probe, F.col("bloom_pos")))
                       == 0)
    # one planning job, survivors-only to the driver (r12 measured at
    # the 100 TB manifest shape, 1e5 cells: collecting every manifest
    # row costs ~0.9 s; this single aggregate — count + collect_list
    # of WHEN(cond)-filtered structs, whose state is bounded by the
    # ANSWER's file list, not the manifest — plans in ~0.3 s warm)
    row = manifest.agg(
        F.count(F.lit(1)).alias("total"),
        F.collect_list(F.when(cond, F.struct("zcell", "files")))
        .alias("kept"),
        F.first("files").alias("any_files")).collect()[0]
    if not row.kept:
        if row.total == 0:
            raise ValueError(f"{layout_dir}: empty manifest")
        probe = _read_files(spark, layout_dir, list(row.any_files[:1]))
        return probe.filter(F.lit(False)), 0, row.total
    files = [f for r in row.kept for f in r.files]
    return _read_files(spark, layout_dir, files), len(row.kept), row.total


def compact_zorder_cells(spark: SparkSession, layout_dir: str,
                         cells: list | None = None,
                         max_files_per_cell: int = 1) -> list:
    """Small-file compaction — the other half of OPTIMIZE: appends
    accumulate one file per (append, cell), and a point read that
    opens a cell pays per FILE. Rewrites each over-threshold cell's
    rows into ONE new file (``cells=None`` considers every cell;
    ``max_files_per_cell`` is the skip threshold) and commits a new
    manifest version whose rewritten cells reference only the new
    files, stats carried VERBATIM (same rows, same envelopes, same
    Bloom — value identity by construction, test-pinned).

    TRANSACTIONAL (r11's documented torn-read race, closed): the old
    files are not touched — a reader on the previous version keeps a
    consistent view until gc_zorder_layout retires it; the new
    version becomes visible atomically with the manifest _SUCCESS.
    File counts come from the manifest (files-not-rows), never from a
    directory listing."""
    import uuid
    cur, curv = read_zorder_manifest(spark, layout_dir)
    sel = cur.select("zcell", "files").collect()
    known = {r.zcell for r in sel}
    if cells is not None:
        for c in cells:
            if c not in known:
                raise FileNotFoundError(f"{layout_dir}: no cell {c}")
        sel = [r for r in sel if r.zcell in set(cells)]
    todo_rows = [r for r in sel if len(r.files) > max_files_per_cell]
    if not todo_rows:
        return []
    todo = sorted(r.zcell for r in todo_rows)
    sub = _read_files(spark, layout_dir,
                      [f for r in todo_rows for f in r.files])
    cid = "c" + uuid.uuid4().hex[:11]
    cdir = f"{layout_dir}/data/a={cid}"
    # the hash repartition on zcell puts each cell's rows in exactly
    # ONE task, so partitionBy emits exactly one file per cell —
    # max_files_per_cell is the SKIP THRESHOLD only, never an output
    # file count (r12 review: a per-cell output split would need a
    # second repartition key; one file per cell IS the compaction)
    (sub.repartition(len(todo), "zcell")
     .write.mode("overwrite").partitionBy("zcell").parquet(cdir))
    fs, hpath = _fs(spark, cdir)
    new_files = []
    for st in fs.listStatus(hpath(cdir)):
        if not st.isDirectory():
            continue
        cname = st.getPath().getName()            # zcell=<c>
        c = int(cname.split("=", 1)[1])
        rels = sorted(f"a={cid}/{cname}/{f.getPath().getName()}"
                      for f in fs.listStatus(st.getPath())
                      if not f.getPath().getName().startswith("_"))
        new_files.append((c, rels))
    nf = spark.createDataFrame(new_files,
                               "zcell long, new_files array<string>")
    merged = (cur.join(F.broadcast(nf), "zcell", "left")
              .withColumn("files", F.coalesce("new_files", "files"))
              .drop("new_files")
              .select(*cur.columns))
    _commit_manifest(spark, layout_dir, merged, curv)
    return todo


def _fresh_manifest_of_dir(spark: SparkSession, layout_dir: str,
                           adir: str, meta: dict) -> DataFrame | None:
    """Manifest rows for one committed data directory, or None when
    the write produced no rows at all (partitionBy emits no zcell=
    dirs; reading the bare _SUCCESS dir would die on schema
    inference). Shared by delete/merge, mirroring the append path."""
    fs, hpath = _fs(spark, adir)
    has_cells = any(
        st.isDirectory() and st.getPath().getName().startswith("zcell=")
        for st in fs.listStatus(hpath(adir)))
    if not has_cells:
        return None
    part = spark.read.option("basePath", adir).parquet(adir)
    return _manifest_of(part, meta["x"], meta["y"],
                        meta["bloom_col"], meta["bloom_bits"])


def delete_from_zorder_layout(spark: SparkSession, layout_dir: str,
                              predicate: str, *,
                              x_range: tuple | None = None,
                              y_range: tuple | None = None) -> dict:
    """Row-level DELETE, copy-on-write: rewrite exactly the cells that
    contain matching rows (without those rows) and commit the next
    manifest version — old files untouched, so a reader pinned to the
    prior snapshot keeps a consistent pre-delete view until gc (the
    DELETE FROM every lakehouse format ships; reference analog: the
    run-restart discipline of re-publishing state rather than editing
    it in place, examples/refseq-all-vs-all/ranger-for-loop-run.sh).

    ``predicate`` is a Spark SQL boolean expression over the data
    columns; rows where it is TRUE are deleted (NULL keeps the row —
    SQL DELETE semantics). ``x_range``/``y_range`` are ADDITIONAL
    conjuncts on the layout's curve columns — they narrow the delete's
    meaning (delete pred AND x BETWEEN ...), which is what lets the
    manifest envelopes prune the candidate scan without any
    correctness assumption on ``predicate``: out-of-scope cells are
    never opened because out-of-scope rows are not deleted.

    Cost at 100 TB: one scan of the cells overlapping the scope (the
    whole table only for an unscoped delete — same as any engine),
    rewrite of only the dirty cells, one manifest commit. Returns
    ``{"version", "cells_rewritten", "cells_dropped", "rows_deleted"}``;
    a delete matching nothing commits nothing (version unchanged)."""
    import uuid
    cur, curv = read_zorder_manifest(spark, layout_dir)
    meta = layout_meta(spark, layout_dir)
    x_range = _closed_range("x_range", x_range)
    y_range = _closed_range("y_range", y_range)
    scope = F.lit(True)
    if x_range is not None:
        scope = scope & _ranges_overlap("min_x", "max_x", *x_range)
    if y_range is not None:
        scope = scope & _ranges_overlap("min_y", "max_y", *y_range)
    cand = cur.filter(scope).select("zcell", "files", "n_rows").collect()
    eff = F.expr(predicate)
    if x_range is not None:
        eff = eff & F.col(meta["x"]).between(*x_range)
    if y_range is not None:
        eff = eff & F.col(meta["y"]).between(*y_range)
    noop = {"version": curv, "cells_rewritten": [], "cells_dropped": [],
            "rows_deleted": 0}
    if not cand:
        return noop
    snap = _read_files(spark, layout_dir,
                       [f for r in cand for f in r.files])
    # cells-not-rows to the driver: only the ids of cells holding at
    # least one TRUE-predicate row (filter() keeps only TRUE, so NULL
    # predicate rows never dirty a cell)
    dirty = sorted(r.zcell for r in
                   snap.filter(eff).select("zcell").distinct().collect())
    if not dirty:
        return noop
    ds = set(dirty)
    dirty_files = [f for r in cand if r.zcell in ds
                   for f in r.files]
    keep = ~F.coalesce(eff, F.lit(False))
    ddir = f"{layout_dir}/data/a=d{uuid.uuid4().hex[:11]}"
    (_read_files(spark, layout_dir, dirty_files)
     .filter(keep)
     .repartition(len(dirty), "zcell")
     .write.mode("overwrite").partitionBy("zcell").parquet(ddir))
    fresh = _fresh_manifest_of_dir(spark, layout_dir, ddir, meta)
    base = cur.filter(~F.col("zcell").isin(dirty))
    if fresh is None and len(dirty) == cur.count():
        # every cell dirtied and no survivors anywhere: committing
        # would publish an EMPTY manifest, a state the read path
        # rightly refuses (pruned_read's loud empty-manifest error).
        # A full wipe is not a row-level delete — refuse before the
        # commit (the delete dir stays an invisible orphan; gc
        # retires it) and leave the table readable.
        raise ValueError(
            f"delete_from_zorder_layout: predicate {predicate!r} "
            f"deletes EVERY row - a full wipe is not a row-level "
            f"delete; drop the layout directory instead")
    merged = base if fresh is None else base.unionByName(fresh)
    newv = _commit_manifest(spark, layout_dir, merged, curv)
    old_n = {r.zcell: r.n_rows for r in cand if r.zcell in ds}
    new_n = ({} if fresh is None else
             {r.zcell: r.n_rows
              for r in fresh.select("zcell", "n_rows").collect()})
    return {"version": newv,
            "cells_rewritten": [c for c in dirty if c in new_n],
            "cells_dropped": [c for c in dirty if c not in new_n],
            "rows_deleted": sum(old_n.values()) - sum(new_n.values())}


def merge_into_zorder_layout(spark: SparkSession, layout_dir: str,
                             updates: DataFrame, key_cols: list,
                             merge_id: str | None = None) -> dict:
    """MERGE INTO, copy-on-write upsert: existing rows whose
    ``key_cols`` match any update row are replaced by the update rows
    (matched cells rewritten without them; all of ``updates`` written
    through the stored curve as a new immutable directory), and BOTH
    effects become visible in ONE manifest commit — a reader never
    sees the delete without the insert. Keys must be non-null (null
    keys never match, SQL join semantics — they would insert
    duplicates silently, so they are refused loudly).

    Cost at 100 TB: one scan of the CANDIDATE cells semi-joined
    against the update keys to find dirty cells (delta-sized right
    side — Catalyst/AQE broadcasts it when small), rewrite of only
    the dirty cells, one curve-binned write of the delta, one
    manifest commit. Candidates are pruned by key envelopes when a
    merge key IS a curve column: a cell whose stored min/max on that
    dimension misses the delta's key range cannot contain a matched
    row, so its files are never opened (one-sided, driver-side over
    the manifest — files-not-rows). That is what keeps a per-batch
    CDC merge (merge_zorder_stream) from scanning the whole table
    when keys are clustered (time-ordered ids on a curve dimension);
    scattered keys degrade gracefully to the full snapshot scan.
    Crash at any point before the commit leaves only unreferenced
    orphan dirs (invisible; gc retires them).

    ``merge_id`` (a plain name WITHOUT dots — suffixes .u/.r name the
    merge's two directories unambiguously) makes the merge REPLAYABLE
    exactly-once within the retention window: a replay before the
    commit overwrites only its own directories and redoes the same
    deterministic work; a replay after the commit is a no-op BEFORE
    touching data, judged against EVERY retained manifest version
    (append_committed — head-only would re-run after a later
    compaction/DML rewrote the merged cells and corrupt the retained
    older snapshot). Once gc retires every version referencing the
    id, a replay re-executes — size retention to cover the retry
    horizon. Without a merge_id (default random id) a post-commit
    replay fails loudly on the optimistic version check instead.
    Note: a NULL key value in a CURVE-column key surfaces as the
    curve guard's loud 'zorder: NULL dimension' error (raised while
    the delta is written) rather than the key-specific ValueError
    below — both refuse before anything commits.

    Returns ``{"version", "cells_rewritten", "cells_dropped",
    "rows_replaced", "rows_written", "cells_scanned", "cells_total"}``
    (replaced = old rows removed by key match; written = delta rows
    landed — a key matching several old rows replaces them all;
    scanned/total = the dirty-cell discovery's candidate set after
    key-envelope pruning vs the whole manifest, 0/0 when the
    discovery never ran); an empty ``updates`` or a replayed
    ``merge_id`` commits nothing."""
    import re
    import uuid
    if not key_cols:
        raise ValueError("merge_into_zorder_layout needs key_cols")
    cur, curv = read_zorder_manifest(spark, layout_dir)
    meta = layout_meta(spark, layout_dir)
    noop = {"version": curv, "cells_rewritten": [],
            "cells_dropped": [], "rows_replaced": 0,
            "rows_written": 0, "cells_scanned": 0,
            "cells_total": 0}
    if merge_id is not None:
        if not re.fullmatch(r"[A-Za-z0-9_-]+", merge_id):
            raise ValueError(
                f"merge_id must be a plain dot-free name "
                f"([A-Za-z0-9_-]+), got {merge_id!r}")
        if append_committed(spark, layout_dir, f"m{merge_id}.u"):
            return noop
    mid = merge_id if merge_id is not None else uuid.uuid4().hex[:11]
    # the delta goes through the same curve-binning write as an append
    # (its own immutable dir, invisible until the commit below); the
    # input is evaluated EXACTLY ONCE — keys, counts and the null-key
    # check below all derive from the COMMITTED delta files, so a
    # nondeterministic source cannot diverge between what was written
    # and what is matched (the r11 append advisory, applied to merge)
    res = append_to_zorder_layout(updates, layout_dir,
                                  append_id=f"m{mid}.u")
    if not res.touched:
        return noop
    udir = f"{layout_dir}/data/a={res.append_id}"
    delta = (spark.read.option("basePath", udir).parquet(udir)
             .drop("a", "zcell"))
    if delta.filter(" OR ".join(f"({k} IS NULL)" for k in key_cols)) \
            .limit(1).count() > 0:
        # refuse BEFORE the commit: the orphan delta dir stays
        # invisible (no manifest references it) and gc retires it
        raise ValueError(
            f"merge_into_zorder_layout: NULL in key column(s) "
            f"{key_cols} - null keys never match and would silently "
            f"insert duplicates")
    fresh_u = _fresh_manifest_of_dir(spark, layout_dir, udir, meta)
    rows = cur.select("zcell", "files", "n_rows",
                      "min_x", "max_x", "min_y", "max_y").collect()
    # key-envelope pruning (one-sided): a merge key that IS a curve
    # column carries per-cell min/max in the manifest — a cell whose
    # envelope on that dimension misses the delta's key range cannot
    # contain a matched row, so its files are never opened below.
    # One delta-sized agg + a driver-side filter of the (files-not-
    # rows) manifest; keys on non-curve columns scan everything.
    curve = {meta["x"]: ("min_x", "max_x"), meta["y"]: ("min_y", "max_y")}
    keyed = [k for k in key_cols if k in curve]
    sel = rows
    if keyed:
        st = delta.agg(*[f for k in keyed
                         for f in (F.min(k).alias(f"lo_{k}"),
                                   F.max(k).alias(f"hi_{k}"))]).collect()[0]

        def _might_match(r):
            return all(r[curve[k][1]] >= st[f"lo_{k}"]
                       and r[curve[k][0]] <= st[f"hi_{k}"]
                       for k in keyed)

        sel = [r for r in rows if _might_match(r)]
    keys = delta.select(*key_cols).distinct()
    if sel:
        snap = _read_files(spark, layout_dir,
                           [f for r in sel for f in r.files])
        dirty = sorted(r.zcell for r in
                       snap.join(keys, key_cols, "leftsemi")
                       .select("zcell").distinct().collect())
    else:
        dirty = []
    base = cur
    fresh_r = None
    rows_replaced = 0
    if dirty:
        ds = set(dirty)
        dirty_files = [f for r in sel if r.zcell in ds
                       for f in r.files]
        rdir = f"{layout_dir}/data/a=m{mid}.r"
        survivors = _read_files(spark, layout_dir, dirty_files).join(
            keys, key_cols, "leftanti")
        (survivors.repartition(len(dirty), "zcell")
         .write.mode("overwrite").partitionBy("zcell").parquet(rdir))
        fresh_r = _fresh_manifest_of_dir(spark, layout_dir, rdir, meta)
        base = cur.filter(~F.col("zcell").isin(dirty))
        old_n = sum(r.n_rows for r in sel if r.zcell in ds)
        new_n = (0 if fresh_r is None else
                 fresh_r.agg(F.sum("n_rows")).collect()[0][0])
        rows_replaced = old_n - new_n
        if fresh_r is not None:
            base = base.unionByName(fresh_r)
    merged = _merge_manifests(base, fresh_u)
    newv = _commit_manifest(spark, layout_dir, merged, curv)
    new_cells = (set() if fresh_r is None else
                 {r.zcell for r in fresh_r.select("zcell").collect()})
    return {"version": newv,
            "cells_rewritten": [c for c in dirty if c in new_cells],
            "cells_dropped": [c for c in dirty if c not in new_cells],
            "rows_replaced": rows_replaced,
            "rows_written": delta.count(),
            "cells_scanned": len(sel), "cells_total": len(rows)}


def update_zorder_layout(spark: SparkSession, layout_dir: str,
                         predicate: str, set_exprs: dict, *,
                         x_range: tuple | None = None,
                         y_range: tuple | None = None,
                         update_id: str | None = None) -> dict:
    """Row-level UPDATE, copy-on-write: rows where ``predicate`` is
    TRUE get each ``set_exprs[col]`` (a Spark SQL expression over the
    PRE-update row — standard SQL UPDATE: every SET expression sees
    the old values) applied, the dirty cells are rewritten without
    them, and the updated rows are re-routed THROUGH THE STORED CURVE
    — so a SET that touches a curve column moves the row to the cell
    its new coordinates belong to, keeping the manifest envelopes
    truthful (the invariant fsck checks). Both effects land in ONE
    manifest commit. NULL predicate keeps the row (SQL semantics);
    a SET producing NULL or a negative value on a curve column fails
    loudly in the curve guard before anything commits.

    ``x_range``/``y_range`` narrow the update's meaning exactly as in
    delete_from_zorder_layout (conjuncts on the curve columns), which
    is what lets the manifest envelopes prune the candidate scan with
    no assumption on ``predicate``. ``update_id`` (dot-free) makes
    the update replayable exactly-once within the retention window,
    the merge_id discipline: post-commit replay no-ops before
    touching data (judged against every retained version —
    append_committed), torn replay overwrites only its own two
    directories.

    Cost at 100 TB: one scan of the scoped candidate cells, rewrite
    of only the dirty cells, one curve-binned write of the updated
    rows, one commit — the delta, not the table. Returns
    ``{"version", "cells_rewritten", "cells_dropped", "rows_updated",
    "cells_scanned", "cells_total"}`` (dropped = dirty cells with no
    surviving row — their updated rows may re-enter through the
    curve; 0/0 scan counts when nothing was scanned); an update
    matching nothing commits nothing."""
    import re
    import uuid
    if not set_exprs:
        raise ValueError("update_zorder_layout needs set_exprs")
    cur, curv = read_zorder_manifest(spark, layout_dir)
    meta = layout_meta(spark, layout_dir)
    noop = {"version": curv, "cells_rewritten": [], "cells_dropped": [],
            "rows_updated": 0, "cells_scanned": 0, "cells_total": 0}
    if update_id is not None:
        if not re.fullmatch(r"[A-Za-z0-9_-]+", update_id):
            raise ValueError(
                f"update_id must be a plain dot-free name "
                f"([A-Za-z0-9_-]+), got {update_id!r}")
        if append_committed(spark, layout_dir, f"u{update_id}.u"):
            return noop
    uid = update_id if update_id is not None else uuid.uuid4().hex[:11]
    x_range = _closed_range("x_range", x_range)
    y_range = _closed_range("y_range", y_range)
    eff = F.expr(predicate)
    if x_range is not None:
        eff = eff & F.col(meta["x"]).between(*x_range)
    if y_range is not None:
        eff = eff & F.col(meta["y"]).between(*y_range)
    all_rows = cur.select("zcell", "files", "min_x", "max_x",
                          "min_y", "max_y").collect()
    cand = [r for r in all_rows if _row_in_scope(r, x_range, y_range)]
    total = len(all_rows)
    if not cand:
        return {**noop, "cells_total": total}
    snap = _read_files(spark, layout_dir,
                       [f for r in cand for f in r.files])
    bad = set(set_exprs) - set(c for c in snap.columns if c != "zcell")
    if bad:
        raise ValueError(
            f"update_zorder_layout: SET on unknown column(s) "
            f"{sorted(bad)} - the layout's columns are fixed")
    dirty = sorted(r.zcell for r in
                   snap.filter(eff).select("zcell").distinct().collect())
    if not dirty:
        return {**noop, "cells_scanned": len(cand),
                "cells_total": total}
    ds = set(dirty)
    dirty_files = [f for r in cand if r.zcell in ds
                   for f in r.files]
    rows = _read_files(spark, layout_dir, dirty_files)
    hit = F.coalesce(eff, F.lit(False))
    # updated rows re-enter through the curve (their cell may change
    # when a SET touches a curve column); evaluated from COMMITTED
    # table files, so the write is deterministic and a replay under
    # the same update_id redoes identical work
    applied = rows.filter(hit).select(*[
        F.expr(set_exprs[c]).alias(c) if c in set_exprs else F.col(c)
        for c in rows.columns if c != "zcell"])
    res_u = append_to_zorder_layout(applied, layout_dir,
                                    append_id=f"u{uid}.u")
    udir = f"{layout_dir}/data/a={res_u.append_id}"
    fresh_u = _fresh_manifest_of_dir(spark, layout_dir, udir, meta)
    rdir = f"{layout_dir}/data/a=u{uid}.r"
    (rows.filter(~hit)
     .repartition(len(dirty), "zcell")
     .write.mode("overwrite").partitionBy("zcell").parquet(rdir))
    fresh_r = _fresh_manifest_of_dir(spark, layout_dir, rdir, meta)
    base = cur.filter(~F.col("zcell").isin(dirty))
    if fresh_r is not None:
        base = base.unionByName(fresh_r)
    merged = base if fresh_u is None else _merge_manifests(base, fresh_u)
    newv = _commit_manifest(spark, layout_dir, merged, curv)
    survived = (set() if fresh_r is None else
                {r.zcell for r in fresh_r.select("zcell").collect()})
    n_upd = (0 if fresh_u is None else
             fresh_u.agg(F.sum("n_rows")).collect()[0][0])
    return {"version": newv,
            "cells_rewritten": [c for c in dirty if c in survived],
            "cells_dropped": [c for c in dirty if c not in survived],
            "rows_updated": n_upd,
            "cells_scanned": len(cand), "cells_total": total}


def layout_changes(spark: SparkSession, layout_dir: str,
                   from_version: int, to_version: int) -> DataFrame:
    """Row-level change feed between two committed snapshots — the
    incremental-consumption primitive (Delta CDF / Iceberg
    incremental read analog): a downstream consumer at 100 TB reads
    WHAT CHANGED between versions, never the table. Computed from the
    manifest file diff: only files referenced by exactly one of the
    two versions are opened, and the multiset difference (exceptAll,
    both directions) cancels rows that were merely REWRITTEN — a
    dirty-cell survivor or a compaction contributes nothing, so a
    pure compaction between the versions yields an EMPTY feed.

    Returns ``change_type`` ('insert' | 'delete') + the data columns:
    an append is all-insert, a DELETE all-delete, an UPDATE/MERGE the
    delete of the old row plus the insert of the new one (unpaired,
    the standard CDF shape). Versions must both still be retained
    (read_zorder_manifest fails loudly on a gc'd version); cost is
    the changed files plus one delta-sized shuffle for the multiset
    difference, independent of table size."""
    if from_version >= to_version:
        raise ValueError(
            f"layout_changes needs from_version < to_version, got "
            f"{from_version} >= {to_version}")
    m_from, _ = read_zorder_manifest(spark, layout_dir, from_version)
    m_to, _ = read_zorder_manifest(spark, layout_dir, to_version)
    f_from = {f for r in m_from.select("files").collect()
              for f in r.files}
    f_to = {f for r in m_to.select("files").collect() for f in r.files}
    added, removed = sorted(f_to - f_from), sorted(f_from - f_to)

    def _rows(files):
        if not files:
            return None
        return _read_files(spark, layout_dir, files).drop("zcell")

    a, r = _rows(added), _rows(removed)
    if a is None and r is None:
        # identical file sets: empty feed with the table's schema
        any_files = sorted(f_to) or sorted(f_from)
        if not any_files:
            raise ValueError("layout_changes: both versions are empty")
        base = _read_files(spark, layout_dir, any_files[:1]) \
            .drop("zcell").limit(0)
        a = base
        r = base
    ins = (a.exceptAll(r) if a is not None and r is not None
           else a) if a is not None else None
    del_ = (r.exceptAll(a) if a is not None and r is not None
            else r) if r is not None else None
    out = []
    if del_ is not None:
        out.append(del_.select(F.lit("delete").alias("change_type"),
                               "*"))
    if ins is not None:
        out.append(ins.select(F.lit("insert").alias("change_type"),
                              "*"))
    feed = out[0]
    for o in out[1:]:
        feed = feed.unionByName(o)
    return feed


def zorder_table_stats(spark: SparkSession, layout_dir: str,
                       version: int | None = None) -> DataFrame:
    """Metadata-only table statistics: COUNT(*), MIN/MAX of both curve
    columns, cell and file counts — answered ENTIRELY from the
    committed manifest, zero data files opened (the count-pushdown /
    metadata-table answer lakehouse formats give; correctness rests on
    the manifest invariants every maintenance op preserves and fsck
    verifies). One manifest-sized aggregate; at 100 TB that is ~1e5
    rows regardless of table size. Column names carry the layout's
    stored dimension names so callers need not know them."""
    man, _v = read_zorder_manifest(spark, layout_dir, version)
    meta = layout_meta(spark, layout_dir)
    return man.agg(
        F.sum("n_rows").alias("n_rows"),
        F.min("min_x").alias(f"min_{meta['x']}"),
        F.max("max_x").alias(f"max_{meta['x']}"),
        F.min("min_y").alias(f"min_{meta['y']}"),
        F.max("max_y").alias(f"max_{meta['y']}"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.size("files")).alias("n_files"))


def gc_zorder_layout(spark: SparkSession, layout_dir: str,
                     keep_versions: int = 2) -> dict:
    """Retire unreachable state: delete data files referenced by NO
    retained manifest version (compacted-away files, orphans of torn
    or never-published appends) and manifest versions older than the
    newest ``keep_versions``. Returns what was removed. Retention IS
    the reader contract: a reader pinned to a retained version stays
    consistent; run gc only when no reader holds an older pin and no
    append is in flight (the maintenance-window contract every
    lakehouse format's expire-snapshots has). All listing/deleting
    goes through the Hadoop FileSystem API — metadata-sized (one
    status call per directory, never a data read)."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    vs = manifest_versions(spark, layout_dir)
    if not vs:
        raise FileNotFoundError(f"{layout_dir}: no committed manifest")
    keep = vs[-keep_versions:]
    referenced = set()
    for v in keep:
        mdf, _ = read_zorder_manifest(spark, layout_dir, v)
        for r in mdf.select("files").collect():
            referenced.update(r.files)
    fs, hpath = _fs(spark, layout_dir)
    removed_files, removed_dirs = [], []
    for ast in fs.listStatus(hpath(f"{layout_dir}/data")):
        if not ast.isDirectory():
            continue
        aname = ast.getPath().getName()
        kept_any = False
        for cst in fs.listStatus(ast.getPath()):
            if not cst.isDirectory():
                continue
            cname = cst.getPath().getName()
            live = []
            for fst in fs.listStatus(cst.getPath()):
                rel = f"{aname}/{cname}/{fst.getPath().getName()}"
                if rel in referenced:
                    live.append(rel)
                else:
                    fs.delete(fst.getPath(), False)
                    removed_files.append(rel)
            if live:
                kept_any = True
            else:
                fs.delete(cst.getPath(), True)
        if not kept_any:
            fs.delete(ast.getPath(), True)
            removed_dirs.append(aname)
    dropped_vs = [v for v in vs if v not in keep]
    for v in dropped_vs:
        fs.delete(hpath(f"{layout_dir}/{_MANIFEST}/v={v}"), True)
    return {"files": sorted(removed_files),
            "append_dirs": sorted(removed_dirs),
            "manifest_versions": dropped_vs}
