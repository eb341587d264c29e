"""Z-order (Morton) layout: the multi-dimensional data-clustering
technique behind OPTIMIZE ZORDER BY in lakehouse table formats.

A 100 TB fact table sorted on ONE key gives perfect min/max file
pruning on that key and none on any other; interleaving the bits of
two keys gives bounded per-file ranges on BOTH, so a range predicate
on either dimension skips most files. The z-value is pure integer
arithmetic (shift = div/mod by powers of two), identical in any
engine — the DuckDB oracle replays the same generated expression.

The curve, not the write, is the operator here: callers lay data out
with df.repartitionByRange/sortWithinPartitions on the z-value (or
feed it to a bucketed writer); the registered query emits the
per-file min/max statistics a format's manifest would carry, which is
also exactly the evidence that the layout prunes.
"""

from __future__ import annotations

import math

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
    terms = []
    for i in range(bits):
        terms.append(f"(({x} {div_op} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + "\n + ".join(terms) + ")"


def zvalue(x: str, y: str, bits: int = 20, *,
           checked: bool = True) -> Column:
    """Spark column: z-interleave of two non-negative integer columns.

    ``checked=True`` (default, r10 advisory closure) wraps the
    interleave in a guard that raises executor-side on a negative
    input instead of emitting the silently-wrong curve value
    ``zorder_sql`` documents; the cost is one codegen'd CASE per row.
    Pass ``checked=False`` only where the domain is proven
    non-negative upstream (e.g. synthetic keys)."""
    z = zorder_sql(x, y, bits, "div")
    if not checked:
        return F.expr(z).cast("long")
    # NULL arm first (r11 advisory): `x < 0 OR y < 0` is NULL (not
    # true) when a dimension is NULL, so without it a NULL input
    # would fall to the ELSE branch and yield a silently-NULL z that
    # downstream ntile bins NULLS-FIRST instead of failing the stated
    # non-negative-integer precondition loudly.
    return F.expr(
        f"CASE WHEN {x} IS NULL OR {y} IS NULL THEN "
        f"raise_error('zorder: NULL dimension; the curve is defined "
        f"only on non-negative integers - filter or impute NULLs "
        f"first') "
        f"WHEN {x} < 0 OR {y} < 0 THEN "
        f"raise_error(concat('zorder: negative input (', {x}, ', ', "
        f"{y}, '); the interleave is undefined on negatives - "
        f"shift or zigzag-encode the domain first')) "
        f"ELSE {z} END").cast("long")


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
# Manifest-driven file skipping (r11): the payoff step of the z-order
# family. zorder_file_stats EMITS the per-file statistics; these
# operators WRITE the clustered layout, read its manifest back, and
# plan a pruned read that touches only the files a range predicate
# can possibly hit — the reference's DB-partition selection
# (mrblast.cpp:105-117, the dblist as the scan scope) generalized to
# min/max (and optional Bloom) pruning, and the OPTIMIZE-ZORDER
# payoff the lakehouse formats sell.
# ---------------------------------------------------------------------------


def write_zorder_layout(df: DataFrame, x: str, y: str, out_dir: str, *,
                        bits: int = 20,
                        target_files: int = 64) -> None:
    """Write ``df`` as a z-clustered parquet layout: one directory
    partition per fixed-width z-range cell (``zcell=<id>``), cell
    width sized so roughly ``target_files`` cells cover the observed
    z-domain (one O(1)-row max-aggregate decides the width — a
    staging-time job, amortized over every later pruned read).

    At 100 TB this is the OPTIMIZE-ZORDER write: the partitionBy
    clusters co-curve rows into the same files, so BOTH dimensions
    get bounded per-file ranges. The cell id is pure arithmetic on
    the z-value — no global sort, no single-task window — and the
    write is one shuffle-free scan (each task appends to the cells
    its rows land in; at scale prepend a repartitionByRange on z to
    bound open-file counts per task).
    """
    z = zvalue(x, y, bits)
    zdf = df.withColumn("_z", z)
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
    (zdf.withColumn("zcell", F.expr(f"_z div {1 << width_bits}"))
        .drop("_z")
        .write.mode("overwrite").partitionBy("zcell").parquet(out_dir))
    # curve parameters persisted WITH the layout (meta after _SUCCESS,
    # the stage_volumes discipline): an append must bin new rows with
    # the SAME (x, y, bits, width) or its cells would not line up
    import json
    import os
    with open(os.path.join(out_dir, _LAYOUT_META), "w") as fh:
        json.dump({"x": x, "y": y, "bits": bits,
                   "width_bits": width_bits}, fh)


_LAYOUT_META = "_layout_meta.json"


def append_to_zorder_layout(df: DataFrame, layout_dir: str) -> list[int]:
    """Append rows to an EXISTING z-layout using its stored curve
    parameters (the lakehouse append path: new data lands in the
    cells the curve assigns it, including brand-new cells past the
    original domain — no rewrite of existing files). Returns the
    TOUCHED cell ids — cells-not-rows sized, exactly the scope an
    incremental manifest upsert needs (upsert_zorder_manifest). One
    shuffle-free scan of the delta; the base layout is never read."""
    import json
    import os
    meta_p = os.path.join(layout_dir, _LAYOUT_META)
    if not os.path.exists(meta_p):
        raise FileNotFoundError(
            f"{layout_dir}: no {_LAYOUT_META} - not a "
            f"write_zorder_layout output (or a pre-r11 layout; "
            f"rewrite it once to stamp the curve parameters)")
    with open(meta_p) as fh:
        meta = json.load(fh)
    z = zvalue(meta["x"], meta["y"], meta["bits"])
    zdf = (df.withColumn("_z", z)
           .withColumn("zcell",
                       F.expr(f"_z div {1 << meta['width_bits']}"))
           .drop("_z"))
    touched = sorted(r.zcell for r in
                     zdf.select("zcell").distinct().collect())
    if not touched:
        return []
    zdf.write.mode("append").partitionBy("zcell").parquet(layout_dir)
    return touched


def upsert_zorder_manifest(spark: SparkSession, layout_dir: str,
                           manifest: DataFrame, touched: list[int],
                           x: str, y: str,
                           bloom_col: str | None = None,
                           bloom_bits: int = 1 << 17) -> DataFrame:
    """Incremental manifest maintenance after append_to_zorder_layout:
    recompute stats for the TOUCHED cells only (reads just those cell
    directories) and splice them over the old manifest's rows — the
    rest of the manifest is reused verbatim, so maintenance cost
    scales with the delta, not the table. Result is row-for-row equal
    to a from-scratch zorder_manifest (pinned by test)."""
    if not touched:
        return manifest
    paths = [f"{layout_dir}/zcell={c}" for c in touched]
    sub = spark.read.option("basePath", layout_dir).parquet(*paths)
    fresh = _manifest_of(sub, x, y, bloom_col, bloom_bits)
    kept = manifest.filter(~F.col("zcell").isin(touched))
    return kept.unionByName(fresh)


def zorder_manifest(spark: SparkSession, layout_dir: str,
                    x: str, y: str,
                    bloom_col: str | None = None,
                    bloom_bits: int = 1 << 17) -> DataFrame:
    """The manifest of a ``write_zorder_layout`` output: one row per
    zcell with row count and min/max on BOTH clustered dimensions —
    exactly the statistics a format's file manifest carries. With
    ``bloom_col`` set, each cell additionally carries the set-bit
    positions of a Bloom filter over that column (bounded at
    ``bloom_bits`` entries per cell BY CONSTRUCTION — the default
    128 Ki-position filter is ~0.5 MB worst case and stays sparse up
    to ~13k distinct keys per cell at a 30% fill; size it at ~10x the
    expected distinct keys per cell, because a saturated filter
    prunes nothing — observed: 8192 bits over 6k-key cells kept 18/24
    cells, 2^17 bits keeps 1-2), enabling point-lookup pruning on a
    column the curve does not cluster. Readers must probe with the
    SAME ``bloom_bits`` (pruned_read's default matches).

    One aggregate over one scan of the layout; at scale the manifest
    is a byproduct of the layout write, and its size is
    files-not-rows — the quantity a driver may hold.
    """
    return _manifest_of(spark.read.parquet(layout_dir), x, y,
                        bloom_col, bloom_bits)


def _manifest_of(df: DataFrame, x: str, y: str,
                 bloom_col: str | None, bloom_bits: int) -> DataFrame:
    """Per-zcell manifest rows of a (subset of a) layout frame — the
    shared aggregate of zorder_manifest (whole layout) and
    upsert_zorder_manifest (touched cells only)."""
    stats = df.groupBy("zcell").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(x).alias("min_x"), F.max(x).alias("max_x"),
        F.min(y).alias("min_y"), F.max(y).alias("max_y"))
    if bloom_col is None:
        return stats
    from mr_mpi_blast_spark.operators.profile import \
        _bloom_positions_spark
    pos = F.array(*[F.expr(p) for p in
                    _bloom_positions_spark(bloom_col, bloom_bits)])
    # dedup BEFORE collecting (r11 review): a collect_list of per-row
    # position arrays would buffer 3*rows entries per cell before any
    # dedup — unbounded aggregation state on a big cell. Exploding to
    # (zcell, pos) and going through a DISTINCT makes the pre-collect
    # stream at most bloom_bits rows per cell by construction, and
    # both aggregates combine map-side.
    blooms = (df.select("zcell", F.explode(pos).alias("p")).distinct()
              .groupBy("zcell")
              .agg(F.array_sort(F.collect_set("p")).alias("bloom_pos")))
    return stats.join(blooms, "zcell")


def _ranges_overlap(lo_col: str, hi_col: str, lo, hi):
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(hi_col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(lo_col) <= F.lit(hi))
    return cond


def pruned_read(spark: SparkSession, layout_dir: str,
                manifest: DataFrame, *,
                x_range: tuple | None = None,
                y_range: tuple | None = None,
                bloom_point=None,
                bloom_bits: int = 1 << 17) -> tuple[DataFrame, int, int]:
    """Plan a pruned read of a z-layout: filter the MANIFEST (not the
    data) to the cells whose [min,max] envelopes can intersect the
    predicate, then read only the surviving ``zcell=`` directories.
    Returns ``(df, files_kept, files_total)`` — the skip counts are
    the operator's own evidence, reported out-of-band rather than as
    a fragile DataFrame attribute.

    The manifest filter runs driver-side via collect(): the manifest
    is files-not-rows sized BY CONSTRUCTION (one row per cell; a
    100 TB table at 1 GB files is ~1e5 rows — kilobytes of ids), the
    same quantity any lakehouse reader's planner holds. The data
    itself is never collected.

    Pruning is CONSERVATIVE (envelope overlap / Bloom one-sidedness):
    every row matching the predicate lives in a surviving cell, so
    re-applying the exact predicate on the pruned frame is
    value-identical to the full scan — the caller applies it (this
    function plans the scan; it does not guess the residual).

    ``bloom_point=(value_sql_literal,)`` prunes on the manifest's
    ``bloom_pos`` arrays: a cell survives only if all K positions of
    the probed value are set — a non-member cell survives only on a
    K-fold collision (one-sided, never drops a true member).
    """
    cond = F.lit(True)
    if x_range is not None:
        cond = cond & _ranges_overlap("min_x", "max_x", *x_range)
    if y_range is not None:
        cond = cond & _ranges_overlap("min_y", "max_y", *y_range)
    if bloom_point is not None:
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
            f"CAST({lit} AS STRING)", bloom_bits)])
        cond = cond & (F.size(F.array_except(probe, F.col("bloom_pos")))
                       == 0)
    rows = manifest.select("zcell", cond.alias("keep")).collect()
    total = len(rows)
    kept = [r.zcell for r in rows if r.keep]
    if not kept:
        return (spark.read.parquet(layout_dir).filter(F.lit(False)),
                0, total)
    paths = [f"{layout_dir}/zcell={c}" for c in kept]
    df = spark.read.option("basePath", layout_dir).parquet(*paths)
    return df, len(kept), total


def compact_zorder_cells(spark: SparkSession, layout_dir: str,
                         cells: list[int],
                         max_files_per_cell: int = 1) -> list[int]:
    """Small-file compaction — the other half of OPTIMIZE: appends
    accumulate one file per (append, cell), and a point read that
    opens a cell pays per FILE, not per row. Rewrites each listed
    cell's rows into ONE file via a dynamic partition overwrite (the
    hash repartition on zcell puts each cell's rows in exactly one
    task; ``max_files_per_cell`` is the SKIP threshold — cells at or
    under it are left alone). Only the written cells are replaced;
    the rest of the layout is untouched. Returns the cells actually
    rewritten (the file-count listing is metadata-sized, so
    already-compact cells cost nothing).

    Values are untouched BY CONSTRUCTION (same rows, same cells — the
    manifest stays valid verbatim); the test pins value identity and
    the file-count drop. NOT transactional: a reader racing the
    overwrite of a cell can see it torn — the parquet-dir analog of
    why real lakehouse formats put a snapshot log in front of exactly
    this rewrite; run it in the maintenance window the formats also
    need for GC."""
    import os
    todo = []
    for c in cells:
        d = os.path.join(layout_dir, f"zcell={c}")
        if not os.path.isdir(d):
            raise FileNotFoundError(f"{layout_dir}: no cell {c}")
        n = sum(1 for f in os.listdir(d)
                if f.endswith(".parquet") or f.startswith("part-"))
        if n > max_files_per_cell:
            todo.append(c)
    if not todo:
        return []
    paths = [f"{layout_dir}/zcell={c}" for c in todo]
    sub = spark.read.option("basePath", layout_dir).parquet(*paths)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                   "dynamic")
    try:
        (sub.repartition(max_files_per_cell * len(todo), "zcell")
         .write.mode("overwrite").partitionBy("zcell")
         .parquet(layout_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       prev)
    return todo
