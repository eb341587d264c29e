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

from pyspark.sql import Column, DataFrame
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
