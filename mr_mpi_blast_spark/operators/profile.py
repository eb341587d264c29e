"""Table profiling (beyond-reference training-data surface).

The statistics pass every large-scale ingest runs before anything
else: per column — row count, NULL count, exact distinct count, min
and max. At 100 TB this is the report that decides partition keys,
dedup keys, and skew treatment; it is also the cheap invariant check
between pipeline stages (a profile diff catches a silently dropped
column or an exploded join long before a value-level audit would).

100 TB shape: ONE corpus scan. All non-distinct statistics are
map-side-combinable aggregates; the exact distinct counts make Spark
plan an Expand (one duplicated stream per distinct column) feeding a
two-level hash aggregate — the standard exact multi-distinct shape,
linear in columns x rows with partial aggregation before the
exchange. When estimates suffice (the usual case at 100 TB), pass
``exact=False`` to swap in approx_count_distinct (HyperLogLog++,
fixed-size sketches that merge map-side — no Expand at all); the
exact form is the one the DuckDB oracle can replay, so it is the
registered/verified variant.

min/max are computed on the NATIVE type (so numeric ordering, not
lexicographic) and only then rendered to strings for the uniform
report schema. The registered demo restricts itself to columns whose
string rendering is engine-exact (integers, strings, dates);
doubles/timestamps profile fine but their text forms are
engine-specific — keep them numeric in a homogeneous report or
quantize first (the micro-unit discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_profile(df: DataFrame, cols: list[str] | None = None,
                  exact: bool = True) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val) — min/max rendered as strings,
    NULL-only columns render NULL. Columns report in sorted name
    order. ``exact=False`` switches n_distinct to HyperLogLog++
    estimates (the 100 TB default; not oracle-replayable)."""
    cols = sorted(cols if cols is not None else df.columns)
    if not cols:
        raise ValueError("table_profile: no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"table_profile: unknown columns {missing}")
    nd = (F.count_distinct if exact
          else lambda c: F.approx_count_distinct(c))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn{i}"),
            nd(F.col(c)).alias(f"_nd{i}"),
            F.min(c).cast("string").alias(f"_mn{i}"),
            F.max(c).cast("string").alias(f"_mx{i}"),
        ]
    row = df.agg(*aggs)
    # reshape the single stats row to long form with stack() — a
    # plan-sized pivot, no second pass over the data
    parts = ", ".join(
        f"'{c}', _nn{i}, _nd{i}, _mn{i}, _mx{i}" for i, c in enumerate(cols))
    return row.select(
        "n_rows",
        F.expr(f"stack({len(cols)}, {parts}) AS "
               "(col_name, n_nulls, n_distinct, min_val, max_val)"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_val", "max_val")


def trimmed_mean_by_group(df, group_col: str, cents_col: str,
                          trim_denom: int = 10):
    """Exact trimmed mean per group over integer cents — the robust
    location statistic (drop the floor(n/denom) smallest and largest
    observations, average the rest) computed WITHOUT per-row ranking.

    The scale trick: rank-based trimming needs a per-group total
    order (a corpus-sized single-task window for a hot group); this
    computes the identical result from the VALUE HISTOGRAM —
    (group, cents) counts from one map-side-combined aggregate, then
    a per-group cumulative window whose state is bounded by the
    VALUE DOMAIN's cardinality, not the corpus (ties all carry the
    same value, so trimming k by rank equals trimming k by histogram
    multiplicity). Each histogram row contributes
    clamp-overlap(k, cumulative range) x value to the trimmed-away
    sums — all exact int64 arithmetic, partitioning-independent.

    Output: (group, n, k_trim, trimmed_sum, kept) — callers derive
    the mean; it is exact rational trimmed_sum/kept. kept CAN be 0
    (only at trim_denom == 2 with even n, where the trim consumes
    everything): the statistic is undefined there and callers must
    null-guard the division — emitted as data, not raised, because
    it is a per-group condition, not a parameter error.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    if trim_denom < 2:
        raise ValueError(f"trim_denom must be >= 2, got {trim_denom}")
    # NULL observations are EXCLUDED (the house NULL-domain policy,
    # as mix_weights): a NULL has no rank position, and letting it
    # into the histogram would inflate n/k while its NULL products
    # silently vanish from the trim sums — wrong in both directions
    h = (df.filter(F.col(cents_col).isNotNull())
         .groupBy(group_col, cents_col)
         .agg(F.count(F.lit(1)).alias("cnt"),
              F.sum(cents_col).alias("vsum")))
    w = (Window.partitionBy(group_col).orderBy(cents_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy(group_col)
    h = (h.withColumn("cum", F.sum("cnt").over(w))
         .withColumn("n", F.sum("cnt").over(tot))
         .withColumn("total", F.sum("vsum").over(tot)))
    k = F.expr(f"n div {trim_denom}")
    lo_take = F.greatest(F.lit(0), F.least(
        F.col("cnt"), k - (F.col("cum") - F.col("cnt"))))
    hi_take = F.greatest(F.lit(0), F.least(
        F.col("cnt"), k - (F.col("n") - F.col("cum"))))
    return (h.groupBy(group_col)
            .agg(F.first("n").alias("n"),
                 F.first(k).alias("k_trim"),
                 (F.first("total")
                  - F.sum(lo_take * F.col(cents_col))
                  - F.sum(hi_take * F.col(cents_col)))
                 .cast("long").alias("trimmed_sum"),
                 (F.first("n") - 2 * F.first(k)).cast("long")
                 .alias("kept")))


CMS_DEPTH, CMS_WIDTH = 4, 256


def cms_hash_spark(col: str, row: int, width: int = CMS_WIDTH) -> str:
    """Row-``row``'s CMS bucket for a string column — DELEGATES to
    the house md5-prefix bucket (operators/search.py dsir_bucket_*,
    whose cross-engine %/pmod agreement is test-pinned) with the row
    index as salt, so the d hash functions are independent and there
    is exactly ONE rendering of the hash contract in the repo."""
    from mr_mpi_blast_spark.operators.search import dsir_bucket_spark
    return dsir_bucket_spark(f"concat('{row}:', {col})", width)


def cms_hash_duckdb(col: str, row: int, width: int = CMS_WIDTH) -> str:
    from mr_mpi_blast_spark.operators.search import dsir_bucket_duckdb
    return dsir_bucket_duckdb(f"('{row}:' || {col})", width)


def cms_sketch(items, term_col: str = "term", depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH):
    """Count-min sketch over a term stream: a (row, bucket, counter)
    table of depth x width cells — the MERGEABLE bounded-state
    frequency summary (Cormode & Muthukrishnan 2005). Build cost is
    one map-side-combined aggregate over the depth-times-exploded
    stream; the sketch is depth*width cells REGARDLESS of corpus
    size, and two corpora's sketches merge by cell-wise addition —
    the property that lets 1000 executors summarize 100 TB into 4 KB
    each and reduce. Estimates are one-sided: est >= true always,
    est <= true + eps*N with prob 1-delta (eps = e/width,
    delta = exp(-depth)).
    """
    from pyspark.sql import functions as F
    # one scan: each item explodes to its d (r, bucket) cells inline
    # (a union of d projections would re-scan — and re-derive — the
    # term stream d times; Spark does not CSE across union branches)
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 F.expr(cms_hash_spark(term_col, r)).alias("bucket"))
        for r in range(depth)])
    return (items.select(F.explode(cells).alias("cell"))
            .groupBy(F.col("cell.r").alias("r"),
                     F.col("cell.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("counter")))


def cms_estimate(sketch, probes, term_col: str = "term",
                 depth: int = CMS_DEPTH):
    """Point-estimate each probe term against the sketch: min over
    the d rows of that row's cell, with an EMPTY cell counting as 0
    (left join + coalesce — an inner join would silently drop a
    never-seen probe, or worse min() over only its non-empty cells
    and over-estimate). Probe-sized joins only; every probe term
    comes back exactly once."""
    from pyspark.sql import functions as F
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 F.expr(cms_hash_spark(term_col, r)).alias("bucket"))
        for r in range(depth)])
    keyed = probes.select(term_col, F.explode(cells).alias("cell")) \
        .select(term_col, F.col("cell.r").alias("r"),
                F.col("cell.bucket").alias("bucket"))
    return (keyed.join(sketch, ["r", "bucket"], "left")
            .groupBy(term_col)
            .agg(F.min(F.coalesce("counter", F.lit(0).cast("long")))
                 .alias("est_n")))
