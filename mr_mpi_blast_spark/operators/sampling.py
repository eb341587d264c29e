"""Deterministic sampling / dataset splitting (beyond-reference).

A training-data pipeline must split and sample REPRODUCIBLY: the same
document lands in the same split on every run, on any cluster size,
regardless of partitioning — so the bucket is a pure function of the
row's id (md5, which Spark and DuckDB implement bit-identically; cf.
functions/hashing.py), never rand()/sample() whose results depend on
seed plumbing and partition layout. All column expressions — no
shuffle at all: split/sample are narrow maps a scan fuses into.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 4-decimal-digit bucket space: fractions resolve to 0.01%
_BUCKETS = 10_000


def id_bucket(id_col: Column) -> Column:
    """Stable bucket in [0, 10000) from the id's md5 (first 8 hex
    chars -> int). Uniform over ids; identical in any engine with md5
    + base conversion."""
    return (F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
            .cast("long") % _BUCKETS)


def id_bucket_sql(expr: str) -> str:
    """DuckDB rendering of id_bucket (same arithmetic)."""
    return (f"('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT"
            f" % {_BUCKETS}")


def deterministic_split(df: DataFrame, id_col: str,
                        splits: dict[str, float] | None = None,
                        out_col: str = "split") -> DataFrame:
    """Assign each row to a named split by id bucket. ``splits`` maps
    name -> fraction (must sum to <= 1; remainder is unassigned and
    labeled '_rest'). Default 80/10/10 train/val/test."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    if sum(splits.values()) > 1.0 + 1e-9:
        raise ValueError("split fractions sum to > 1")
    b = id_bucket(F.col(id_col))
    expr, lo = None, 0
    for name, frac in splits.items():
        hi = lo + int(round(frac * _BUCKETS))
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn(out_col, expr.otherwise(F.lit("_rest")))


def deterministic_sample(df: DataFrame, id_col: str,
                         fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id bucket — stable across
    runs and cluster layouts (a row is in the sample or not, forever).
    Samples at different fractions nest: sample(0.01) ⊆ sample(0.1)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(id_bucket(F.col(id_col))
                     < F.lit(int(round(fraction * _BUCKETS))))


# content-addressed (stratum, bucket) count cache — the same contract
# as blocks._HIST_CACHE: the caller's key must pin the input rows and
# the stratum/id derivation (see blocks.ordered_prefix_sum)
_STRATA_CACHE: dict = {}


def stratified_sample_exact(df: DataFrame, stratum_col: str, id_col: str,
                            frac: float, n_buckets: int = 256,
                            cache_key: str | None = None) -> DataFrame:
    """Exact-count stratified sample: the ceil(frac * |stratum|) rows
    with the smallest md5(id) per stratum — deterministic, exact per-
    stratum counts, and NO per-stratum global window.

    A naive row_number() OVER (PARTITION BY stratum ORDER BY md5) puts
    each stratum's entire row set through ONE task — fatal when a
    stratum is corpus-sized. Hierarchical form instead (the same shape
    as blocks.ordered_prefix_sum): bucket rows by an md5 PREFIX (hex
    order == numeric order, so bucket order is consistent with the full
    md5 sort), count per (stratum, bucket) — a parallel metadata-sized
    aggregate — prefix-scan the counts on the driver (O(strata x
    buckets) rows), then rank = bucket offset + row_number within the
    (stratum, bucket) window only. Every window partition is
    ~|stratum|/n_buckets rows regardless of corpus size.
    """
    h = F.md5(F.col(id_col).cast("string"))
    # 4 hex chars = 65536 values, split into n_buckets ranges
    width = max(1, 65536 // n_buckets)
    q = (df.withColumn("_h", h)
         .withColumn("_hb", (F.conv(F.substring("_h", 1, 4), 16, 10)
                             .cast("long") / width).cast("long")))
    ck = (cache_key, n_buckets) if cache_key is not None else None
    if ck is not None and ck in _STRATA_CACHE:
        offsets, totals = _STRATA_CACHE[ck]
        if not offsets:
            return df.limit(0)
    else:
        counts = (q.groupBy(stratum_col, "_hb")
                  .agg(F.count(F.lit(1)).alias("_c")))
        rows = counts.collect()  # O(strata x buckets): plan-sized metadata
        per_stratum: dict = {}
        for r in rows:
            per_stratum.setdefault(r[0], []).append((r[1], r[2]))
        offsets, totals = [], {}
        for s, bs in per_stratum.items():
            acc = 0
            for b, c in sorted(bs):
                offsets.append((s, b, acc))
                acc += c
            totals[s] = acc
        if ck is not None:
            _STRATA_CACHE[ck] = (offsets, totals)
        if not rows:             # empty input: nothing to rank or sample
            return df.limit(0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, [stratum_col, "_hb", "_off"])
    tot_df = spark.createDataFrame(list(totals.items()),
                                   [stratum_col, "_tot"])
    from pyspark.sql import Window
    w = Window.partitionBy(stratum_col, "_hb").orderBy("_h", id_col)
    return (q.join(F.broadcast(off_df), [stratum_col, "_hb"])
            .join(F.broadcast(tot_df), stratum_col)
            .withColumn("_rn", F.col("_off") + F.row_number().over(w))
            .filter(F.col("_rn") <= F.ceil(F.lit(frac) * F.col("_tot")))
            .drop("_h", "_hb", "_off", "_tot", "_rn"))


def ntile_by_score(df: DataFrame, stratum_col: str, score_col: str,
                   id_col: str, k: int, n_cells: int = 1024,
                   out_col: str = "ntile") -> DataFrame:
    """NTILE(k) OVER (PARTITION BY stratum ORDER BY score DESC, id)
    without a per-stratum global sort — the ranking primitive of
    CCNet-style quantile bucketing, where a stratum (a language) can
    be corpus-sized and a naive window would funnel it through ONE
    task.

    Hierarchical form (the stratified_sample_exact shape, but ordered
    by an INTEGER score instead of md5): rows land in fixed-width
    score cells; per-(stratum, cell) counts aggregate in parallel and
    collect (strata x n_cells rows — plan-sized metadata); the driver
    prefix-scans each stratum's cells in DESCENDING score order; rank
    = cell offset + row_number within the (stratum, cell) window only.
    Every window partition is one cell's rows, never a stratum.

    ``score_col`` must be integer-valued (the micro-unit discipline:
    rank on the exact integer, report the derived double) and the
    (score, id) order total within a stratum. NULL strata or scores
    are the caller's to exclude — stated, not silent: this ranks every
    row it is given.

    Tile sizes follow the SQL NTILE contract (larger tiles first):
    tile = 1 + floor((rank - 1) * k / n_stratum) — exact integer
    arithmetic, replayable by any engine's NTILE.

    Residual skew bound: rows sharing ONE fixed-width cell share a
    window. A score distribution concentrated in < cell-width around a
    value keeps that cell's rows in one task — raise n_cells (cells
    are metadata-sized) or pre-spread the score if a corpus
    degenerates to near-constant scores.
    """
    if k < 1:
        raise ValueError(f"ntile_by_score: k must be >= 1, got {k}")
    spark = df.sparkSession
    # negate so ascending cell order == descending score order; the
    # (score DESC, id ASC) tiebreak becomes (_s2 ASC, id ASC)
    q = df.withColumn("_s2", -F.col(score_col).cast("long"))
    lo, hi = q.agg(F.min("_s2"), F.max("_s2")).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    width = max(1, (int(hi) - int(lo)) // n_cells + 1)
    q = q.withColumn("_cell", F.floor((F.col("_s2") - F.lit(int(lo)))
                                      / F.lit(width)).cast("long"))
    counts = (q.groupBy(stratum_col, "_cell")
              .agg(F.count(F.lit(1)).alias("_c")).collect())
    per: dict = {}
    for r in counts:
        per.setdefault(r[0], []).append((int(r[1]), int(r[2])))
    offsets, totals = [], []
    for s, cells in per.items():
        acc = 0
        for cell, c in sorted(cells):
            offsets.append((s, cell, acc))
            acc += c
        totals.append((s, acc))
    off_df = spark.createDataFrame(offsets, [stratum_col, "_cell", "_off"])
    tot_df = spark.createDataFrame(totals, [stratum_col, "_tot"])
    w = Window.partitionBy(stratum_col, "_cell").orderBy("_s2", id_col)
    rank = F.col("_off") + F.row_number().over(w)
    tile = 1 + F.floor((rank - 1) * F.lit(int(k)) / F.col("_tot"))
    return (q.join(F.broadcast(off_df), [stratum_col, "_cell"])
            .join(F.broadcast(tot_df), stratum_col)
            .withColumn(out_col, tile.cast("long"))
            .drop("_s2", "_cell", "_off", "_tot"))


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int,
                   seed: str = "") -> DataFrame:
    """Deterministic pre-training shuffle + shard assignment: every
    row gets (shard, pos) — a uniform pseudo-random global order,
    reproducible on any cluster layout from (id, seed) alone — the
    step that writes a curated corpus out as shuffled training shards
    (readers stream shard files in pos order; changing ``seed``
    reshuffles, same seed = byte-identical shards forever).

    Order key = md5(seed ':' id): shard is the key's first-8-hex int
    mod n_shards, pos the row_number within the shard by (key, id).
    Uniform because md5 is; deterministic because nothing depends on
    partitioning or rand() plumbing.

    100 TB shape: ONE shuffle on shard + a per-shard sort — exactly
    the repartition + sortWithinPartitions write shape, and the
    per-shard window IS that sort. Size ``n_shards`` so a shard fits
    a task comfortably (corpus_bytes / n_shards <~ a few GB): shards
    scale out with the corpus, so no single-task funnel — at 100 TB
    you run n_shards ~ 20-50k, not this demo's 32.
    """
    if n_shards < 1:
        raise ValueError(f"shuffle_shards: n_shards must be >= 1, "
                         f"got {n_shards}")
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(F.col("_h"), 1, 8), 16, 10)
             .cast("long") % n_shards)
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (df.withColumn("_h", h)
            .withColumn("shard", shard)
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_h"))


def mix_weights(df: DataFrame, alpha: float = 0.5,
                by: str = "source",
                text_col: str = "text") -> DataFrame:
    """Temperature-scaled domain mixing weights (the Pile / LLaMA
    source-mixing discipline; Gao et al. 2020, Touvron et al. 2023):
    per domain, the natural token share nat_frac = T_s / T and the
    temperature-alpha mixing share mix_frac = T_s^alpha / sum_t
    T_t^alpha, plus the upsampling factor mix_frac / nat_frac a
    sampler applies per domain. alpha < 1 flattens the mix toward
    small domains (alpha 0 = uniform over domains, 1 = natural).

    Output, one row per domain: (<by>, n_docs, n_tokens, nat_frac,
    mix_frac, upsample), fractions floor-rounded at 1e-6.

    Determinism: token counts are EXACT integer sums; for alpha = 0.5
    the power runs as sqrt (IEEE-correctly-rounded, so engine and
    oracle agree bit-for-bit), while other alphas use pow, which is
    only 1-ulp-bounded in both engines — the ln()-residual note in
    operators/search.py applies. The cross-domain sum of T_s^alpha is
    a SEQUENTIAL FOLD over the domains sorted by key — never a
    partitioning-dependent double sum — so the denominator is
    bit-stable on any cluster layout and replayable by an ordered
    list_reduce in DuckDB.

    100 TB shape: one map-side-combinable integer aggregate on a
    low-cardinality key, a one-row totals table broadcast back; no
    wide shuffle, no skew exposure (per-domain counts combine before
    the exchange).

    NULL-domain policy: rows with a NULL ``by`` key are EXCLUDED (and
    so never sampled by mix_sample) — attribute or bucket
    unattributed rows upstream. Stated rather than silent: a NULL
    group would also sort differently in the two engines' ordered
    folds (Spark nulls-first vs DuckDB nulls-last), so admitting it
    would break the bit-stable denominator."""
    from mr_mpi_blast_spark.functions.text import tokens

    df = df.filter(F.col(by).isNotNull())
    per = (df.groupBy(F.col(by).alias("k"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.size(tokens(F.col(text_col))))
                   .cast("long").alias("n_tokens")))
    if alpha == 0.5:
        pw = F.sqrt(F.col("n_tokens").cast("double"))
    else:
        pw = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    per = per.withColumn("pw", pw)
    tot = (per.agg(F.sum("n_tokens").alias("tt"),
                   F.sort_array(F.collect_list(F.struct("k", "pw")))
                    .alias("arr"))
           .select(F.col("tt").cast("double").alias("tt"),
                   F.aggregate(F.expr("transform(arr, x -> x.pw)"),
                               F.lit(0.0),
                               lambda acc, v: acc + v).alias("ss")))
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    nat = F.col("n_tokens").cast("double") / F.col("tt")
    mix = F.col("pw") / F.col("ss")
    return (per.crossJoin(F.broadcast(tot))
            .select(F.col("k").alias(by), "n_docs", "n_tokens",
                    r6(nat).alias("nat_frac"),
                    r6(mix).alias("mix_frac"),
                    r6(mix / nat).alias("upsample")))


def mix_sample(df: DataFrame, alpha: float = 0.5,
               target_frac: float = 0.5,
               by: str = "source",
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """The APPLY step to mix_weights: materialize the temperature-
    mixed corpus by deterministic per-domain id-hash sampling at rate
    min(1, target_frac * upsample_s) — domains the alpha-mix
    upweights keep more of their documents, downweighted ones keep
    fewer, and the id-bucket discipline makes membership a pure
    function of the row id (same sample on any cluster layout; rerun
    = same corpus). ``target_frac`` is the OVERALL keep fraction the
    caller is budgeting for; rates cap at 1 because this operator
    only SELECTS — a domain whose mixed share exceeds its natural
    share beyond the cap needs epoch-level repetition upstream
    (the standard practice for upsampled domains), not row
    duplication here.

    100 TB shape: mix_weights' one integer aggregate + a broadcast
    join of the per-domain rate table + a narrow filter the scan
    fuses — no extra shuffle over the corpus at all. NULL ``by`` keys
    follow mix_weights' stated policy: excluded (the inner rate join
    would otherwise drop them silently; now it is the documented
    contract)."""
    if not 0.0 <= target_frac <= 1.0:
        raise ValueError("target_frac must be in [0, 1]")
    w = mix_weights(df, alpha, by, text_col).select(by, "upsample")
    rate = F.least(F.lit(1.0), F.col("upsample") * F.lit(target_frac))
    return (df.join(F.broadcast(w), by)
            .filter(id_bucket(F.col(id_col)) < rate * _BUCKETS)
            .select(*df.columns))


def chunk_documents(df: DataFrame, chunk_tokens: int = 32,
                    stride: int = 24, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window document chunking — the RAG/pretraining prep
    step that cuts long documents into overlapping fixed-token
    windows (chunk k covers tokens [k*stride, k*stride+chunk_tokens)
    of the whitespace-normalized token stream; overlap =
    chunk_tokens - stride).

    Chunk count per doc is exact integer arithmetic
    ((max(n - chunk, 0) + stride - 1) div stride, inclusive of chunk
    0), so both engines enumerate identical windows; the trailing
    chunk is shorter, never empty, and a document shorter than one
    chunk yields exactly one chunk. Pure column expressions — the
    explode fans out per doc by ceil(n/stride), token-count-
    proportional, never corpus-squared; no UDF, no collect.

    Output: (doc_id, chunk_id, n_tokens, chunk_text).
    """
    if chunk_tokens < 1 or stride < 1 or stride > chunk_tokens:
        raise ValueError(
            f"need 1 <= stride <= chunk_tokens, got "
            f"chunk_tokens={chunk_tokens} stride={stride}")
    from mr_mpi_blast_spark.functions.hashing import normalized_text
    ws = F.split(normalized_text(F.col(text_col)), " ")
    t = df.select(F.col(id_col).alias("doc_id"), ws.alias("ws"))
    kmax = F.expr(
        f"(greatest(size(ws) - {chunk_tokens}, 0) + {stride} - 1) "
        f"div {stride}")
    exploded = t.select(
        "doc_id", "ws",
        F.explode(F.sequence(F.lit(0), kmax)).alias("chunk_id"))
    piece = F.slice(F.col("ws"), F.col("chunk_id") * stride + 1,
                    chunk_tokens)
    return exploded.select(
        "doc_id", F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))
