"""Deduplication operators (beyond-reference training-data surface).

Exact, n-gram Jaccard, MinHash+LSH, and SimHash dedup over a document
table. Designed for 100 TB: the only all-pairs computation is the
*verification* of LSH candidates (output-sized, not corpus-sized);
signatures and band keys are per-row column expressions; the candidate
join is an equi-join on band keys — shuffle on a short hash key, never
on text. The exact-Jaccard path exists as the oracle/verifier; its
shingle self-join is quadratic in shingle document-frequency and is NOT
the scale path (dedup_minhash_lsh is).
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mr_mpi_blast_spark.functions.hashing import (char_shingles,
                                                  normalized_text)


from mr_mpi_blast_spark.session import spread_for_compute as _spread


# Persisted signature tables created by the pair generators below, so a
# long-lived session can release them: the returned pair DataFrames are
# LAZY, which makes an in-function unpersist impossible without losing
# the multi-consumer reuse the persist exists for (two candidate-join
# sides + two verify sides read each signature table). Every persist in
# this module is bounded (one short row per document), but bounded is
# not zero — a session calling these repeatedly over many corpora
# accumulates cached plans/storage unless it releases them.
_SIG_CACHES: list[DataFrame] = []

# Active signature_cache_scope blocks are tracked PER THREAD: a scope
# must only release tables registered by its own thread's block, never
# tables a concurrent thread persisted while the block was open (a
# len()-mark over the shared list would pop those too, silently
# stripping the other thread's cache mid-use).
_SIG_SCOPES = threading.local()


def _cache_sigs(df: DataFrame) -> DataFrame:
    """persist() + register for release_signature_caches() (and, when
    the calling thread is inside signature_cache_scope, for that
    scope's exit release)."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    stack = getattr(_SIG_SCOPES, "stack", None)
    if stack:
        stack[-1].append(df)
    else:
        _SIG_CACHES.append(df)
    return df


def release_signature_caches() -> int:
    """Unpersist every signature table persisted by this module's pair
    generators OUTSIDE any active scope since the last release. Call
    after the pair DataFrame (and anything derived from it) has been
    materialized — e.g. once per corpus in a multi-corpus loop.
    Returns the number released. (Tables registered inside an open
    signature_cache_scope belong to that scope and are not touched.)"""
    n = len(_SIG_CACHES)
    while _SIG_CACHES:
        _SIG_CACHES.pop().unpersist()
    return n


@contextlib.contextmanager
def signature_cache_scope():
    """Scope the signature caches to a block::

        with signature_cache_scope():
            minhash_lsh_pairs(df, ...).write.parquet(out)

    On exit (success or error) every signature table persisted inside
    the block BY THIS THREAD is unpersisted (concurrent threads'
    registrations are untouched). Derived DataFrames remain valid —
    Spark recomputes from lineage — they just lose the cache."""
    mine: list[DataFrame] = []
    stack = getattr(_SIG_SCOPES, "stack", None)
    if stack is None:
        stack = _SIG_SCOPES.stack = []
    stack.append(mine)
    try:
        yield
    finally:
        stack.pop()
        while mine:
            mine.pop().unpersist()


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with
    the keeper (min id) and the duplicate count."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("fp"))
              .agg(F.min(id_col).alias("keeper"),
                   F.count(F.lit(1)).alias("n")))


def shingle_table(df: DataFrame, n: int, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) exploded distinct char n-grams."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_shingles(F.col(text_col), n)).alias("s"))


def ngram_jaccard_pairs(df: DataFrame, n: int, threshold: float,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact all-pairs shingle Jaccard >= threshold (join-count form).

    Output: (da, db, jac). Cost is Σ df² over shingle document
    frequencies — the whole computation stays in whole-stage codegen
    (hash join + hash agg on 8-byte keys), so it tolerates heavy
    shingle sharing. For selective corpora (realistic text, where
    10-gram df ≈ 1) prefer ngram_jaccard_pairs_prefix, which reads
    ~(1-t) of the shingle rows; on a small shared vocabulary its
    candidate set degenerates toward all-pairs and per-pair array
    verification loses to this form (25s vs 5s at sf0.1).
    """
    # join on the 64-bit hash of the shingle, not the string: the
    # shuffle/compare key is 8 bytes instead of n chars (collision odds
    # over ~n_docs*n_shingles keys are < 1e-7; the jac values compared
    # at 1e-4 granularity are unaffected)
    sh = shingle_table(_spread(df, id_col), n, text_col, id_col).select(
        "doc_id", F.xxhash64("s").alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("da"),
                      F.col("b.doc_id").alias("db"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb"))
    jac = (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    return (inter.join(sa, "da").join(sb, "db")
            .withColumn("jac", F.round(jac, 4))
            .filter(F.col("jac") >= threshold)
            .select("da", "db", "jac"))


def ngram_jaccard_pairs_prefix(df: DataFrame, n: int, threshold: float,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """Exact all-pairs shingle Jaccard >= threshold, prefix-filtered.

    Pair-identical output to ngram_jaccard_pairs, but the join only
    touches each document's PREFIX under a global shingle order
    (AllPairs / PPJoin prefix filter, Bayardo et al. WWW'07; Xiao et
    al. WWW'08): if J(A,B) >= t then |A∩B| >= t*|A| and >= t*|B|, so
    two documents at the threshold must share at least one shingle
    among their first |d| - ceil(t*|d|) + 1 shingles in any shared
    total order. At t=0.8 the join reads ~20% of shingle rows =>
    ~25x fewer compared pairs when shingles are selective (df ≈ 1,
    the realistic-corpus case); candidates are then verified with the
    exact Jaccard over the full sorted shingle-hash arrays. The
    global order is the 64-bit shingle hash. On corpora with heavy
    shingle sharing the candidate set degenerates toward all-pairs —
    use the join-count form there (see its docstring).
    """
    sh = shingle_table(_spread(df, id_col), n, text_col, id_col).select(
        "doc_id", F.xxhash64("s").alias("h"))
    agg = (sh.groupBy("doc_id")
           .agg(F.sort_array(F.collect_set("h")).alias("hs"))
           .withColumn("sz", F.size("hs"))
           .withColumn("plen", (F.col("sz")
                                - F.ceil(F.lit(threshold) * F.col("sz"))
                                + 1).cast("int")))
    agg = _cache_sigs(agg)
    pref = agg.select(
        "doc_id", F.explode(F.slice("hs", F.lit(1), F.col("plen"))).alias("h"))
    a, b = pref.alias("a"), pref.alias("b")
    cand = (a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"))
            .distinct())
    sh_a = agg.select(F.col("doc_id").alias("da"), F.col("hs").alias("sh_a"))
    sh_b = agg.select(F.col("doc_id").alias("db"), F.col("hs").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (cand.join(sh_a, "da").join(sh_b, "db")
            .withColumn("jac", F.round(jac, 4))
            .filter(F.col("jac") >= threshold)
            .select("da", "db", "jac"))


def minhash_lsh_pairs(df: DataFrame, n: int, threshold: float,
                      num_hashes: int = 16, bands: int = 8,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    The scale path: per-row signature (num_hashes xxhash64 minima over
    shingles), band keys, equi-join on (band, key) for candidates,
    then exact Jaccard ONLY on candidate pairs via array intersection.
    With b bands of r rows, P(candidate) = 1-(1-s^r)^b — at the
    default 8x2, a 0.9-similar pair is missed with p < 1e-6.
    Output: (da, db, jac), same contract as ngram_jaccard_pairs.
    """
    rows_per_band = num_hashes // bands
    # One pass: explode distinct shingles, hash each once (8-byte key),
    # then compute ALL num_hashes minima inside a single hash aggregate
    # (min over xxhash64(seed_i, h)). No higher-order functions in the
    # hot path: HOFs are CodegenFallback, and any shared array column
    # gets inlined by CollapseProject into every consumer expression —
    # measured as a 16x recompute of the shingle array at sf0.1.
    sh = shingle_table(_spread(df, id_col), n, text_col, id_col).select(
        "doc_id", F.xxhash64("s").alias("h"))
    agg = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("h")).alias("hs"),
        *[F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"m{i}")
          for i in range(num_hashes)])
    # Four consumers (two key sides, two verify sides) would otherwise
    # recompute the explode+aggregate each; one row per doc (~2 KB) so
    # MEMORY_AND_DISK stays bounded and spills rather than OOMs.
    # Released via release_signature_caches()/signature_cache_scope().
    agg = _cache_sigs(agg)

    band_keys = F.array(*[
        F.xxhash64(F.array(*[F.col(f"m{b * rows_per_band + r}")
                             for r in range(rows_per_band)]))
        for b in range(bands)])
    keys = agg.select(
        "doc_id", F.posexplode(band_keys).alias("band", "key"))

    a, b = keys.alias("a"), keys.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"))
            .distinct())

    sh_a = agg.select(F.col("doc_id").alias("da"), F.col("hs").alias("sh_a"))
    sh_b = agg.select(F.col("doc_id").alias("db"), F.col("hs").alias("sh_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return (cand.join(sh_a, "da").join(sh_b, "db")
            .withColumn("jac", F.round(jac, 4))
            .filter(F.col("jac") >= threshold)
            .select("da", "db", "jac"))


def connected_components(edges: DataFrame, src: str = "da",
                         dst: str = "db", max_iter: int = 50) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the
    canonicalization step of a dedup pipeline: every document in a
    component keeps/points to the component's minimum id.

    Iterative min-label propagation with pointer jumping: each round
    every node takes the minimum label among itself and its neighbors
    (one shuffle join on the edge list + a min-aggregate), then
    shortcuts through its current label's own label (lab := lab[lab],
    one join on the label table). Neighbor propagation alone needs
    O(component diameter) rounds; the jump step halves the effective
    pointer depth each round, giving O(log n) worst-case even on long
    chains — near-dup components are near-cliques, so typically 2-3
    rounds either way. The edge list is output-sized (number of dup
    pairs), never corpus-sized, so at 100 TB this iterates over
    megabytes, not the corpus. Lineage is truncated per round
    (localCheckpoint) so the plan stays flat; on a cluster point
    spark.checkpoint.dir at shared storage and swap to checkpoint().

    Output: (node, cluster) for every node that appears in an edge.
    (Isolated documents are their own cluster by definition and are
    not re-emitted — callers left-join and coalesce to doc_id.)
    """
    a, b = F.col(src).alias("a"), F.col(dst).alias("b")
    # materialize the edge list ONCE — every propagation round joins
    # it, and without truncation each round would re-run the whole
    # upstream candidate/verify pipeline that produced the pairs
    sym = edges.select(a, b).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint(eager=True)
    node_t = sym.schema["a"].dataType
    labels = None  # round 1 never reads it — see the fusion note below
    for rnd in range(max_iter):
        # r12 optimization (guide §2.4): min over self ∪ neighbor
        # labels in ONE aggregate — the label table is unioned into
        # the neighbor stream as a tagged self row, so
        # least(lab, coalesce(min_neigh, lab)) becomes min over the
        # seeded union and the old label rides the SAME aggregate
        # (max over the tagged self rows) — this replaces the
        # neighbor-min aggregate + LEFT JOIN back to labels (two
        # exchanges + a join) with union + one aggregate. Values and
        # the exact changed-count convergence signal are unchanged:
        # lab' = jump(min(lab, min_neighbor_lab)).
        if rnd == 0:
            # r12 round-1 fusion (guide §2.4 — remove shuffles
            # outright): the initial label table is the identity map
            # (lab == node), so joining sym against it would return
            # sym unchanged, and its distinct-node build is an
            # aggregate the first round can skip. Build the seeded
            # stream straight from the checkpointed edge list: each
            # (a, b) row contributes b as a neighbor label and a as a
            # (duplicated, all-equal) tagged self row — min(nlab) and
            # max(self_lab) are duplicate-insensitive, so the round-1
            # aggregate output is row-for-row identical to the joined
            # form while one distinct aggregate and one join drop out
            # of the plan.
            seeded = (sym.select(F.col("a").alias("node"),
                                 F.col("b").alias("nlab"),
                                 F.lit(None).cast(node_t)
                                 .alias("self_lab"))
                      .union(sym.select(F.col("a").alias("node"),
                                        F.col("a").alias("nlab"),
                                        F.col("a").alias("self_lab"))))
        else:
            seeded = (sym.join(labels.select(F.col("node").alias("b"),
                                             F.col("lab").alias("nlab")),
                               "b")
                      .select(F.col("a").alias("node"), "nlab",
                              F.lit(None).cast(node_t).alias("self_lab"))
                      .union(labels.select("node",
                                           F.col("lab").alias("nlab"),
                                           F.col("lab").alias("self_lab"))))
        new = seeded.groupBy("node").agg(
            F.min("nlab").alias("lab"),
            # the seeded self rows for a node all carry its old label
            # (exactly one row from the label table on rounds > 1, one
            # per incident edge on round 1): max() picks it out
            F.max("self_lab").alias("_old"))
        # pointer jump: follow the label's own label (labels only ever
        # decrease, so lab[lab] <= lab; missing lookup = already a root)
        jump = new.select(F.col("node").alias("_jn"),
                          F.col("lab").alias("_jlab"))
        # convergence count rides the SAME job as the checkpoint: the
        # old label is carried through the round and the changed-count
        # observed while the eager localCheckpoint materializes —
        # no per-iteration extra join-and-count job
        obs = Observation()
        new = (new.join(jump, new["lab"] == jump["_jn"], "left")
               .select("node",
                       F.coalesce("_jlab", "lab").alias("lab"),
                       (F.coalesce("_jlab", "lab") != F.col("_old"))
                       .alias("_chg"))
               .observe(obs, F.sum(F.col("_chg").cast("long"))
                        .alias("changed"))
               .drop("_chg")
               .localCheckpoint(eager=True))
        labels = new.select("node", "lab")
        if int(obs.get["changed"] or 0) == 0:
            break
    if labels is None:  # max_iter == 0: the identity labeling
        labels = (sym.select(F.col("a").alias("node")).distinct()
                  .withColumn("lab", F.col("node")))
    return labels.select("node", F.col("lab").alias("cluster"))


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over distinct whitespace tokens.

    Bit j: sum over tokens of ±1 by bit j of md5(token); positive
    sums set the bit. Emitted as a 64-char '0'/'1' string (cross-engine
    safe; callers needing an int can conv(bits, 2, 10)).
    Output: (doc_id, simhash).
    """
    tokens = _spread(df, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(
            F.split(F.lower(normalized_text(F.col(text_col))), " "))).alias("tok"))
    h = tokens.withColumn("h", F.md5(F.col("tok")))
    # One row per (doc, token) — NOT 64 per token: the 16 hex nibbles
    # are materialized once per token, then the 64 bit-sums run as 64
    # plain aggregate expressions in a single hash aggregate (map-side
    # partial + final, all codegen). The exploded-j form was a 64x row
    # blowup through two aggregation levels — measured 5.2s -> 0.9s at
    # sf0.1. Arithmetic is expression-identical to the DuckDB oracle.
    nibs = h.select(
        "doc_id",
        *[(F.instr(F.lit("0123456789abcdef"),
                   F.substring(F.col("h"), i + 1, 1)) - 1).alias(f"n{i}")
          for i in range(16)])
    sums = nibs.groupBy("doc_id").agg(*[
        F.sum(F.shiftright(F.col(f"n{j // 4}"), 3 - j % 4)
              .bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{j}")
        for j in range(64)])
    return sums.select(
        "doc_id",
        F.concat(*[F.when(F.col(f"s{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
                   for j in range(64)]).alias("simhash"))


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       signatures: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded for scale:
    split the 64-bit signature into (max_hamming+1) chunks — any pair
    within max_hamming must agree on at least one chunk (pigeonhole),
    so candidates come from an equi-join on (chunk_id, chunk_bits),
    never all-pairs. Output: (da, db, hamming).

    ``signatures``: optionally reuse a precomputed (doc_id, simhash)
    table (e.g. materialized once per corpus) instead of recomputing
    from text."""
    chunks = max_hamming + 1
    width = 64 // chunks
    # both candidate-join sides and the verify read the signatures; one
    # 72-byte row per doc, so persistence is bounded (cf. minhash agg)
    sig = ((signatures if signatures is not None
            else simhash_signatures(df, text_col, id_col))
           # two 32-bit halves as longs: hamming = bit_count(xor) twice,
           # pure codegen arithmetic instead of an interpreted zip_with
           # over 64-char arrays per candidate pair
           .withColumn("h1", F.conv(F.substring("simhash", 1, 32), 2, 10).cast("long"))
           .withColumn("h2", F.conv(F.substring("simhash", 33, 32), 2, 10).cast("long")))
    sig = _cache_sigs(sig)
    pieces = sig.select(
        "doc_id", "h1", "h2",
        F.posexplode(F.array(*[
            F.substring("simhash", i * width + 1,
                        width if i < chunks - 1 else 64 - (chunks - 1) * width)
            for i in range(chunks)])).alias("chunk_id", "chunk"))
    a, b = pieces.alias("a"), pieces.alias("b")
    ham = (F.bit_count(F.col("a.h1").bitwiseXOR(F.col("b.h1")))
           + F.bit_count(F.col("a.h2").bitwiseXOR(F.col("b.h2"))))
    return (a.join(b, (F.col("a.chunk_id") == F.col("b.chunk_id"))
                   & (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"),
                    ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def word_gram_hashes(df: DataFrame, w: int, out_id: str,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(out_id, gh): xxhash64 of each distinct word-w-gram per doc —
    the shared shape of decontamination's join sides. Exposed so a
    production run can stage the train-side table once (e.g. to
    parquet) and reuse it across the df-count pass, the collision
    join, and multiple test sets, instead of re-deriving grams from
    text per pass (see ngram_collisions' train_grams parameter)."""
    ws = F.split(normalized_text(F.col(text_col)), " ")
    # spread first: the gram transform/array_join/xxhash64 pipeline is
    # the dominant compute and a single-row-group scan is one task
    # (guide §2.5)
    d = _spread(df, id_col).select(F.col(id_col).alias(out_id),
                                   ws.alias("ws"))
    # sequence(1, n) with n < 1 would count DOWNWARD — guard first
    d = d.filter(F.size("ws") >= w)
    g = F.expr(
        f"array_distinct(transform(sequence(1, size(ws) - {w} + 1), "
        f"i -> array_join(slice(ws, i, {w}), ' ')))")
    return (d.select(out_id, F.explode(g).alias("gram"))
             .select(out_id, F.xxhash64("gram").alias("gh")))


def ngram_collisions(test: DataFrame, train: DataFrame,
                     w: int = 13,
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     max_train_df: int | None = None,
                     train_grams: DataFrame | None = None) -> DataFrame:
    """Exact word-w-gram collision decontamination (the GPT-3/PaLM
    discipline: a test document is contaminated if ANY of its w-grams
    appears verbatim in any train document — the leakage that survives
    both exact-hash dedup and near-dup thresholds).

    Output: (test_doc, train_doc, n_collisions) — one row per
    contaminated pair, n_collisions = distinct test w-grams shared.

    100 TB shape: per-doc grams are a pure column expression
    (array_distinct bounds per-doc multiplicity), the join is an
    equi-join on xxhash64(gram) — an 8-byte shuffle key, never the
    gram text.

    ``max_train_df`` is the skew/scale guard: a gram with train-side
    document frequency f and test-side frequency g contributes f*g
    join rows, so at web scale one ubiquitous boilerplate 13-gram
    (license header, nav chrome) makes the join quadratic in its df —
    AQE's skew-join splits the hot partitions across tasks but cannot
    shrink the row count. High-df grams are boilerplate, not leakage:
    the cap drops grams whose train df exceeds it BEFORE the join,
    via a groupBy-count (map-side combinable — per-doc grams are
    already distinct, so rows per hash = df) and a left-semi join on
    the 8-byte gram hash. The join input shrinks from Σ f·g to
    Σ_{f<=cap} f·g. None (the default) keeps the exact uncapped
    definition for oracle replay.

    Hash-vs-text asymmetry: this engine joins (and, under the cap,
    counts df) on the 64-bit gram hash while a text oracle joins on
    the gram itself. Expected colliding gram pairs at N distinct
    grams is ~N^2/2^65: ~3 at N=1e10 and ~2.7e4 at N=1e12 (a 100 TB
    corpus) — and a collision only surfaces if the two grams' docs
    cross splits, so spurious pairs stay negligible for a screening
    operator whose flagged pairs get inspected anyway. An audit mode
    that carries gram text through the join costs text-width shuffle
    and exists in the DuckDB oracle replay.

    ``train_grams``: optionally reuse a precomputed (train_doc, gh)
    table (the word_gram_hashes shape — e.g. staged once to parquet
    per corpus). With a cap, the train grams are otherwise derived
    from text TWICE (df-count pass + join probe); staging turns the
    dominant 100 TB cost — the corpus scan + gram expansion — into a
    one-time build shared across passes and test sets."""
    t = word_gram_hashes(test, w, "test_doc", id_col, text_col)
    r = (train_grams if train_grams is not None
         else word_gram_hashes(train, w, "train_doc", id_col, text_col))
    if max_train_df is not None:
        keep = (r.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
                 .filter(F.col("df") <= max_train_df)
                 .select("gh"))
        r = r.join(keep, "gh", "left_semi")
    return (t.join(r, "gh")
            .groupBy("test_doc", "train_doc")
            .agg(F.countDistinct("gh").alias("n_collisions")))


def duplicate_span_profile(df: DataFrame, min_len: int = 20,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Exact duplicate-substring span profile (the ExactSubstr
    discipline of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better"): a token is *duplicated* iff it lies
    inside some >= min_len-token substring that occurs at least twice
    in the corpus (any second occurrence counts — another document OR
    a repeat within the same one). Exact-hash dedup misses these
    (the surrounding documents differ); near-dup thresholds miss them
    (a 30-token boilerplate block inside a 5k-token page moves Jaccard
    by ~1%). This is the operator that catches them.

    Identity: the duplicated-token set equals the union of duplicated
    min_len-grams — a duplicated substring of length M >= min_len
    contains only duplicated grams, and every duplicated gram IS a
    duplicated substring — so gram hashing + interval union replaces
    the reference implementation's suffix array over the concatenated
    corpus. Per doc, occurrence positions of duplicated grams merge
    into maximal spans by gaps-and-islands (a new span starts when
    pos > running max(end) + 1).

    Output, one row per document (clean docs included):
    (doc_id, n_tokens, n_dup_spans, dup_tokens, dup_frac) with
    dup_frac floor-rounded at 1e-4 (cross-engine discipline).

    100 TB shape — this is where it beats the suffix array: no global
    sort and no pair join anywhere. The occurrence table is
    corpus-token-sized but streams: one hash aggregate on the 8-byte
    gram hash (map-side combinable) for the >= 2 count, one semi-join
    back (AQE splits any boilerplate hot key; the per-key row count is
    df, never df^2 — contrast ngram_collisions' f*g join), then a
    window partitioned by doc_id over only the *duplicated*
    occurrences (output-sized, bounded per doc by token count). A
    suffix array needs a corpus-wide sort of every suffix; this needs
    two linear shuffles. 64-bit gram-hash collisions mark ~N^2/2^65
    spurious tokens as duplicated (see ngram_collisions' bound) —
    screening-grade."""
    ws = F.split(normalized_text(F.col(text_col)), " ")
    # spread before the gram explode: the corpus scan is few-split
    # (one task per single-row-group file) and the transform/
    # array_join/xxhash64 gram pipeline is the query's dominant
    # compute (traced 1.3 s single-task at sf0.1, guide §2.5)
    base = _spread(df, id_col).select(F.col(id_col).alias("doc_id"),
                                      ws.alias("ws"))
    tok = base.select("doc_id", F.size("ws").cast("long").alias("n_tokens"))
    d = base.filter(F.size("ws") >= min_len)
    grams = F.expr(
        f"transform(sequence(1, size(ws) - {min_len} + 1), "
        f"i -> array_join(slice(ws, i, {min_len}), ' '))")
    occ = (d.select("doc_id", F.posexplode(grams).alias("p0", "gram"))
            .select("doc_id", (F.col("p0") + 1).alias("pos"),
                    F.xxhash64("gram").alias("gh")))
    dup = (occ.groupBy("gh").agg(F.count(F.lit(1)).alias("c"))
              .filter(F.col("c") >= 2).select("gh"))
    hits = (occ.join(dup, "gh", "left_semi")
               .select("doc_id", "pos",
                       (F.col("pos") + min_len - 1).alias("e")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = hits.withColumn(
        "new_span",
        F.when(F.col("pos") > F.coalesce(prev_e, F.lit(-1)) + 1,
               F.lit(1)).otherwise(F.lit(0)))
    spans = (marked.withColumn("span_id", F.sum("new_span").over(w))
             .groupBy("doc_id", "span_id")
             .agg(F.min("pos").alias("s"), F.max("e").alias("e")))
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"))
    out = (tok.join(agg, "doc_id", "left")
           .select("doc_id", "n_tokens",
                   F.coalesce("n_dup_spans", F.lit(0).cast("long"))
                    .alias("n_dup_spans"),
                   F.coalesce("dup_tokens", F.lit(0).cast("long"))
                    .alias("dup_tokens")))
    frac = F.col("dup_tokens").cast("double") / F.col("n_tokens")
    return out.withColumn("dup_frac", F.floor(frac * 1e4 + 0.5) / 1e4)


def duplicate_span_remove(df: DataFrame, min_len: int = 20,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """ExactSubstr duplicate-span REMOVAL (the apply step of Lee et
    al. 2021, companion to duplicate_span_profile's report step):
    rewrite each document with corpus-duplicated spans excised,
    keeping the corpus-first copy of each duplicated substring.

    Semantics (deterministic, oracle-replayable): for every
    min_len-token gram that occurs >= 2 times in the corpus, the
    occurrence with the smallest (doc_id, pos) is CANONICAL; every
    other occurrence is marked. Per document, marked occurrences merge
    into maximal intervals (gaps-and-islands, as in the profile), and
    a token survives iff no marked interval covers it. Note the
    canonical copy is protected only from its own gram's mark — a
    token inside it can still fall to a DIFFERENT duplicated gram
    whose canonical occurrence lies elsewhere; this is the same
    interval-union coarseness the profile documents, stated rather
    than hidden.

    Output, one row per input document (docs shorter than min_len
    pass through unchanged): (doc_id, n_tokens, kept_tokens,
    clean_text) where clean_text re-joins surviving tokens with
    single spaces over the normalized token stream.

    100 TB shape: the canonical occurrence per gram comes from ONE
    aggregate on the 8-byte gram hash (min(struct(doc_id, pos)) +
    count) — no corpus-wide window, no pair join. Spark executes the
    struct-min as a SortAggregate (struct buffers aren't
    hash-aggregable), but it still combines map-side: the shuffle
    carries one row per gram hash, and the pre-shuffle cost is a
    per-partition linearithmic sort of the local gram stream, not a
    global one. Marking is an equi-join back on gh (per-key fan-out
    = df, AQE-splittable). Interval merge is a per-doc window
    over only the MARKED occurrences (output-sized). The rebuild
    joins the per-doc merged-interval array (bounded by
    n_tokens/min_len entries) back to the document row and filters
    token positions with a pure array expression — token-level rows
    are never shuffled. 64-bit gram-hash collisions can spuriously
    mark ~N^2/2^65 occurrences (ngram_collisions documents the
    bound); screening-grade, and the DuckDB oracle replays on gram
    text as the audit path.
    """
    ws = F.split(normalized_text(F.col(text_col)), " ")
    # spread before the gram explode (same single-task-scan reasoning
    # as duplicate_span_profile; the rebuild join below re-reads base,
    # which stays spread too)
    base = _spread(df, id_col).select(F.col(id_col).alias("doc_id"),
                                      ws.alias("ws"))
    d = base.filter(F.size("ws") >= min_len)
    grams = F.expr(
        f"transform(sequence(1, size(ws) - {min_len} + 1), "
        f"i -> array_join(slice(ws, i, {min_len}), ' '))")
    occ = (d.select("doc_id", F.posexplode(grams).alias("p0", "gram"))
            .select("doc_id", (F.col("p0") + 1).alias("pos"),
                    F.xxhash64("gram").alias("gh")))
    # Canonical occurrence per duplicated gram: min(struct) orders by
    # (doc_id, pos) lexicographically and combines map-side.
    firsts = (occ.groupBy("gh")
                 .agg(F.min(F.struct("doc_id", "pos")).alias("first"),
                      F.count(F.lit(1)).alias("c"))
                 .filter(F.col("c") >= 2)
                 .select("gh", F.col("first.doc_id").alias("fdoc"),
                         F.col("first.pos").alias("fpos")))
    marked = (occ.join(firsts, "gh")
                 .filter(~((F.col("doc_id") == F.col("fdoc"))
                           & (F.col("pos") == F.col("fpos"))))
                 .select("doc_id", "pos",
                         (F.col("pos") + min_len - 1).alias("e")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = marked.withColumn(
        "new_span",
        F.when(F.col("pos") > F.coalesce(prev_e, F.lit(-1)) + 1,
               F.lit(1)).otherwise(F.lit(0)))
    spans = (islands.withColumn("span_id", F.sum("new_span").over(w))
             .groupBy("doc_id", "span_id")
             .agg(F.min("pos").alias("s"), F.max("e").alias("e"))
             .groupBy("doc_id")
             .agg(F.array_sort(F.collect_list(F.struct("s", "e")))
                   .alias("spans")))
    joined = base.join(spans, "doc_id", "left").withColumn(
        "spans", F.coalesce("spans", F.expr(
            "CAST(array() AS array<struct<s: int, e: int>>)")))
    keeps = F.expr(
        "filter(sequence(1, size(ws)), p -> "
        "NOT exists(spans, sp -> p >= sp.s AND p <= sp.e))")
    out = joined.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        keeps.alias("keeps"), "ws")
    return out.select(
        "doc_id", "n_tokens",
        F.size("keeps").cast("long").alias("kept_tokens"),
        F.expr("array_join(transform(keeps, p -> element_at(ws, p)), ' ')")
         .alias("clean_text"))


def ngram_jaccard_topk(df: DataFrame, n: int, k: int, floor: float,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       method: str = "count") -> DataFrame:
    """Top-k similarity JOIN (the ICDE 2012 "Parallel Top-K Similarity
    Join" operator family): the k globally most-similar document
    pairs by shingle Jaccard, searched above a floor threshold.
    Distinct from ngram_jaccard_pairs (ALL pairs >= t) and from
    per-query top-k (ANN): one global ranking over pairs.

    ``floor`` is the contract that keeps it exact AND scalable: the
    search provably finds every pair >= floor, so as long as at least
    k pairs clear the floor the global top-k is exact; fewer than k
    results means the floor was set above the k-th pair's similarity
    — lower it and rerun (the iterative-deepening discipline of the
    top-k join literature, driven by the caller, not hidden inside
    the operator).

    ``method`` picks the search join, and the choice matters MORE
    here than for the >= t dedup operators because top-k floors sit
    low: 'prefix' (ngram_jaccard_pairs_prefix) reads ~(1-floor) of
    each doc's shingles — at floor 0.3 that is 70%, and on a
    shared-vocabulary corpus its candidate set degenerates toward
    all-pairs with per-pair ARRAY verification (measured: hung the
    sf1.0 decade run for 9+ minutes). 'count' (the default,
    ngram_jaccard_pairs) pays the same Σ df² join rows but stays
    entirely in whole-stage codegen (hash join + hash agg on 8-byte
    keys, no arrays) — the robust shape at low floors; choose
    'prefix' only when shingles are selective (web-scale text,
    df ≈ 1) AND the floor is high.

    Output: (da, db, jac, rank), rank 1..k by (jac desc, da, db).
    The global top-k is TakeOrderedAndProject — per-partition heads
    merged on the driver, no global sort of the pair table."""
    if method not in ("count", "prefix"):
        raise ValueError(f"ngram_jaccard_topk: unknown method {method!r}")
    search = (ngram_jaccard_pairs_prefix if method == "prefix"
              else ngram_jaccard_pairs)
    pairs = search(df, n, floor, text_col, id_col)
    top = (pairs.orderBy(F.col("jac").desc(), "da", "db").limit(k))
    w = Window.orderBy(F.col("jac").desc(), "da", "db")
    return top.withColumn("rank", F.row_number().over(w))


def keep_best(comp: DataFrame, quality: DataFrame,
              node_col: str = "node",
              id_col: str = "doc_id",
              quality_col: str = "quality") -> DataFrame:
    """Quality-aware keeper per near-dup cluster: given a component
    table (node, cluster) and a per-doc quality table, pick each
    cluster's highest-quality member, ties to the LOWEST id — the
    canonical-copy decision (the best copy of a boilerplate-laden
    page is rarely the first-crawled one, so keep-min-id is the
    wrong default). One map-side-combining max(struct(quality, -id))
    aggregate — no window over the members. Output: (cluster,
    keeper, keeper_quality, n_members)."""
    q = quality.select(F.col(id_col).alias(node_col),
                       F.col(quality_col).alias("_q"))
    best = (comp.join(q, node_col)
            .groupBy("cluster")
            .agg(F.max(F.struct(F.col("_q").alias("q"),
                                (-F.col(node_col)).alias("negid")))
                  .alias("b"),
                 F.count(F.lit(1)).alias("n_members")))
    return best.select(
        "cluster",
        (-F.col("b.negid")).alias("keeper"),
        F.col("b.q").alias("keeper_quality"),
        F.col("n_members").cast("long").alias("n_members"))
