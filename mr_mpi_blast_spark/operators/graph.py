"""Iterative graph operators: fixed-point PageRank in exact integer
micro arithmetic.

PageRank is the canonical iterative-join algorithm of a web-scale
data-curation stack (host-level quality ranks over the crawl graph —
the signal CommonCrawl-derived corpora use to keep or drop domains;
Page et al. 1999). The reference's MapReduce engine ships the same
loop shape as its map/aggregate/reduce cycle (mrmpi/mapreduce.h:59-118
— PageRank is the README example of every MapReduce runtime); here it
is the DataFrame form: one join + one aggregate per iteration with
lineage truncated per round.

Determinism contract (house micro-unit discipline, shared with
operators/search.py): all rank mass is carried as int64 MICRO units
(1_000_000 == probability 1.0) and every division is integer floor
division, so the result is bit-identical in any engine, any partition
layout, any summation order — integer addition is associative and
commutative, double addition is not. The DuckDB oracle replays the
same iterations with `//` and matches exactly; no tolerance needed.

Update rule per iteration, in micros::

    contrib(u -> v) = (rank[u] * d_micro) div (1_000_000 * outdeg(u))
    rank'[v]        = (1_000_000 - d_micro) div n  +  sum_u contrib(u->v)

Floor-division remainders leak a deterministic trickle of mass per
iteration (as does a dangling node, which contributes nothing) — the
totals are NOT conserved to exactly 1e6 and do not need to be: the
operator contract is the ranking and its exact values, not stochastic
normalization. Callers wanting floats divide by 1e6 at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank_micro(edges: DataFrame, src: str = "src", dst: str = "dst",
                   n_iter: int = 5, damping_micro: int = 850_000,
                   content_key: str | None = None,
                   ckpt_every: int = 8) -> DataFrame:
    """Fixed-iteration power method over a directed edge list.

    Scale shape (the part that must survive 100 TB):

    - The edge list is joined EVERY iteration, so it is materialized
      once with outdeg pre-joined — each round touches one flat
      table, never the upstream pipeline that produced the edges.
    - With ``content_key`` set (the production path and the
      registered query's), the (src, dst, outdeg) table and the node
      table are staged as content-addressed BUCKETED tables
      (operators/bucketing.py) on src / node with shuffle-partition
      bucket counts. Every iteration's big join then reads the edge
      buckets in place: the EDGE table is never shuffled again, and
      the only per-iteration exchanges are NODE-sized (the rank table
      routed to the edge buckets, and the contribution aggregate) —
      pinned by tests/test_graph.py::test_pagerank_iteration_plan.
      At web scale edges ≫ nodes (the crawl graph is ~100 edges per
      host), so per-iteration shuffle volume drops from O(E) to O(V).
    - Without ``content_key`` (ad-hoc/small graphs) both tables are
      localCheckpoint-ed: same values, simplest lifecycle; PySpark's
      localCheckpoint does not carry partitioning into the logical
      plan, so this path re-exchanges (or broadcasts) the edge side
      per iteration — fine exactly when the graph is small.
    - Lineage is truncated every ``ckpt_every`` rounds and after the
      final one (the bpe_learn lesson, operators/bpe.py): plan depth
      stays O(ckpt_every) in n_iter, so a 50-iteration run plans as
      cheaply as a 5-iteration one. Rounds BETWEEN truncations chain
      lazily (r12, guide §2.4/§2.6, measured): the rank table is
      referenced exactly once per round and the loop has no per-round
      driver decision (unlike kcore/components, whose early-stop
      Observation and multiply-referenced state force a checkpoint
      per round), so a k-round segment is ONE Spark job instead of k
      driver round-trips, and round i+1's rank-side join can reuse
      round i's aggregate partitioning — partitioning a per-round
      eager localCheckpoint would destroy (the round's measured
      checkpoint trap #3). Per-round values are unchanged: the same
      exact int64 algebra executes, only lineage-truncation cadence
      moves.
    - Ranks are node-sized, edges are edge-sized; nothing corpus-sized
      crosses the driver — the only driver scalar is n (node count).

    Dangling nodes (outdeg == 0) receive rank but contribute nothing:
    their mass leaks, deterministically, per the module contract.
    Output: (node, rank_micro) for every node appearing in any edge.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if ckpt_every < 1:
        raise ValueError(f"ckpt_every must be >= 1, got {ckpt_every}")
    if not 0 < damping_micro < MICRO:
        raise ValueError(f"damping_micro must be in (0, {MICRO}), "
                         f"got {damping_micro}")
    spark = edges.sparkSession
    shuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes_df = (e.select(F.col("src").alias("node"))
                .union(e.select(F.col("dst").alias("node")))
                .distinct())
    if content_key is not None:
        import hashlib
        from mr_mpi_blast_spark.operators.bucketing import \
            ensure_bucketed_table
        digest = hashlib.md5(content_key.encode()).hexdigest()[:12]
        ed = spark.table(ensure_bucketed_table(
            spark, lambda: e.join(deg, "src"), f"pr_edges_{digest}",
            "src", shuf, f"pr_edges:{content_key}"))
        nodes = spark.table(ensure_bucketed_table(
            spark, lambda: nodes_df, f"pr_nodes_{digest}",
            "node", shuf, f"pr_nodes:{content_key}"))
    else:
        ed = (e.join(deg, "src")
              .repartition(shuf, "src")
              .localCheckpoint(eager=True))
        nodes = (nodes_df.repartition(shuf, "node")
                 .localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_micro", F.lit(0).cast("long"))
    base = (MICRO - damping_micro) // n
    # trivial projection of the already-materialized node table — no
    # checkpoint (on the bucketed path that would DISCARD the layout)
    ranks = nodes.withColumn("rank_micro", F.lit(MICRO // n).cast("long"))
    for i in range(n_iter):
        ranks = _pagerank_round(ed, nodes, ranks, base, damping_micro)
        # truncate on the segment boundary and ALWAYS after the final
        # round — the returned DataFrame stays a flat materialized
        # scan (the O(1)-depth pin in tests/test_graph.py)
        if (i + 1) % ckpt_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def _pagerank_round(ed: DataFrame, nodes: DataFrame, ranks: DataFrame,
                    base: int, damping_micro: int) -> DataFrame:
    """One power-method round (un-checkpointed — pagerank_micro owns
    lineage truncation). Split out so tests/test_graph.py can pin the
    single-shuffle plan shape of an iteration directly.

    r12 optimization (guide §2.4 — two operations keyed the same way
    share one exchange): instead of aggregating contributions and
    LEFT-JOINing the node table (agg exchange + join), the node table
    is unioned into the contribution stream as zero-valued seed rows
    and the base added inside ONE aggregate — sum(contribs) + 0 for
    reached nodes, 0 for unreached ones, so rank' = base + sum(c) is
    value-identical (exact int64 algebra, no float reorder concerns)
    while the per-iteration plan drops from two exchanges + a join to
    two exchanges and NO join after the edge attach."""
    contrib = (ed.join(ranks.select(F.col("node").alias("src"),
                                    "rank_micro"), "src")
               .select(F.col("dst").alias("node"),
                       F.expr(f"(rank_micro * {damping_micro}L) div "
                              f"({MICRO}L * outdeg)").alias("c")))
    seeded = contrib.union(
        nodes.select("node", F.lit(0).cast("long").alias("c")))
    return (seeded.groupBy("node")
            .agg((F.lit(base).cast("long")
                  + F.sum("c").cast("long")).alias("rank_micro")))


def pagerank_micro_sql(edges_sql: str, n_iter: int = 5,
                       damping_micro: int = 850_000) -> str:
    """The DuckDB oracle: unrolled CTE replay of pagerank_micro over
    an arbitrary `edges_sql` (must yield columns src, dst). Every
    arithmetic step is integer (`//`), so the replay is exact —
    identical int64 rank_micro values, no tolerance."""
    base_expr = f"({MICRO} - {damping_micro}) // p.n"
    sql = [f"""
WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
p AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, CAST({MICRO} // p.n AS BIGINT) AS rank_micro
       FROM nodes, p)"""]
    for k in range(1, n_iter + 1):
        sql.append(f""",
r{k} AS (
  SELECT nodes.node,
         CAST({base_expr} + COALESCE(c.s, 0) AS BIGINT) AS rank_micro
  FROM nodes CROSS JOIN p
  LEFT JOIN (
    SELECT e.dst AS node,
           SUM((r.rank_micro * {damping_micro}) //
               ({MICRO} * d.outdeg)) AS s
    FROM e JOIN r{k - 1} r ON e.src = r.node
           JOIN deg d ON e.src = d.src
    GROUP BY e.dst) c ON nodes.node = c.node)""")
    sql.append(f"\nSELECT node, rank_micro FROM r{n_iter}")
    return "".join(sql)



def _normalized_undirected(edges: DataFrame, a: str, b: str,
                           assume_distinct: bool = False) -> DataFrame:
    """Shared normalization for the undirected-graph operators: long
    ids, self-loops dropped, (min, max) orientation, distinct, and
    materialized ONCE — every caller reads it from multiple consumers,
    and without truncation each consumer would re-run the (possibly
    expensive) upstream pipeline that produced the edges.

    ``assume_distinct`` (r12, guide §2.1 — remove shuffles the data
    contract already paid for): a caller whose edge source GUARANTEES
    distinct (min, max) pairs with no self-loops (e.g. the co-purchase
    pair base, which ends in a groupBy(a, b) over a-<-b array pairs)
    may skip the dedup exchange+aggregate — the narrow cast/filter/
    orient expressions are kept (they are free and make a wrong claim
    merely redundant work, EXCEPT reversed duplicates, which the
    caller's contract must rule out).

    r12 note (measured, rejected): fusing the dedup with a
    full-width repartition ("the dedup shuffle IS the spread",
    repartition(target, x, y) + dropDuplicates) LOSES here — the
    edge table is tiny after the upstream aggregates, so forcing the
    dedup, the degree union (2x map legs) and kcore's 12 peel rounds
    to 32-64 tasks adds pure task overhead (kcore 1.24 s -> 2.2 s,
    triangles 3.4 s -> 4.8 s traced), while the one stage that NEEDS
    width (wedge closure) is already protected by the adjacency
    build's keyed repartition (triangle_counts._adj, r13 — formerly
    orient_edges' tail repartition). AQE's coalesced width is the
    right width for these small intermediate stages."""
    out = (edges.select(F.col(a).cast("long").alias("x"),
                        F.col(b).cast("long").alias("y"))
           .filter(F.col("x") != F.col("y"))
           .select(F.least("x", "y").alias("x"),
                   F.greatest("x", "y").alias("y")))
    if not assume_distinct:
        out = out.distinct()
    return out.localCheckpoint(eager=True)


def orient_edges(edges: DataFrame, a: str = "a", b: str = "b",
                 assume_distinct: bool = False,
                 materialize: bool = True) -> DataFrame:
    """The (degree, id)-oriented edge stream: every undirected edge
    directed from its (degree, id)-smaller endpoint to the larger, so
    each node's OUT-degree is bounded O(sqrt(2E)) on any graph — THE
    property that makes triangle counting hot-vertex-safe (Schank &
    Wagner 2005; a celebrity's edges all point INTO it). Normalized
    (self-loops dropped, duplicates merged). Exposed as the single
    source of the orientation rule: triangle_counts and the skew probe
    (scripts/graph_skew_probe.py) must measure the SAME orientation.
    Output: (src, dst).

    ``materialize`` (r13): with True (default — the multi-consumer
    contract) the oriented stream is spread to full parallelism and
    localCheckpoint-ed, so several consumers read the finished table
    instead of re-running the degree joins. A caller that reads the
    orientation EXACTLY ONCE (triangle_counts' adjacency build since
    the r13 probe-side fusion) passes False and gets the lazy
    pipeline: the orientation select fuses into the consumer's own
    stage, dropping one edge-sized exchange and one materialization
    job (guide §2.4) while the normalized edge table underneath stays
    checkpointed (it IS read multiple times, by the degree legs and
    the endpoint joins)."""
    return _orient_from(
        _normalized_undirected(edges, a, b, assume_distinct), materialize)


def _orient_from(e: DataFrame, materialize: bool = True) -> DataFrame:
    """Orientation over an already-normalized (x < y, distinct,
    checkpointed) edge table — split out so triangle_counts can reuse
    the caller-counted ``e`` (row count of the orientation == row
    count of e, so auto's broadcast estimate never needs to force the
    orientation itself)."""
    # NOTE (r12, measured): do NOT localCheckpoint deg. A checkpointed
    # RDD has no size statistics, so the two endpoint joins below lose
    # their AQE broadcast conversion (the deg aggregate's own shuffle
    # is what gives AQE a runtime size) and fall back to sort-merge —
    # whose ENSURE_REQUIREMENTS exchanges AQE then coalesces narrow,
    # starving the wedge stage (traced: triangles 3.4 s -> 6.3 s).
    # The duplicated degree-agg subtree (one build per broadcast) is
    # the cheaper evil, and at 1e9-node scale the auto conversion
    # correctly stays sort-merge rather than forcing a broadcast.
    deg = (e.select(F.col("x").alias("node"))
           .union(e.select(F.col("y").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    ed = (e.join(deg.select(F.col("node").alias("x"),
                            F.col("d").alias("dx")), "x")
          .join(deg.select(F.col("node").alias("y"),
                           F.col("d").alias("dy")), "y"))
    fwd = F.struct("dx", "x") < F.struct("dy", "y")
    oriented = ed.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("dst"),
    )
    if not materialize:
        return oriented
    # r12 (guide §2.5/§2.6, measured): a localCheckpoint inherits the
    # AQE-coalesced partition count of the plan it truncates — at
    # local[32] the post-join stream collapses to ~3-6 partitions,
    # and every downstream consumer then runs that narrow on a
    # 32-core box (traced: 4.7 s of the 8.5 s query in ONE 3-task
    # stage; removing this repartition regressed the r12 wedge stage
    # 0.62 s -> 1.86 s at 6 tasks). Spread the materialized edge
    # table to full parallelism first — one cheap edge-sized
    # exchange; on a real cluster scan the stream is already
    # thousands of splits wide and the helper no-ops.
    spark = oriented.sparkSession
    target = max(spark.sparkContext.defaultParallelism,
                 int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    oriented = oriented.repartition(target, "src", "dst")
    return oriented.localCheckpoint(eager=True)


#: Broadcast gate for triangle_counts' adjacency table. The adjacency
#: payload is one copy of the edge list (~8 B/edge + per-row array
#: overhead, estimated at 24 B/edge below to be conservative), and a
#: broadcast materializes it IN FULL on the driver and on every
#: executor — so the cap is sized as a small fraction of a typical
#: 4-8 GiB executor heap, not of the cluster. 256 MiB ≈ 1e7 edges;
#: a crawl graph's 1e11 edges (≈2.4 TB estimated) routes to the
#: bucketed/shuffle path automatically.
TRIANGLE_BROADCAST_CAP = 256 << 20
_ADJ_BYTES_PER_EDGE = 24


def triangle_counts(edges: DataFrame, a: str = "a", b: str = "b", *,
                    strategy: str = "auto",
                    broadcast_cap_bytes: int = TRIANGLE_BROADCAST_CAP,
                    content_key: str | None = None,
                    assume_distinct: bool = False) -> DataFrame:
    """Per-node triangle counts over an undirected edge list — the
    clustering/cohesion primitive (co-occurrence tightness, spam-farm
    detection on link graphs).

    The scale shape is the degree-oriented node-iterator (Schank &
    Wagner 2005): every edge is directed from its (degree, id)-smaller
    endpoint to the larger, so each wedge is enumerated at exactly one
    node and a node's join fan-out is its OUT-degree, which the
    orientation bounds by O(sqrt(E)) on any graph — the naive
    neighbor-pairs form explodes quadratically at a hot vertex (a
    celebrity node with 1e6 neighbors = 1e12 wedges; oriented, the
    same node contributes almost none). Two degree joins + ONE
    wedge-closure join + one aggregate, all map-side-combinable; no
    windows, no collects. (r13 fusion: the probe stream is derived
    by exploding the adjacency itself, so the r12 src-side adjacency
    join is gone — see _triangle_common.)

    Physical strategy for attaching the dst-side out-adjacency array
    (``strategy``):

    - ``"broadcast"``: ship the node-sized (node, nbrs) table to every
      executor so the oriented edge stream never shuffles its array
      payloads. Fastest while the adjacency fits executor memory
      (it is what turned the 112 s wedge-JOIN form into 7-9 s at
      sf0.1), but the payload is O(E) — a hard scale boundary.
    - ``"shuffle"``: no broadcast anywhere — the wedge join runs as a
      sort-merge join. With ``content_key`` set, the adjacency table
      is staged as a content-addressed BUCKETED table
      (operators/bucketing.py, exactly the ``pagerank_micro``
      pattern): the join reads the adj side off its bucketed layout
      with NO exchange and NO sort, and only the exploded probe
      stream exchanges into adj's existing bucketing. This is the
      100 TB path: per-executor memory holds one partition of the
      adjacency, never all of it.
      Pinned by tests/test_graph.py::test_triangles_bucketed_plan.
    - ``"auto"`` (default): estimate the adjacency payload from the
      edge count (``_ADJ_BYTES_PER_EDGE`` per edge) and pick
      ``broadcast`` iff it is at most ``broadcast_cap_bytes``.

    Output: (node, n_tri) for every node in >= 1 triangle; each
    triangle credits all three of its corners once. Values are
    strategy-independent (pinned by test_triangles_strategies_agree).

    Cost note on ``"auto"``: the payload estimate is one extra Spark
    job per invocation (a count of the checkpointed normalized edge
    table — a local scan, but still a job). Callers that already
    know their graph's size should pass ``strategy="broadcast"`` or
    ``strategy="shuffle"`` explicitly and skip the probe entirely.

    The chosen strategy is reported driver-side as a plain Python
    attribute ``triangle_strategy`` on the RETURNED DataFrame object
    only — any subsequent transformation (``.select``, ``.filter``,
    caching helpers) returns a NEW DataFrame and silently drops it,
    as does ``kcore``'s ``kcore_converged``. Read the attribute off
    the direct return value before transforming, or don't rely on it
    programmatically (it is introspection/test surface, never a
    correctness signal — for a hard guarantee on kcore use
    ``strict=True``, which raises instead of flagging).
    """
    if strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"strategy must be auto|broadcast|shuffle, "
                         f"got {strategy!r}")
    spark = edges.sparkSession
    # r12 third pass (guide §1 "don't compute what the plan won't
    # read"), tightened in r13: on the bucketed path with the
    # content-addressed adjacency already staged, the normalize/
    # orient pipeline's output is never read — every warm invocation
    # would pay the full pair-base + degree-join + checkpoint chain
    # (~2 s at sf0.1) for nothing. Build the normalized edge table
    # lazily, once, only for the consumers that read it (auto's size
    # probe and the adjacency builds).
    _e_memo: list = []

    def _e() -> DataFrame:
        if not _e_memo:
            _e_memo.append(
                _normalized_undirected(edges, a, b, assume_distinct))
        return _e_memo[0]

    def _adj(orient: DataFrame) -> DataFrame:
        # r12 third pass (guide §2.5): the adjacency aggregate's
        # ENSURE_REQUIREMENTS exchange AQE-coalesces to ~3 partitions
        # (the oriented edges are small in BYTES), so the compute-
        # heavy collect_list + sort_array — and, since the r13
        # fusion, the exploded wedge-closure stage that rides the
        # adjacency's partitioning — would run ~3-wide. An explicit
        # repartition by the group key is never coalesced, and the
        # aggregate reuses its partitioning — same exchange count,
        # full width (traced ~0.1 s).
        target = max(spark.sparkContext.defaultParallelism,
                     int(spark.conf.get("spark.sql.shuffle.partitions",
                                        "32")))
        return (orient.repartition(target, F.col("src"))
                .groupBy(F.col("src").alias("node")).agg(
                    F.sort_array(F.collect_list("dst")).alias("nbrs")))

    if strategy == "auto":
        # the normalized table is checkpointed, so the count is a
        # cheap local scan; |oriented| == |normalized| (orientation
        # is a per-row projection), so the probe never forces the
        # orientation pipeline. The estimate errs high (array/row
        # overhead folded into the per-edge constant) so "auto" never
        # broadcasts past the cap.
        est = _e().count() * _ADJ_BYTES_PER_EDGE
        strategy = "broadcast" if est <= broadcast_cap_bytes else "shuffle"
    # edge-iterator over OUT-adjacency arrays: for oriented edge
    # (u -> v) the triangle's third corners are N+(u) ∩ N+(v), and
    # each triangle is found exactly once at its (deg,id)-least base
    # edge (its other two edges can't see the closing vertex in both
    # out-sets). The orientation bounds every out-array at O(sqrt(E))
    # — that is both the wedge-work bound AND the per-row state
    # bound of the collect_list. Physically this beats the
    # wedge-JOIN form by a wide margin in Spark: the sum-of-squared-
    # out-degrees intermediate is never materialized as join rows
    # (144M rows at the sf0.1 co-purchase graph — measured 112 s as
    # a sort-merge wedge join); it runs as vectorized array_intersect
    # over edge-sized streams instead (measured 7-9 s warm for the
    # whole query on the same graph), and only the triangle-sized
    # corner explode leaves the row.
    if strategy == "shuffle" and content_key is not None:
        import hashlib

        from mr_mpi_blast_spark.operators.bucketing import \
            ensure_bucketed_table
        shuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        digest = hashlib.md5(content_key.encode()).hexdigest()[:12]
        # r13 (probe-side fusion, guide §2.4): the oriented edge
        # stream is re-derived by exploding the adjacency itself, so
        # the separately-staged tri_edges bucketed table — whose only
        # job was feeding the src-side adjacency join — is gone
        # entirely: one staged table instead of two (cold staging
        # halves), and the warm plan reads tri_adj twice (explode
        # side + dst join side) with ONE join instead of two.
        adj = spark.table(ensure_bucketed_table(
            spark,
            lambda: _adj(_orient_from(_e(), materialize=False)),
            f"tri_adj_{digest}", "node", shuf,
            f"tri_adj:{content_key}"))
        adj_probe = adj
        # merge hint: forbid Catalyst from re-introducing the very
        # broadcast this path exists to avoid (AQE may see a small
        # post-shuffle adj and flip the join). The join becomes SMJ;
        # on the bucketed layout the adj side needs no exchange/sort
        # at all and only the exploded probe stream exchanges into
        # adj's existing bucketing.
        adj_v = adj.hint("merge")
    elif strategy == "broadcast":
        # The orientation is read EXACTLY ONCE here (the adjacency
        # build — the r13 fusion derives the probe stream from the
        # adjacency), so it stays a lazy pipeline fused into the
        # build (materialize=False drops the r12 tail repartition +
        # orientation checkpoint: one edge-sized exchange and one
        # materialization job fewer). The node-sized adjacency IS
        # checkpointed: it feeds both the explode side and the
        # broadcast build, and collect_list's nondeterministic
        # pre-sort order blocks exchange reuse between two builds
        # (r12 trace: the duplicated shuffle+collect_list cost
        # ~0.6 s warm). A broadcast does not care about the
        # checkpoint stripping the hash partitioning.
        adj = _adj(_orient_from(_e(), materialize=False)) \
            .localCheckpoint(eager=True)
        adj_probe = adj
        # adj is NODE-sized with O(sqrt(E))-bounded arrays (total
        # payload = one copy of the edge list): while it fits, ship
        # it so the edge stream never shuffles its array payloads
        # (edge-count x out-degree longs — the dominant shuffle
        # volume otherwise)
        adj_v = F.broadcast(adj)
    else:
        # plain-shuffle path (no content key): the adjacency is built
        # TWICE (explode side + dst join side — collect_list's
        # nondeterministic pre-sort order blocks exchange reuse;
        # sort_array makes the VALUES of both builds identical), so
        # the orientation it reads twice IS materialized
        # (materialize=True: spread + localCheckpoint).
        #
        # Do NOT checkpoint adj here (r12, measured at the synthetic
        # sf1.0 decade): a checkpointed RDD loses its partitioning,
        # so BOTH merge-join sides re-exchange the edge-sized
        # adjacency payload — graph_triangles' sf1.0 time went
        # 31.7 s (each SMJ side consuming its own build's exchange in
        # place) to 92-130 s (one build + two full re-shuffles + lost
        # width). The duplicated aggregate is the cheaper evil,
        # exactly like the degree table in _orient_from.
        orient = _orient_from(_e(), materialize=True)
        adj = _adj(orient)
        adj_probe = adj
        adj_v = adj.hint("merge")
    common = _triangle_common(adj_probe, adj_v)
    # ONE pass over the wedge-closure rows (r12 optimization, guide
    # §2.4): each row credits src and dst with |ws| and every closing
    # corner with 1 — emitted as a single exploded contribution array
    # instead of a 3-way union over a localCheckpoint of `common`.
    # Same multiset of (node, k) credits, so the aggregate is
    # value-identical; drops one materialization job and two extra
    # reads of the join output.
    corners = common.select(F.explode(F.concat(
        F.array(F.struct(F.col("src").cast("long").alias("node"),
                         F.size("ws").alias("k")),
                F.struct(F.col("dst").cast("long").alias("node"),
                         F.size("ws").alias("k"))),
        F.expr("transform(ws, w -> struct(CAST(w AS BIGINT) AS node, "
               "1 AS k))"))).alias("c"))
    out = (corners.groupBy(F.col("c.node").alias("node"))
           .agg(F.sum("c.k").cast("long").alias("n_tri")))
    out.triangle_strategy = strategy  # driver-side introspection/tests
    return out


def _triangle_common(adj_probe: DataFrame,
                     adj_v: DataFrame) -> DataFrame:
    """The wedge-closure stage (un-checkpointed), r13 fused form:
    the oriented edge stream is RE-DERIVED from the adjacency itself
    — explode(nbrs) emits exactly one (src, dst) row per oriented
    edge, with the src-side out-array nu already on the row — so the
    r12 form's src-side adjacency join (probe JOIN adj ON src)
    disappears: ONE dst-side join instead of two, one fewer
    broadcast build / bucketed scan, and the probe read of the
    oriented edge table is gone (guide §2.4 — remove shuffles/joins
    outright). Value-exact vs the r12 two-join form: explode over
    the adjacency enumerates precisely the distinct oriented edge
    set (nbrs is collect_list over distinct oriented edges), the
    src-side inner join never dropped anything (every src has, by
    construction, at least the out-edge that produced the probe
    row), and the dst-side inner join is unchanged. Split out so
    tests/test_graph.py can pin the bucketed no-broadcast plan shape
    directly (the _pagerank_round pattern)."""
    probe = adj_probe.select(F.col("node").alias("src"),
                             F.col("nbrs").alias("nu"),
                             F.explode("nbrs").alias("dst"))
    return (probe
            .join(adj_v.select(F.col("node").alias("dst"),
                               F.col("nbrs").alias("nv")), "dst")
            .select("src", "dst",
                    F.array_intersect("nu", "nv").alias("ws"))
            .filter(F.size("ws") > 0))


def kcore(edges: DataFrame, k: int, rounds: int = 12,
          a: str = "a", b: str = "b", strict: bool = False,
          assume_distinct: bool = False) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop
    every node of degree < k (with its edges) until stable — the
    dense-subgraph primitive (cohesive communities; spam/link-farm
    cores on web graphs).

    Fixed-round contract: the result after ``rounds`` peels, with an
    Observation-based early stop that is a pure optimization — once a
    round removes nothing the state is a fixed point, so stopping
    early equals running all rounds, and the DuckDB oracle can replay
    the SAME unrolled round count (kcore_sql) for an exact match
    whether or not the peel converged within the budget.

    Per round: one degree aggregate + two semi-joins, all key-equi,
    edge-sized; lineage truncated per round (localCheckpoint — the
    pagerank/bpe lesson). Output: (node, core_deg) for nodes
    surviving all rounds, with their degree in the surviving
    subgraph.

    Convergence signal: the loop already observes per-round edge
    counts, so it KNOWS whether the budget reached the fixed point.
    The returned DataFrame carries ``kcore_converged`` (bool,
    driver-side attribute); a caller asking for "the" k-core of a
    deep graph (a long chain needs ~n/2 rounds) can pass
    ``strict=True`` to get a RuntimeError instead of a silent
    superset when ``rounds`` exhausts before convergence. The
    fixed-round result itself is unchanged either way — the DuckDB
    oracle replays the same budget.

    ATTRIBUTE FRAGILITY (r11 advisory): ``kcore_converged`` lives on
    the returned DataFrame OBJECT, not on its plan — any subsequent
    transformation returns a new DataFrame without it. Read the flag
    off the direct return value before ``.select``/``.filter``/
    caching, or use ``strict=True`` for an unlosable signal.
    """
    from pyspark.sql import Observation
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    alive = _normalized_undirected(edges, a, b, assume_distinct)
    # carry the edge count across rounds: round i's observed size IS
    # round i+1's "before" — one count up front, zero per-round count
    # jobs
    before = alive.count()
    converged = before == 0  # an empty graph is trivially its fixed point
    for _ in range(rounds):
        deg = (alive.select(F.col("x").alias("node"))
               .union(alive.select(F.col("y").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
        keep = deg.filter(F.col("d") >= k).select("node")
        obs = Observation()
        alive = (alive
                 .join(keep.withColumnRenamed("node", "x"), "x",
                       "left_semi")
                 .join(keep.withColumnRenamed("node", "y"), "y",
                       "left_semi")
                 .observe(obs, F.count(F.lit(1)).alias("m"))
                 .localCheckpoint(eager=True))
        m = int(obs.get["m"] or 0)
        if m == before or m == 0:
            converged = True
            break  # fixed point: further rounds are no-ops
        before = m
    if not converged:
        # the budget's LAST round may have landed exactly on the
        # fixed point (it changed something, so the loop can't know)
        # — one edge-sized degree probe decides, instead of reporting
        # a false not-converged on a fully-peeled result
        deg = (alive.select(F.col("x").alias("node"))
               .union(alive.select(F.col("y").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
        converged = deg.filter(F.col("d") < k).isEmpty()
    if strict and not converged:
        raise RuntimeError(
            f"kcore: round budget {rounds} exhausted before the peel "
            f"reached a fixed point ({before} edges still alive and "
            f"shrinking) — the result would be a superset of the "
            f"{k}-core; raise rounds")
    deg = (alive.select(F.col("x").alias("node"))
           .union(alive.select(F.col("y").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("core_deg")))
    out = deg.filter(F.col("core_deg") >= k)
    out.kcore_converged = converged
    return out


def components_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB oracle for connected components: the unrolled
    ``rounds``-round replay of operators/dedup.connected_components'
    min-label propagation + pointer jumping over ``edges_sql``
    (columns a, b). Each round is deterministic, so engine and oracle
    states are identical round-for-round; the engine's early stop is a
    fixed point (changed == 0 means every later round is a no-op), so
    calling the engine with ``max_iter == rounds`` matches this replay
    whether or not it converged early — the kcore_sql contract.

    MATERIALIZED CTEs throughout (the kcore lesson: DuckDB's default
    inlining re-expands multiply-referenced round CTEs exponentially).
    """
    sql = [f"""
WITH sym AS MATERIALIZED (
  SELECT a, b FROM ({edges_sql})
  UNION ALL
  SELECT b, a FROM ({edges_sql})),
l0 AS MATERIALIZED (
  SELECT DISTINCT a AS node, a AS lab FROM sym)"""]
    for i in range(1, rounds + 1):
        p = i - 1
        sql.append(f""",
n{i} AS (SELECT e.a AS node, min(l.lab) AS minn
         FROM sym e JOIN l{p} l ON e.b = l.node GROUP BY e.a),
m{i} AS MATERIALIZED (
  SELECT l.node, least(l.lab, coalesce(n.minn, l.lab)) AS lab
  FROM l{p} l LEFT JOIN n{i} n ON l.node = n.node),
l{i} AS MATERIALIZED (
  SELECT m.node, coalesce(j.lab, m.lab) AS lab
  FROM m{i} m LEFT JOIN m{i} j ON m.lab = j.node)""")
    sql.append(f"\nSELECT node, lab AS cluster FROM l{rounds}")
    return "".join(sql)


def kcore_sql(edges_sql: str, k: int, rounds: int = 12) -> str:
    """DuckDB oracle: the unrolled ``rounds``-round peel over
    ``edges_sql`` (columns a, b) — identical to kcore() by the
    fixed-point argument in its docstring."""
    # every a{{i}} is referenced by THREE later CTEs and k{{i}} by two:
    # without MATERIALIZED, DuckDB's default CTE inlining expands the
    # chain exponentially (2^rounds scans of the base table — observed
    # as a too-many-open-files explosion at 12 rounds)
    sql = [f"""
WITH a0 AS MATERIALIZED (
  SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
  FROM ({edges_sql}) WHERE a <> b)"""]
    for i in range(1, rounds + 1):
        p = i - 1
        sql.append(f""",
d{i} AS (SELECT node, count(*) AS d FROM (
           SELECT x AS node FROM a{p}
           UNION ALL SELECT y FROM a{p}) GROUP BY node),
k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {k}),
a{i} AS MATERIALIZED (SELECT x, y FROM a{p}
         WHERE x IN (SELECT node FROM k{i})
           AND y IN (SELECT node FROM k{i}))""")
    sql.append(f"""
SELECT node, count(*) AS core_deg FROM (
  SELECT x AS node FROM a{rounds}
  UNION ALL SELECT y FROM a{rounds}) GROUP BY node
HAVING count(*) >= {k}""")
    return "".join(sql)
