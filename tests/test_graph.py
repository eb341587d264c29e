"""PageRank (operators/graph.py): value parity against a pure-Python
replay of the micro-integer update rule, cross-path determinism
(bucketed staging vs localCheckpoint), and the per-iteration plan
shape — the edge table must come straight off its bucketed layout
with no exchange and no sort, leaving only node-sized shuffles."""

import re

import pytest
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.graph import (MICRO, _pagerank_round,
                                                pagerank_micro)

# src, dst; node 5 is dangling (receives from 1, emits nothing)
EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (4, 3), (1, 5)]


def py_pagerank(edges, n_iter, d_micro=850_000):
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    base = (MICRO - d_micro) // n
    rank = {v: MICRO // n for v in nodes}
    for _ in range(n_iter):
        nxt = {v: base for v in nodes}
        for s, t in edges:
            nxt[t] += (rank[s] * d_micro) // (MICRO * outdeg[s])
        rank = nxt
    return rank


@pytest.mark.parametrize("n_iter", [1, 3, 7])
def test_pagerank_matches_python_replay(spark, n_iter):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank_micro"]
           for r in pagerank_micro(edges, n_iter=n_iter).collect()}
    assert got == py_pagerank(EDGES, n_iter)


def test_pagerank_dangling_mass_leaks_deterministically(spark):
    # node 5 has no out-edges: it accumulates rank but contributes
    # nothing — totals shrink, values stay exactly reproducible
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    a = pagerank_micro(edges, n_iter=4).collect()
    b = pagerank_micro(edges, n_iter=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    total = sum(r["rank_micro"] for r in a)
    assert 0 < total < MICRO  # leaked, not conserved — by contract


def test_pagerank_validation(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    with pytest.raises(ValueError, match="n_iter"):
        pagerank_micro(edges, n_iter=0)
    with pytest.raises(ValueError, match="damping_micro"):
        pagerank_micro(edges, damping_micro=MICRO)
    with pytest.raises(ValueError, match="ckpt_every"):
        pagerank_micro(edges, ckpt_every=0)


@pytest.mark.parametrize("ckpt_every", [1, 2, 5, 8])
def test_pagerank_ckpt_cadence_invariant(spark, ckpt_every):
    """r12: lineage-truncation cadence is a pure execution knob — the
    SAME exact int64 algebra runs either way, so every cadence (every
    round, mid-loop boundary, single final chain) must match the
    python replay bit-for-bit."""
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank_micro"]
           for r in pagerank_micro(edges, n_iter=5,
                                   ckpt_every=ckpt_every).collect()}
    assert got == py_pagerank(EDGES, 5)


def test_pagerank_bucketed_path_value_identical(spark, tmp_path,
                                                monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    plain = sorted(map(tuple, pagerank_micro(edges, n_iter=3).collect()))
    bucketed = sorted(map(tuple, pagerank_micro(
        edges, n_iter=3, content_key="test-graph-tiny").collect()))
    assert plain == bucketed == sorted(py_pagerank(EDGES, 3).items())


def test_pagerank_iteration_plan(spark, tmp_path, monkeypatch):
    """The 100 TB contract: per iteration, the EDGE table is read off
    its bucketed layout (no Exchange, no Sort above its scan) and the
    only exchanges are the two node-sized ones (rank routing + the
    contribution aggregate)."""
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    import hashlib

    from mr_mpi_blast_spark.operators.bucketing import \
        ensure_bucketed_table

    e = (spark.createDataFrame(list(EDGES), ["src", "dst"])
         .select(F.col("src").cast("long").alias("src"),
                 F.col("dst").cast("long").alias("dst")).distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes_df = (e.select(F.col("src").alias("node"))
                .union(e.select(F.col("dst").alias("node"))).distinct())
    shuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    dg = hashlib.md5(b"test-graph-plan").hexdigest()[:12]
    ed = spark.table(ensure_bucketed_table(
        spark, lambda: e.join(deg, "src"), f"pr_edges_{dg}", "src",
        shuf, "pr_edges:test-graph-plan"))
    nodes = spark.table(ensure_bucketed_table(
        spark, lambda: nodes_df, f"pr_nodes_{dg}", "node",
        shuf, "pr_nodes:test-graph-plan"))
    n = nodes.count()
    # a mid-loop round: ranks arrive partitioning-less (checkpointed)
    ranks = (nodes.withColumn("rank_micro",
                              F.lit(MICRO // n).cast("long"))
             .localCheckpoint(eager=True))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        new = _pagerank_round(ed, nodes, ranks, 1, 850_000)
        plan = new._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    # both table scans come off the bucketed layout
    for line in plan.splitlines():
        if "FileScan parquet" in line and "Bucketed: true" not in line:
            raise AssertionError(f"non-bucketed scan in plan: {line}")
    assert plan.count("Bucketed: true") == 2
    # r12 round shape: the node table is UNIONed into the contribution
    # stream as zero seeds and folded in the same aggregate — exactly
    # ONE join per round (the rank->edge attach); a second join would
    # mean the old contrib-to-nodes SMJ came back
    assert len(re.findall(r"Join", plan)) == 1
    # at most the one sort the rank->edge SMJ needs on the rank side
    # (the bucketed edge side is pre-sorted; more sorts would mean a
    # bucketed side got re-sorted)
    assert len(re.findall(r"\n\s*(?:\+|:)- Sort ", plan)) <= 2


@pytest.mark.slow
def test_pagerank_plan_depth_constant_in_iterations(spark):
    """The bpe_learn lesson applied here: the unconditional FINAL-round
    checkpoint (lineage is otherwise truncated only every ckpt_every
    rounds) must keep the returned plan depth O(1) in n_iter — a
    24-iteration result's plan is the SAME flat checkpoint scan as a
    6-iteration one (no joins, no per-round lineage accumulation),
    asserted on the plan itself
    rather than a wall-clock ratio (timing gates flake on a loaded
    box — the cache-release de-flake lesson). Values at 24 rounds
    still match the python replay exactly."""
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    r6 = pagerank_micro(edges, n_iter=6)
    r24 = pagerank_micro(edges, n_iter=24)
    got = {r["node"]: r["rank_micro"] for r in r24.collect()}
    assert got == py_pagerank(EDGES, 24)

    def shape(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "Exchange" not in plan, plan
        return plan.count("\n")

    # O(1): identical (tiny) plan depth regardless of iteration count
    assert shape(r24) == shape(r6) <= 3


def py_triangles(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        x, y = min(a, b), max(a, b)
        es.add((x, y))
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    out = {}
    for x, y in es:
        for z in adj[x] & adj[y]:
            if z > y:  # count each triangle once (x < y < z)
                for v in (x, y, z):
                    out[v] = out.get(v, 0) + 1
    return out


def test_triangles_known_graphs(spark):
    from mr_mpi_blast_spark.operators.graph import triangle_counts
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    star = [(0, i) for i in range(1, 9)]  # celebrity vertex: 0 triangles
    path = [(1, 2), (2, 3), (3, 4)]
    for edges, want in [(k4, {1: 3, 2: 3, 3: 3, 4: 3}),
                        (star, {}), (path, {})]:
        df = spark.createDataFrame(edges, ["a", "b"])
        got = {r.node: r.n_tri for r in triangle_counts(df).collect()}
        assert got == want, (edges, got)


def test_triangles_random_vs_python(spark):
    from mr_mpi_blast_spark.operators.graph import triangle_counts
    import random
    random.seed(21)
    edges = list({(random.randint(0, 30), random.randint(0, 30))
                  for _ in range(160)})
    # include reversed duplicates and self-loops: must be normalized
    noisy = edges + [(b, a) for a, b in edges[:40]] + [(5, 5)]
    df = spark.createDataFrame(noisy, ["a", "b"])
    got = {r.node: r.n_tri for r in triangle_counts(df).collect()}
    assert got == py_triangles(edges)


def test_assume_distinct_parity(spark):
    """assume_distinct (r12) is physical only: on input that honors
    the contract (distinct (min,max)-oriented pairs, no self-loops —
    the co-purchase pair-base shape) triangle_counts and kcore must
    return exactly what the default normalizing path returns."""
    from mr_mpi_blast_spark.operators.graph import kcore, triangle_counts
    import random
    random.seed(33)
    edges = sorted({(min(a, b), max(a, b)) for a, b in
                    ((random.randint(0, 30), random.randint(0, 30))
                     for _ in range(200)) if a != b})
    df = spark.createDataFrame(edges, ["a", "b"])
    tri_plain = {r.node: r.n_tri for r in triangle_counts(df).collect()}
    tri_fast = {r.node: r.n_tri
                for r in triangle_counts(
                    df, assume_distinct=True).collect()}
    assert tri_fast == tri_plain
    kc_plain = {r.node: r.core_deg for r in kcore(df, 2).collect()}
    kc_fast = {r.node: r.core_deg
               for r in kcore(df, 2, assume_distinct=True).collect()}
    assert kc_fast == kc_plain


def test_triangles_strategies_agree(spark, tmp_path, monkeypatch):
    """The strategy switch is physical only: broadcast, plain-shuffle,
    and bucketed-shuffle paths must produce identical values (and the
    python replay's)."""
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    from mr_mpi_blast_spark.operators.graph import triangle_counts
    import random
    random.seed(77)
    edges = list({(random.randint(0, 40), random.randint(0, 40))
                  for _ in range(220)})
    df = spark.createDataFrame(edges, ["a", "b"])
    want = py_triangles(edges)
    for kwargs in ({"strategy": "broadcast"},
                   {"strategy": "shuffle"},
                   {"strategy": "shuffle", "content_key": "tri-test-77"}):
        got = {r.node: r.n_tri
               for r in triangle_counts(df, **kwargs).collect()}
        assert got == want, kwargs


def test_triangles_auto_switch_and_validation(spark):
    """auto = broadcast under the cap, shuffle above it (estimated
    from the oriented edge count); bogus strategy fails loudly."""
    from mr_mpi_blast_spark.operators.graph import triangle_counts
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(k4, ["a", "b"])
    small = triangle_counts(df)  # 6 edges * 24 B << default cap
    assert small.triangle_strategy == "broadcast"
    big = triangle_counts(df, broadcast_cap_bytes=1)
    assert big.triangle_strategy == "shuffle"
    assert ({r.node: r.n_tri for r in small.collect()}
            == {r.node: r.n_tri for r in big.collect()}
            == {1: 3, 2: 3, 3: 3, 4: 3})
    with pytest.raises(ValueError, match="strategy"):
        triangle_counts(df, strategy="hash")


def test_triangles_bucketed_plan(spark, tmp_path, monkeypatch):
    """The 100 TB contract for the beyond-broadcast path (r13 fused
    form): NO broadcast anywhere; the single wedge-closure join is
    sort-merge; its adj side reads the adjacency table straight off
    the bucketed layout (no exchange, no sort above that scan), and
    only the exploded probe stream — itself derived from a second
    bucketed scan of the SAME adjacency table, no oriented-edge
    table exists anymore — exchanges into adj's existing bucketing:
    two bucketed scans, one join, one exchange, one sort total."""
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    import hashlib

    from mr_mpi_blast_spark.operators.graph import (_triangle_common,
                                                    triangle_counts)
    import random
    random.seed(5)
    edges = list({(random.randint(0, 30), random.randint(0, 30))
                  for _ in range(120)})
    df = spark.createDataFrame(edges, ["a", "b"])
    ck = "tri-plan-test"
    # one run stages + registers the content-addressed bucketed table
    triangle_counts(df, strategy="shuffle", content_key=ck).collect()
    dg = hashlib.md5(ck.encode()).hexdigest()[:12]
    adj = spark.table(f"tri_adj_{dg}")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (_triangle_common(adj, adj.hint("merge"))
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastExchange" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("SortMergeJoin") == 1
    for line in plan.splitlines():
        if "FileScan parquet" in line and "Bucketed: true" not in line:
            raise AssertionError(f"non-bucketed scan in plan: {line}")
    assert plan.count("Bucketed: true") == 2
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\n\s*(?:\+|:)- Sort ", plan)) == 1
    # and the oriented-edge table is no longer staged at all
    assert not spark.catalog.tableExists(f"tri_edges_{dg}")


def test_kcore_peeling_cascade(spark):
    """Pendant chain peels away in CASCADE (each removal exposes the
    next), leaving exactly the triangle as the 2-core — and a k above
    the densest core empties the graph."""
    from mr_mpi_blast_spark.operators.graph import kcore
    edges = [(1, 2), (2, 3), (3, 1),           # triangle
             (3, 4), (4, 5), (5, 6)]           # pendant chain
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.node: r.core_deg for r in kcore(df, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    assert kcore(df, 3).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="k must"):
        kcore(df, 0)
    with _pt.raises(ValueError, match="rounds"):
        kcore(df, 2, rounds=0)


def test_kcore_early_stop_equals_full_unroll(spark):
    """The fixed-point contract: two different round budgets (12 and
    26, both early-stopped at convergence) produce identical results,
    and both equal the unbounded python peel."""
    from mr_mpi_blast_spark.operators.graph import kcore
    import random
    random.seed(33)
    edges = list({(random.randint(0, 25), random.randint(0, 25))
                  for _ in range(70)})
    df = spark.createDataFrame(edges, ["a", "b"])

    def py_kcore(es, k):
        es = {(min(a, b), max(a, b)) for a, b in es if a != b}
        while True:
            deg = {}
            for x, y in es:
                deg[x] = deg.get(x, 0) + 1
                deg[y] = deg.get(y, 0) + 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                return deg
            es = {(x, y) for x, y in es
                  if x not in drop and y not in drop}

    want = py_kcore(edges, 3)
    a = {r.node: r.core_deg for r in kcore(df, 3, rounds=12).collect()}
    b = {r.node: r.core_deg for r in kcore(df, 3, rounds=26).collect()}
    assert a == b == want


def test_kcore_convergence_signal(spark):
    """A 30-node path peels 2 endpoints per round, so its (empty)
    2-core needs ~15 rounds: a 5-round budget must SAY it didn't
    converge (attribute False; strict=True raises), a 20-round budget
    converges to the empty core. The returned rows are the same
    fixed-round contract either way."""
    from mr_mpi_blast_spark.operators.graph import kcore
    path = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(path, ["a", "b"])
    partial = kcore(df, 2, rounds=5)
    assert partial.kcore_converged is False
    assert partial.count() > 0          # honest superset, flagged
    with pytest.raises(RuntimeError, match="fixed point"):
        kcore(df, 2, rounds=5, strict=True)
    full = kcore(df, 2, rounds=20)
    assert full.kcore_converged is True
    assert full.count() == 0
    # strict passes when the budget suffices
    assert kcore(df, 2, rounds=20, strict=True).count() == 0


def test_kcore_converged_when_budget_lands_on_fixed_point(spark):
    """The last budgeted round may itself REACH the fixed point (it
    changed something, so the loop's no-change detector can't see it)
    — the post-loop degree probe must still report converged, and
    strict must not raise: triangle + one pendant, k=2, rounds=1
    peels exactly the pendant and leaves the exact 2-core."""
    from mr_mpi_blast_spark.operators.graph import kcore
    edges = [(1, 2), (2, 3), (3, 1), (1, 4)]
    df = spark.createDataFrame(edges, ["a", "b"])
    out = kcore(df, 2, rounds=1, strict=True)   # must NOT raise
    assert out.kcore_converged is True
    assert {r.node: r.core_deg for r in out.collect()} \
        == {1: 2, 2: 2, 3: 2}


def py_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_random_vs_union_find(spark):
    from mr_mpi_blast_spark.operators.dedup import connected_components
    import random
    random.seed(11)
    edges = list({(random.randint(0, 60), random.randint(0, 60))
                  for _ in range(80)})
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.node: r.cluster
           for r in connected_components(df, "a", "b").collect()}
    assert got == py_components(edges)


def test_components_chain_converges_logarithmically(spark):
    """Pointer jumping's O(log n) contract: a 64-node chain (diameter
    63 — min-label propagation alone would need ~63 rounds) must fully
    converge within an 8-round budget."""
    from mr_mpi_blast_spark.operators.dedup import connected_components
    chain = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(chain, ["a", "b"])
    got = {r.node: r.cluster
           for r in connected_components(df, "a", "b",
                                         max_iter=8).collect()}
    assert got == {i: 0 for i in range(64)}


def test_components_oracle_replay_matches_engine(spark):
    """components_sql is a round-for-round replay: even on a graph too
    deep to converge within the budget, engine (max_iter=R) and oracle
    (R unrolled rounds) states are identical."""
    import duckdb

    from mr_mpi_blast_spark.operators.dedup import connected_components
    from mr_mpi_blast_spark.operators.graph import components_sql
    chain = [(i, i + 1) for i in range(40)] + [(100, 101), (101, 102)]
    df = spark.createDataFrame(chain, ["a", "b"])
    for rounds in (2, 4, 8):   # 2 is mid-propagation, 8 is converged
        got = {(r.node, r.cluster)
               for r in connected_components(
                   df, "a", "b", max_iter=rounds).collect()}
        values = ", ".join(f"({a}, {b})" for a, b in chain)
        sql = components_sql(
            f"SELECT * FROM (VALUES {values}) AS t(a, b)", rounds)
        want = {(int(a), int(b))
                for a, b in duckdb.connect().execute(sql).fetchall()}
        assert got == want, rounds


def test_components_round1_fusion_state(spark):
    """The r12 round-1 fusion (the seeded stream built straight from
    the edge list, no identity-label join, per-edge duplicated self
    rows) must leave round-1 state exactly lab1 = jump(min(self U
    neighbors)) — pinned against a hand-computed graph where the jump
    step actually fires on round 1, and against the unrolled oracle."""
    import duckdb

    from mr_mpi_blast_spark.operators.dedup import connected_components
    from mr_mpi_blast_spark.operators.graph import components_sql
    # chain 5-6-7-8 (jump fires: min-labels form a pointer chain),
    # triangle 0-1-2, isolated edge 10-11
    edges = [(5, 6), (6, 7), (7, 8), (0, 1), (1, 2), (0, 2), (10, 11)]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {(r.node, r.cluster)
           for r in connected_components(df, "a", "b",
                                         max_iter=1).collect()}
    # min(self U neighbors): 5->5 6->5 7->6 8->7; jump lab[lab]:
    # 7's lab 6 -> 6's lab 5; 8's lab 7 -> 7's pre-jump lab 6
    want_hand = {(0, 0), (1, 0), (2, 0), (5, 5), (6, 5), (7, 5),
                 (8, 6), (10, 10), (11, 10)}
    assert got == want_hand
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = components_sql(f"SELECT * FROM (VALUES {values}) AS t(a, b)", 1)
    want = {(int(a), int(b))
            for a, b in duckdb.connect().execute(sql).fetchall()}
    assert got == want


def test_components_zero_rounds_identity(spark):
    """max_iter=0 (labels never built by the loop) falls back to the
    identity labeling over every node that appears in an edge."""
    from mr_mpi_blast_spark.operators.dedup import connected_components
    df = spark.createDataFrame([(1, 2), (2, 3)], ["a", "b"])
    got = {(r.node, r.cluster)
           for r in connected_components(df, "a", "b",
                                         max_iter=0).collect()}
    assert got == {(1, 1), (2, 2), (3, 3)}
