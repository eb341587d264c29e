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
    # exactly the two node-sized sorts (SMJ sides fed by exchanges);
    # a third would mean a bucketed side got re-sorted
    assert len(re.findall(r"\n\s*(?:\+|:)- Sort ", plan)) == 2


@pytest.mark.slow
def test_pagerank_plan_depth_constant_in_iterations(spark):
    """The bpe_learn lesson applied here: per-round checkpointing must
    keep plan depth O(1) in n_iter — a 24-iteration result's plan is
    the SAME flat checkpoint scan as a 6-iteration one (no joins, no
    per-round lineage accumulation), asserted on the plan itself
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
