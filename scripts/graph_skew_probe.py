"""Graph-family skew probe (r10): a power-law graph with one CELEBRITY
vertex — the hot-key shape every real link/co-occurrence graph has —
measured through triangle_counts (both physical strategies) and
pagerank_micro, with the structural bound that makes them skew-safe
asserted from the data, not narrated:

1. Degree orientation caps the wedge fan-out. The celebrity has
   ``HUB_DEG`` undirected neighbors, so the naive neighbor-pairs form
   owes HUB_DEG^2/2 wedges at that one vertex (~1.3e9 at 50k — the
   probe would not finish). After (degree, id) orientation its
   OUT-degree collapses to ~0 (every neighbor has smaller degree, so
   edges point INTO the hub... i.e. hub->x only for the rare
   same-degree tiebreak), and the global max out-degree stays
   O(sqrt(E)) — printed as `max_out_deg` vs `sqrt_e` and asserted
   within a small factor.
2. Both triangle strategies (broadcast and shuffle/no-broadcast) run
   in seconds on the skewed graph and agree exactly — the per-node
   wedge work is orientation-bounded regardless of the physical plan.
3. pagerank_micro's per-iteration exchange is NODE-sized: the
   celebrity's 50k in-edges are one grouped sum like any other node's
   (map-side combined), so iteration wall time with the hub ~= without
   it (ratio printed; the probe asserts < 2x).

Graph: ``N_NODES`` vertices; node i links to i/2 and i/3 ("rich get
richer": early nodes accumulate degree power-law-ishly) plus a stride
edge for connectivity; the celebrity is node 0 connected to the first
``HUB_DEG`` odd nodes. Deterministic, no RNG needed.

Run: python scripts/graph_skew_probe.py   (local[32], ~2 min)
Prints one JSON line; recorded in PLANS.md round-10 section.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_NODES = 200_000
HUB_DEG = 50_000


def synth_graph(spark: SparkSession) -> DataFrame:
    """Deterministic power-law-ish edge list with a celebrity hub."""
    ids = spark.range(2, N_NODES)
    base = (ids.select(F.col("id").alias("a"),
                       (F.col("id") / 2).cast("long").alias("b"))
            .union(ids.select(F.col("id").alias("a"),
                              (F.col("id") / 3).cast("long").alias("b")))
            .union(ids.select(F.col("id").alias("a"),
                              ((F.col("id") + 7) % N_NODES).alias("b"))))
    hub = spark.range(HUB_DEG).select(
        F.lit(0).cast("long").alias("a"),
        (2 * F.col("id") + 1).alias("b"))
    return base.union(hub).filter(F.col("a") != F.col("b"))


def main() -> None:
    from mr_mpi_blast_spark.operators.graph import (pagerank_micro,
                                                    triangle_counts)
    from mr_mpi_blast_spark.session import get_spark

    spark = get_spark("graph_skew_probe")
    edges = synth_graph(spark).localCheckpoint(eager=True)
    n_edges = edges.select(F.least("a", "b"), F.greatest("a", "b")) \
        .distinct().count()

    # structural bound: max oriented out-degree vs sqrt(E), measured
    # through the OPERATOR'S OWN orientation (orient_edges — the one
    # source of the rule; re-implementing it here would let the probe
    # silently diverge from what ships)
    from mr_mpi_blast_spark.operators.graph import orient_edges
    orient = orient_edges(edges)
    row = (orient.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
           .agg(F.max("od").alias("m")).first())
    hub_deg = (orient.select(F.col("src").alias("n"))
               .union(orient.select(F.col("dst").alias("n")))
               .filter(F.col("n") == 0).count())
    max_out = int(row["m"])
    sqrt_e = math.sqrt(2 * n_edges)

    timings = {}
    results = {}
    for strat in ("broadcast", "shuffle"):
        t0 = time.time()
        df = triangle_counts(edges, strategy=strat)
        total = df.agg(F.sum("n_tri")).first()[0]
        timings[f"triangles_{strat}_sec"] = round(time.time() - t0, 2)
        results[strat] = int(total or 0)

    # pagerank: hub vs no-hub iteration cost
    t0 = time.time()
    pagerank_micro(edges, src="a", dst="b", n_iter=5) \
        .write.format("noop").mode("overwrite").save()
    timings["pagerank_hub_sec"] = round(time.time() - t0, 2)
    no_hub = edges.filter(F.col("a") != 0).localCheckpoint(eager=True)
    t0 = time.time()
    pagerank_micro(no_hub, src="a", dst="b", n_iter=5) \
        .write.format("noop").mode("overwrite").save()
    timings["pagerank_nohub_sec"] = round(time.time() - t0, 2)

    ratio = timings["pagerank_hub_sec"] / max(timings["pagerank_nohub_sec"],
                                              0.01)
    out = {
        "metric": "graph_skew_probe",
        "n_edges": n_edges,
        "hub_degree": int(hub_deg),
        "max_out_deg": max_out,
        "sqrt_e": round(sqrt_e, 1),
        "orientation_bound_ok": max_out <= 3 * sqrt_e,
        "triangles_agree": results["broadcast"] == results["shuffle"],
        "triangle_total_x3": results["broadcast"],
        "pagerank_hub_over_nohub": round(ratio, 2),
        **timings,
    }
    print(json.dumps(out))
    assert out["orientation_bound_ok"], (max_out, sqrt_e)
    assert out["triangles_agree"], results
    assert ratio < 2.0, ratio


if __name__ == "__main__":
    main()
