"""Pin the MR-MPI engine-surface facades (SURVEY §2.8) that the oracle
gate can't reach: observe-metrics (A6/E16), clone (E9), scrunch (E13),
scan (E15), copy/cache (E17), and per-partition sort (O1). Each test
asserts the SEMANTICS the reference op guarantees, not just that the
facade returns something.
"""

import pandas as pd
import pytest

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.relational import (add_union, aggregate_by,
                                                     clone_identity, collapse,
                                                     gather, kv_stats,
                                                     scan_foreach, scrunch,
                                                     snapshot, sort_keys)
from mr_mpi_blast_spark.session import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders")


def test_kv_stats_observe_metrics(spark, orders):
    """A6/E16 (mapreduce.cpp:3238-3371): run-summary counts/sums ride
    the job as observed metrics — no second pass over the data."""
    obs = Observation()
    df = kv_stats(orders, obs,
                  F.count(F.lit(1)).alias("n"),
                  F.sum("o_totalprice").alias("total"))
    n_action = df.count()
    assert obs.get["n"] == n_action == orders.count()
    assert obs.get["total"] == pytest.approx(
        orders.agg(F.sum("o_totalprice")).first()[0])


def test_clone_identity_one_value_per_key(spark, orders):
    """E9 clone (mapreduce.cpp:630-660): KV -> KMV where each key keeps
    exactly its own single value — on a unique key the grouped count
    is 1 everywhere and nothing is merged."""
    g = clone_identity(orders, "o_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("o_totalprice").alias("price"))
    assert g.filter(F.col("n") != 1).count() == 0
    assert g.count() == orders.count()
    # values survive the identity grouping unchanged
    orig = dict(orders.select("o_orderkey", "o_totalprice").collect())
    for r in g.collect():
        assert orig[r.o_orderkey] == r.price


def test_scrunch_gather_plus_collapse(spark, orders):
    """E13 scrunch(p) = gather + collapse (mapreduce.cpp:2346-2374):
    the concentrated aggregate must equal the plain global aggregate."""
    got = scrunch(orders, 2, [F.count(F.lit(1)).alias("n"),
                              F.sum("o_totalprice").alias("total")]).first()
    want = collapse(orders, [F.count(F.lit(1)).alias("n"),
                             F.sum("o_totalprice").alias("total")]).first()
    assert got.n == want.n
    assert got.total == pytest.approx(want.total)


def test_gather_concentrates_without_shuffle(spark, orders):
    """E11 gather(p) (mapreduce.cpp:889-1045): partition count drops to
    p and no Exchange is planned (coalesce, not repartition)."""
    spread = orders.repartition(8)
    g = gather(spread, 2)
    assert g.rdd.getNumPartitions() == 2
    # the repartition's own exchange is in the plan; coalesce must not
    # add a second one (AQE prints Final + Initial trees — check the
    # final one only)
    plan = (g._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Exchange") == 1
    assert "Coalesce 2" in plan
    assert g.count() == orders.count()


def test_scan_foreach_visits_every_row(spark, orders):
    """E15 scan (mapreduce.cpp:2207-2344): read-only iteration touches
    each KV exactly once (accumulator count == row count)."""
    acc = spark.sparkContext.accumulator(0)

    def visit(row):
        acc.add(1)

    scan_foreach(orders, visit)
    assert acc.value == orders.count()


def test_snapshot_is_reusable_cache(spark, orders):
    """E17 copy (mapreduce.cpp:297-352): the snapshot is storage-backed
    and survives re-use without recomputation."""
    s = snapshot(orders.filter(F.col("o_totalprice") > 0))
    try:
        n1 = s.count()
        assert s.storageLevel.useMemory
        assert s.count() == n1
    finally:
        s.unpersist()


def test_sort_keys_orders_within_partitions(spark, orders):
    """O1 sort_keys (mapreduce.cpp:2381-2433): every partition is
    internally ordered; no global exchange is added."""
    df = sort_keys(aggregate_by(orders, "o_orderstatus"),
                   F.col("o_orderkey").asc())

    def check(batches):
        for pdf in batches:
            ok = bool(pdf["o_orderkey"].is_monotonic_increasing)
            yield pd.DataFrame({"sorted_": [ok]})

    flags = df.select("o_orderkey").mapInPandas(check, "sorted_ boolean")
    assert flags.filter(~F.col("sorted_")).count() == 0


def test_add_union_keeps_duplicates(spark, orders):
    """E14 add (mapreduce.cpp:374-404) is UNION ALL: appending an MR
    object to itself doubles every KV, nothing is de-duplicated."""
    doubled = add_union(orders, orders)
    assert doubled.count() == 2 * orders.count()
