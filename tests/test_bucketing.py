"""Bucketed co-located join: correctness and the zero-shuffle plan
property it exists for."""

import uuid

from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.bucketing import (colocated_join,
                                                    ensure_bucketed_table)
from mr_mpi_blast_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _tables(spark):
    tag = uuid.uuid4().hex[:8]
    ot = ensure_bucketed_table(
        spark, lambda: load_table(spark, SF, "orders"),
        f"t_orders_{tag}", "o_custkey", 4, f"test:{tag}:o")
    ct = ensure_bucketed_table(
        spark, lambda: load_table(spark, SF, "customer"),
        f"t_customer_{tag}", "c_custkey", 4, f"test:{tag}:c")
    return ot, ct


def test_colocated_join_no_exchange_no_sort(spark):
    ot, ct = _tables(spark)
    j = colocated_join(spark, ot, ct, "o_custkey", "c_custkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # both sides arrive sorted from the bucket layout; no Sort operator
    assert "Sort " not in plan.replace("SortMergeJoin", "SMJ")
    assert "SelectedBucketsCount" in plan


def test_colocated_agg_reuses_bucketing(spark):
    ot, ct = _tables(spark)
    j = colocated_join(spark, ot, ct, "o_custkey", "c_custkey")
    agg = j.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_colocated_join_matches_plain_join(spark):
    ot, ct = _tables(spark)
    j = (colocated_join(spark, ot, ct, "o_custkey", "c_custkey")
         .groupBy("o_custkey")
         .agg(F.count(F.lit(1)).alias("n"),
              F.round(F.sum("o_totalprice"), 4).alias("total")))
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    plain = (o.join(c, o.o_custkey == c.c_custkey)
             .groupBy("o_custkey")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("o_totalprice"), 4).alias("total")))
    assert j.exceptAll(plain).count() == 0
    assert plain.exceptAll(j).count() == 0


def test_reregister_from_staged_files(spark):
    """Second registration (fresh table name, same content key) must be
    metadata-only and still read bucketed."""
    tag = uuid.uuid4().hex[:8]
    ck = f"test:{tag}:reuse"
    t1 = ensure_bucketed_table(
        spark, lambda: load_table(spark, SF, "orders"),
        f"t_o1_{tag}", "o_custkey", 4, ck)
    t2 = ensure_bucketed_table(
        spark, lambda: (_ for _ in ()).throw(AssertionError("re-read!")),
        f"t_o2_{tag}", "o_custkey", 4, ck)
    assert spark.table(t2).count() == spark.table(t1).count()
    j = colocated_join(spark, t1, t2, "o_custkey", "o_custkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
