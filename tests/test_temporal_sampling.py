"""Semantics tests for temporal (sessionize, asof_join) and sampling
operators — handcrafted edges plus properties on the driver testdata."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.sampling import (deterministic_sample,
                                                   deterministic_split)
from mr_mpi_blast_spark.operators.temporal import asof_join, sessionize
from mr_mpi_blast_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def test_sessionize_gap_semantics(spark):
    """Strictly-greater-than-gap breaks a session; an exactly-at-gap
    event does not."""
    ev = spark.createDataFrame([
        Row(user_id=1, event_id=1, ts=_ts(0)),
        Row(user_id=1, event_id=2, ts=_ts(30)),        # == 30 min: same
        Row(user_id=1, event_id=3, ts=_ts(59)),        # 29 min: same
        Row(user_id=1, event_id=4, ts=_ts(59, 1) + dt.timedelta(minutes=30)),  # >30: new
        Row(user_id=2, event_id=5, ts=_ts(0)),         # other key: own seq
    ])
    got = {r.event_id: r.session_seq
           for r in sessionize(ev, gap_minutes=30.0).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_property_on_testdata(spark):
    """Within a session every consecutive gap <= 30 min; across a
    session boundary the gap > 30 min."""
    ev = load_table(spark, SF, "events")
    s = sessionize(ev, "user_id", "ts", 30.0)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (s.withColumn("gap_us", F.unix_micros("ts")
                         - F.lag(F.unix_micros("ts")).over(w))
            .withColumn("same", F.col("session_seq")
                        == F.lag("session_seq").over(w))
            .filter(F.col("gap_us").isNotNull()))
    bad_in = gaps.filter(F.col("same") & (F.col("gap_us") > 1800_000_000))
    bad_out = gaps.filter(~F.col("same") & (F.col("gap_us") <= 1800_000_000))
    assert bad_in.count() == 0 and bad_out.count() == 0


def test_asof_join_edges(spark):
    """Inclusive tie at equal ts, latest-at-or-before selection, null
    when no prior right row, and (key, ts)-duplicate determinism."""
    left = spark.createDataFrame([
        Row(user_id=1, event_id=10, ts=_ts(5)),
        Row(user_id=1, event_id=11, ts=_ts(20)),
        Row(user_id=2, event_id=12, ts=_ts(1)),   # before any right row
    ])
    right = spark.createDataFrame([
        Row(user_id=1, event_id=100, ts=_ts(5)),   # tie with left@5
        Row(user_id=1, event_id=101, ts=_ts(15)),
        Row(user_id=1, event_id=102, ts=_ts(15)),  # dup (key, ts): max wins
        Row(user_id=2, event_id=103, ts=_ts(2)),
    ])
    got = {r.event_id: r.r_event_id for r in
           asof_join(left, right, "user_id", "ts", ["event_id"]).collect()}
    assert got == {10: 100, 11: 102, 12: None}


def test_split_deterministic_and_complete(spark):
    docs = load_table(spark, SF, "documents")
    s1 = deterministic_split(docs, "doc_id").groupBy("split").count()
    dist = {r["split"]: r["count"] for r in s1.collect()}
    assert set(dist) <= {"train", "val", "test"}
    assert sum(dist.values()) == docs.count()
    assert dist["train"] > dist.get("val", 0)  # rough 80/10/10 shape
    # rerun identical (pure function of id)
    s2 = deterministic_split(docs, "doc_id")
    assert (s2.groupBy("split").count().exceptAll(s1).count() == 0)


def test_sample_nesting(spark):
    docs = load_table(spark, SF, "documents")
    small = {r.doc_id for r in
             deterministic_sample(docs, "doc_id", 0.05).collect()}
    big = {r.doc_id for r in
           deterministic_sample(docs, "doc_id", 0.25).collect()}
    assert small and small <= big
    assert len(big) < docs.count()


def test_split_fraction_validation(spark):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        deterministic_split(docs, "doc_id", {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)
