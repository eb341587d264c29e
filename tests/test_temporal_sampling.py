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
    from mr_mpi_blast_spark.operators.temporal import epoch_us
    ev = load_table(spark, SF, "events")
    s = sessionize(ev, "user_id", "ts", 30.0)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us(s, "ts")
    gaps = (s.withColumn("gap_us", us - F.lag(us).over(w))
            .withColumn("same", F.col("session_seq")
                        == F.lag("session_seq").over(w))
            .filter(F.col("gap_us").isNotNull()))
    bad_in = gaps.filter(F.col("same") & (F.col("gap_us") > 1800_000_000))
    bad_out = gaps.filter(~F.col("same") & (F.col("gap_us") <= 1800_000_000))
    assert bad_in.count() == 0 and bad_out.count() == 0


def test_epoch_us_ntz_session_tz_independent(spark):
    """ADVICE r2: epoch_us on TIMESTAMP_NTZ must interpret the wall
    clock as UTC under EVERY session timezone — including across a DST
    transition of the session zone (America/Los_Angeles springs forward
    2024-03-10 02:00). The old to_utc_timestamp form was a no-op shift
    that leaked the session zone into the epoch values."""
    from mr_mpi_blast_spark.operators.temporal import epoch_us

    walls = [dt.datetime(2024, 3, 10, h, 30) for h in (0, 1, 2, 3, 9)]
    ntz = spark.createDataFrame(
        [(i, w) for i, w in enumerate(walls)], "id int, ts timestamp_ntz")
    expected = [int(w.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
                for w in walls]

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        per_tz = {}
        for tz in ("UTC", "America/Los_Angeles", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            rows = (ntz.select("id", epoch_us(ntz, "ts").alias("us"))
                    .orderBy("id").collect())
            per_tz[tz] = [r.us for r in rows]
        assert per_tz["UTC"] == expected
        assert per_tz["America/Los_Angeles"] == expected
        assert per_tz["Asia/Kathmandu"] == expected
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.slow
def test_sessionize_ntz_dst_straddle_tz_independent(spark):
    """Sessionize over NTZ events whose gaps straddle a session-zone DST
    jump: session_seq must be identical under UTC and LA timezones (the
    31-minute gap at 01:45->02:16 wall is > 30 min in UTC-interpreted
    micros; a session-zone leak would see 1:31 or -0:29)."""
    walls = [dt.datetime(2024, 3, 10, 1, 0),
             dt.datetime(2024, 3, 10, 1, 45),   # 45 min: new session
             dt.datetime(2024, 3, 10, 2, 16),   # 31 min: new session
             dt.datetime(2024, 3, 10, 2, 40)]   # 24 min: same session
    ev = spark.createDataFrame(
        [(1, i, w) for i, w in enumerate(walls)],
        "user_id int, event_id int, ts timestamp_ntz")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        per_tz = {}
        for tz in ("UTC", "America/Los_Angeles"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            per_tz[tz] = {r.event_id: r.session_seq
                          for r in sessionize(ev, gap_minutes=30.0).collect()}
        assert per_tz["UTC"] == {0: 1, 1: 2, 2: 3, 3: 3}
        assert per_tz["America/Los_Angeles"] == per_tz["UTC"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_epoch_us_case_insensitive_column(spark):
    """ADVICE r2 (low): ts_col written in a different case than the
    schema must still hit the NTZ branch — Spark column resolution is
    case-insensitive, so the dtype lookup must be too."""
    from mr_mpi_blast_spark.operators.temporal import epoch_us

    ntz = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0))], "id int, ts timestamp_ntz")
    want = int(dt.datetime(2024, 1, 1, 12, 0,
                           tzinfo=dt.timezone.utc).timestamp() * 1e6)
    got = ntz.select(epoch_us(ntz, "TS").alias("us")).first().us
    assert got == want


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


def test_mix_weights_semantics(spark):
    """Temperature-mix edges: alpha=1 reproduces the natural mix
    (upsample 1.0 for every domain), alpha=0.5 moves share from the
    large domain to the small one (upsample < 1 vs > 1) while
    mix_frac still sums to ~1, and token counts are exact."""
    from mr_mpi_blast_spark.operators.sampling import mix_weights

    rows = [(1, "a", "w " * 90), (2, "a", "w " * 91),
            (3, "b", "w " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    nat = {r.source: r for r in mix_weights(df, alpha=1.0).collect()}
    assert nat["a"].n_tokens == 181 and nat["b"].n_tokens == 10
    assert nat["a"].n_docs == 2 and nat["b"].n_docs == 1
    assert nat["a"].upsample == 1.0 and nat["b"].upsample == 1.0

    half = {r.source: r for r in mix_weights(df, alpha=0.5).collect()}
    assert half["a"].upsample < 1.0 < half["b"].upsample
    assert abs(half["a"].mix_frac + half["b"].mix_frac - 1.0) < 1e-5
    assert abs(half["a"].nat_frac - 181 / 191) < 1e-5


def test_mix_sample_rates_and_determinism(spark):
    """mix_sample edges: at alpha=1 every domain keeps ~target_frac
    (upsample 1 everywhere); at alpha=0.5 the small domain keeps a
    HIGHER fraction than the large one; the sample is a deterministic
    subset (rerun-identical, and membership is per-id so the sampled
    set is a subset of the corpus ids); target_frac=1 with rates
    capped at 1 keeps every doc of upweighted domains."""
    from mr_mpi_blast_spark.operators.sampling import mix_sample

    rows = [(i, "big", "w " * 50) for i in range(300)] + \
           [(1000 + i, "small", "w " * 50) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    a = {r.doc_id for r in mix_sample(df, alpha=0.5,
                                      target_frac=0.5).collect()}
    b = {r.doc_id for r in mix_sample(df, alpha=0.5,
                                      target_frac=0.5).collect()}
    assert a == b and a <= {r[0] for r in rows}
    kept_big = len([d for d in a if d < 1000]) / 300
    kept_small = len([d for d in a if d >= 1000]) / 30
    assert kept_small > kept_big            # alpha<1 favors small domains

    full = mix_sample(df, alpha=0.5, target_frac=1.0)
    kept = {r.doc_id for r in full.collect()}
    assert {d for d in kept if d >= 1000} == {1000 + i for i in range(30)}

    # alpha=1: the natural mix (upsample 1.0 everywhere, pow path) —
    # every domain keeps ~target_frac via the plain id-bucket rate
    nat = {r.doc_id for r in mix_sample(df, alpha=1.0,
                                        target_frac=0.5).collect()}
    for lo, hi, n in ((0, 1000, 300), (1000, 2000, 30)):
        frac = len([d for d in nat if lo <= d < hi]) / n
        assert 0.3 < frac < 0.7


def test_ntile_by_score_matches_naive_window(spark):
    """Hierarchical NTILE == SQL NTILE(k) OVER (PARTITION BY stratum
    ORDER BY score DESC, id) — multiple strata, heavy score ties, and
    tile sizes on non-divisible counts (larger tiles first)."""
    from pyspark.sql import Window

    from mr_mpi_blast_spark.operators.sampling import ntile_by_score

    rows = [(i, "a", (i * 7) % 5) for i in range(23)] + \
           [(100 + i, "b", 3) for i in range(7)]  # all-tied stratum
    df = spark.createDataFrame(rows, "id long, s string, score long")
    got = {(r.s, r.id): r.ntile
           for r in ntile_by_score(df, "s", "score", "id", 3,
                                   n_cells=4).collect()}
    w = Window.partitionBy("s").orderBy(F.col("score").desc(), "id")
    want = {(r.s, r.id): r.nt
            for r in df.withColumn("nt", F.ntile(3).over(w)).collect()}
    assert got == want
    # explicit size contract on a non-divisible stratum (23 = 8+8+7)
    sizes = [len([1 for (s, _), t in got.items() if s == "a" and t == k])
             for k in (1, 2, 3)]
    assert sizes == [8, 8, 7]


def test_ntile_by_score_validation_and_empty(spark):
    from mr_mpi_blast_spark.operators.sampling import ntile_by_score

    df = spark.createDataFrame([], "id long, s string, score long")
    assert ntile_by_score(df, "s", "score", "id", 3).count() == 0
    with pytest.raises(ValueError):
        ntile_by_score(df, "s", "score", "id", 0)


def test_shuffle_shards_permutation_and_determinism(spark):
    """Every shard's pos is a contiguous 1..n permutation; the
    assignment is a pure function of (seed, id) — identical across
    repartitions — and a different seed reorders."""
    from mr_mpi_blast_spark.operators.sampling import shuffle_shards

    docs = load_table(spark, SF, "documents").select("doc_id")
    a = shuffle_shards(docs, "doc_id", 8, seed="s1")
    rows = a.collect()
    assert len(rows) == docs.count()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # layout-independent: same (shard, pos) under a different partitioning
    b = shuffle_shards(docs.repartition(13), "doc_id", 8, seed="s1")
    assert {(r.doc_id, r.shard, r.pos) for r in b.collect()} == \
           {(r.doc_id, r.shard, r.pos) for r in rows}
    # a new seed is a different order (overwhelmingly)
    c = shuffle_shards(docs, "doc_id", 8, seed="s2")
    assert {(r.doc_id, r.shard, r.pos) for r in c.collect()} != \
           {(r.doc_id, r.shard, r.pos) for r in rows}
    with pytest.raises(ValueError):
        shuffle_shards(docs, "doc_id", 0)


def _ev(rows):
    # rows: (event_id, user, minute, type, value)
    return [Row(event_id=i, user_id=u, ts=_ts(m, s), event_type=t,
                value=float(v))
            for (i, u, m, s, t, v) in rows]


def test_funnel_strict_order_and_ties(spark):
    from mr_mpi_blast_spark.operators.temporal import funnel
    rows = _ev([
        # user 1: full path view(1) -> click(2) -> purchase(3)
        (1, 1, 1, 0, "view", 0), (2, 1, 2, 0, "click", 0),
        (3, 1, 3, 0, "purchase", 0),
        # user 2: click BEFORE the first view never counts; a later
        # click does
        (4, 2, 5, 0, "click", 0), (5, 2, 6, 0, "view", 0),
        (6, 2, 7, 0, "click", 0),
        # user 3: click at the SAME microsecond as view — strictly-
        # after policy says no progression
        (7, 3, 8, 0, "view", 0), (8, 3, 8, 0, "click", 0),
        # user 4: never views -> absent from the funnel
        (9, 4, 9, 0, "purchase", 0),
    ])
    f = funnel(spark.createDataFrame(rows), ["view", "click", "purchase"])
    got = {r.user_id: (r.t1, r.t2, r.t3, r.depth) for r in f.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (_ts(1), _ts(2), _ts(3), 3)
    assert got[2] == (_ts(6), _ts(7), None, 2)
    assert got[3] == (_ts(8), None, None, 1)
    with pytest.raises(ValueError, match="stages"):
        funnel(spark.createDataFrame(rows), ["view"])


def test_resample_locf_gap_fill(spark):
    from mr_mpi_blast_spark.operators.temporal import resample_locf
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # hour 0: three events; last (by ts, then event_id) wins
        Row(event_id=1, user_id=1, ts=base.replace(minute=5),
            event_type="x", value=1.0),
        Row(event_id=3, user_id=1, ts=base.replace(minute=50),
            event_type="x", value=3.0),
        Row(event_id=2, user_id=1, ts=base.replace(minute=50),
            event_type="x", value=2.0),
        # hours 1-2 empty; hour 3 has one event
        Row(event_id=4, user_id=1, ts=base.replace(hour=3),
            event_type="x", value=9.0),
    ]
    r = resample_locf(spark.createDataFrame(rows)).orderBy("cell").collect()
    assert [(x.cell.hour, x.n_events, x.value_locf) for x in r] == [
        (0, 3, 3.0),   # event_id 3 is the max (ts, event_id) tie-break
        (1, 0, 3.0),   # carried forward
        (2, 0, 3.0),
        (3, 1, 9.0),
    ]


def test_retention_matrix_offsets(spark):
    from mr_mpi_blast_spark.operators.temporal import retention_matrix
    def d(day, user, i):
        return Row(event_id=i, user_id=user,
                   ts=dt.datetime(2024, 1, day, 10, 0, 0),
                   event_type="x", value=0.0)
    rows = [d(1, 1, 1), d(1, 1, 2),  # same day twice -> one active day
            d(3, 1, 3),              # offset 2
            d(2, 2, 4), d(3, 2, 5)]  # cohort Jan 2: offsets 0, 1
    m = retention_matrix(spark.createDataFrame(rows))
    got = {(str(r.cohort_day), r.day_offset): r.n_active
           for r in m.collect()}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
                   ("2024-01-02", 0): 1, ("2024-01-02", 1): 1}


def test_resample_step_validation(spark):
    """Only '1 <unit>' steps are expressible by truncation: a '2 hour'
    stride would drop odd-hour events into cells the grid never
    visits (silent data loss) and '30 minutes' can't truncate at all
    — both must fail loudly."""
    from mr_mpi_blast_spark.operators.temporal import resample_locf
    ev = spark.createDataFrame(
        [Row(event_id=1, user_id=1, ts=_ts(1), event_type="x",
             value=1.0)])
    for bad in ["2 hour", "30 minutes", "hour", "1 fortnight"]:
        with pytest.raises(ValueError, match="step"):
            resample_locf(ev, step=bad)
    assert resample_locf(ev, step="1 day").count() == 1
