"""Profile-operator semantics (operators/profile.py): histogram-based
exact trimming and the count-min sketch — tie-straddle, one-sided
error, mergeability, never-seen probes, and NULL-observation policy."""

import pytest


def test_trimmed_mean_tie_straddles_cut(spark):
    """Ties straddling the trim boundary: with n=10, k=1, values
    [1,1,1,5,5,5,5,5,9,9] — only ONE of the three 1s and ONE of the
    two 9s are dropped (partial take from a tied histogram row)."""
    from mr_mpi_blast_spark.operators.profile import trimmed_mean_by_group
    vals = [1, 1, 1, 5, 5, 5, 5, 5, 9, 9]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, cents long")
    r = trimmed_mean_by_group(df, "g", "cents").collect()[0]
    # drop one 1 and one 9: kept = [1,1,5,5,5,5,5,9] -> sum 36, n 8
    assert (r.n, r.k_trim, r.trimmed_sum, r.kept) == (10, 1, 36, 8)
    with pytest.raises(ValueError, match="trim_denom"):
        trimmed_mean_by_group(df, "g", "cents", trim_denom=1)


def test_cms_one_sided_error(spark):
    """CMS contract: est >= true for EVERY term (not just the top
    probes), and est <= true + N (trivial upper sanity); merging two
    shards' sketches cell-wise equals the sketch of the union."""
    from mr_mpi_blast_spark.operators.profile import (cms_estimate,
                                                      cms_sketch)
    import random
    random.seed(11)
    terms = [f"w{random.randint(0, 300)}" for _ in range(4000)]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    sk = cms_sketch(df)
    truth = {}
    for t in terms:
        truth[t] = truth.get(t, 0) + 1
    probes = spark.createDataFrame([(t,) for t in truth], "term string")
    est = {r.term: r.est_n for r in cms_estimate(sk, probes).collect()}
    assert set(est) == set(truth)
    n = len(terms)
    for t, true_n in truth.items():
        assert true_n <= est[t] <= true_n + n, (t, true_n, est[t])
    # mergeability: sketch(a) + sketch(b) == sketch(a union b)
    half = len(terms) // 2
    a = spark.createDataFrame([(t,) for t in terms[:half]], "term string")
    b = spark.createDataFrame([(t,) for t in terms[half:]], "term string")
    from pyspark.sql import functions as F
    merged = (cms_sketch(a).unionByName(cms_sketch(b))
              .groupBy("r", "bucket")
              .agg(F.sum("counter").alias("counter")))
    full = {(r.r, r.bucket): r.counter for r in sk.collect()}
    got = {(r.r, r.bucket): r.counter for r in merged.collect()}
    assert got == full


def test_cms_weighted_parity(spark):
    """The weighted build (r12): cms_sketch over PRE-AGGREGATED
    (term, n) rows must produce cell-wise identical counters to the
    sketch of the unrolled occurrence stream — the additivity that
    lets the heavy-hitters query hash each distinct term once."""
    from mr_mpi_blast_spark.operators.profile import cms_sketch
    import random
    random.seed(7)
    terms = [f"w{random.randint(0, 120)}" for _ in range(2500)]
    truth = {}
    for t in terms:
        truth[t] = truth.get(t, 0) + 1
    stream = spark.createDataFrame([(t,) for t in terms], "term string")
    agg = spark.createDataFrame(list(truth.items()), "term string, n long")
    plain = {(r.r, r.bucket): r.counter
             for r in cms_sketch(stream).collect()}
    weighted = {(r.r, r.bucket): r.counter
                for r in cms_sketch(agg, weight_col="n").collect()}
    assert weighted == plain


def test_cms_estimate_never_seen_probe(spark):
    """A probe term absent from the corpus must come back (left join,
    not inner) with the canonical estimate: min over its cells with
    empty cells counting 0 — on a sparse sketch that is 0, never a
    dropped row and never a min over only the non-empty cells."""
    from mr_mpi_blast_spark.operators.profile import (cms_estimate,
                                                      cms_sketch)
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "term string")
    sk = cms_sketch(df)
    probes = spark.createDataFrame(
        [("a",), ("never-seen-term",)], "term string")
    got = {r.term: r.est_n for r in cms_estimate(sk, probes).collect()}
    assert set(got) == {"a", "never-seen-term"}
    assert got["a"] >= 2
    # 3 items over 4x256 cells: the phantom's 4 cells are almost
    # surely not all hit; with this fixed seedless hash it IS 0
    assert got["never-seen-term"] == 0


def test_trimmed_mean_null_observations_excluded(spark):
    """The house NULL-domain policy: NULL observations carry no rank
    position and are excluded BEFORE the histogram — without the
    filter they inflated n/k while their NULL products silently
    vanished from the trim sums (wrong in both directions)."""
    from mr_mpi_blast_spark.operators.profile import trimmed_mean_by_group
    rows = [("g", None)] * 5 + [("g", 10)] * 5
    df = spark.createDataFrame(rows, "g string, cents long")
    r = trimmed_mean_by_group(df, "g", "cents", trim_denom=5).collect()[0]
    # 5 non-null obs, k = 1: drop one 10 from each end -> kept 3
    assert (r.n, r.k_trim, r.trimmed_sum, r.kept) == (5, 1, 30, 3)


def test_hll_mergeability_and_accuracy(spark):
    """The property that makes HLL the 100 TB COUNT DISTINCT: two
    shards' register tables merged by register-wise MAX equal the
    whole corpus's registers (so distributed build == sequential
    build), and the estimate lands within the ~1.04/sqrt(256) = 6.5%
    design error (3-sigma guard band here) on a genuinely-large-n
    input."""
    from pyspark.sql import functions as F

    from mr_mpi_blast_spark.operators.profile import (HLL_M, hll_distinct)
    n = 6000
    df = spark.createDataFrame([(f"k{i}",) for i in range(n)], "x string")
    r = hll_distinct(df, "x").collect()[0]
    assert r.exact_distinct == n
    assert abs(r.est_distinct - n) / n < 0.20   # 3x the design sigma
    assert r.m == HLL_M

    # merge = register-wise max: shard registers then combine
    def regs(sub):
        from mr_mpi_blast_spark.operators.search import dsir_bucket_spark
        from mr_mpi_blast_spark.operators.profile import (_hll_rank_spark,
                                                          HLL_M)
        bucket = dsir_bucket_spark("concat('hll:', x)", HLL_M)
        v20 = ("CAST(conv(substring(md5(concat('hll:', x)), 9, 5), "
               "16, 10) AS BIGINT)")
        return (sub.select(F.expr(bucket).alias("b"),
                           F.expr(_hll_rank_spark(v20)).alias("rank"))
                .groupBy("b").agg(F.max("rank").alias("m_rank")))

    half1 = df.filter(F.substring("x", 2, 10).cast("long") % 2 == 0)
    half2 = df.filter(F.substring("x", 2, 10).cast("long") % 2 == 1)
    merged = (regs(half1).unionByName(regs(half2))
              .groupBy("b").agg(F.max("m_rank").alias("m_rank")))
    whole = regs(df)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, whole.collect())))


def test_hll_distinct_by_groups(spark):
    """Per-group HLL equals the global sketch applied group-by-group
    (same registers, same estimate — the grouped operator is the
    global one partitioned, nothing more), each group's estimate is
    within the design error, and a NULL group key forms its own
    group."""
    from pyspark.sql import functions as F

    from mr_mpi_blast_spark.operators.profile import (hll_distinct,
                                                      hll_distinct_by)
    rows = [(("g%d" % (i % 3)) if i % 11 else None, f"k{i % 2500}")
            for i in range(9000)]
    df = spark.createDataFrame(rows, "g string, x string")
    by = {r.g: r for r in hll_distinct_by(df, "g", "x").collect()}
    assert set(by) == {"g0", "g1", "g2", None}
    for gname, row in by.items():
        cond = F.col("g").isNull() if gname is None \
            else (F.col("g") == gname)
        solo = hll_distinct(df.filter(cond), "x").collect()[0]
        assert row.est_distinct == solo.est_distinct, gname
        assert row.exact_distinct == solo.exact_distinct, gname
        assert row.sum_inv_scaled == solo.sum_inv_scaled, gname
        n = row.exact_distinct
        assert abs(row.est_distinct - n) / n < 0.20, gname


def test_hll_union_intersection(spark):
    """Union sketch = register-wise max of the sides (est within the
    design error of the true union), and the inclusion-exclusion
    intersection lands within its documented union-scale error."""
    from mr_mpi_blast_spark.operators.profile import hll_union_distinct
    a = spark.createDataFrame([(f"k{i}",) for i in range(6000)],
                              "x string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(3000, 9000)],
                              "x string")
    r = hll_union_distinct(a, "x", b, "x").collect()[0]
    assert r.exact_union == 9000
    assert abs(r.est_union - 9000) / 9000 < 0.20
    assert abs(r.est_a - 6000) / 6000 < 0.20
    assert abs(r.est_b - 6000) / 6000 < 0.20
    # I-E intersection: error compounds on the union's scale
    assert abs(r.est_intersection - 3000) / 9000 < 0.25


def test_bloom_one_sided_under_forced_collisions(spark, monkeypatch):
    """Bloom's contract is ONE-SIDED: with the filter squeezed to 64
    bits (heavy collisions), every true member must still pass; false
    positives may appear (and should, at this density) but never a
    false negative."""
    import mr_mpi_blast_spark.operators.profile as prof
    from pyspark.sql import functions as F
    monkeypatch.setattr(prof, "BLOOM_BITS", 64)
    keys = spark.createDataFrame([(i,) for i in range(40)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(200)], "k long")
    positions = prof.bloom_build(keys, "k")
    assert positions.count() <= 64
    got = {r.k: r.bloom_pass
           for r in prof.bloom_probe(probe, "k", positions).collect()}
    assert all(got[i] for i in range(40)), "false negative!"
    fp = sum(1 for i in range(40, 200) if got[i])
    assert fp > 0   # 40 keys * 3 hashes in 64 bits: collisions certain


def test_bloom_no_false_negatives_at_production_bits(spark):
    from mr_mpi_blast_spark.operators.profile import (bloom_build,
                                                      bloom_probe)
    keys = spark.createDataFrame([(f"u{i}",) for i in range(100)],
                                 "k string")
    probe = spark.createDataFrame([(f"u{i}",) for i in range(300)],
                                  "k string")
    got = {r.k: r.bloom_pass
           for r in bloom_probe(probe, "k",
                                bloom_build(keys, "k")).collect()}
    assert all(got[f"u{i}"] for i in range(100))
    # 100 keys * 3 in 8192 bits: fp rate ~ (300/8192)^3 ~ 5e-5
    fp = sum(1 for i in range(100, 300) if got[f"u{i}"])
    assert fp <= 2


def test_bloom_probe_plan_broadcasts_only_the_filter(spark):
    """The runtime-filter plan shape: the position table rides a
    BroadcastExchange (it is kilobytes BY CONSTRUCTION) into a
    broadcast LEFT SEMI join — the probe stream is never shuffled for
    the membership test itself."""
    from mr_mpi_blast_spark.operators.profile import (bloom_build,
                                                      bloom_probe)
    keys = spark.createDataFrame([(f"u{i}",) for i in range(50)],
                                 "k string")
    probe = spark.createDataFrame([(f"u{i}",) for i in range(150)],
                                  "k string")
    out = bloom_probe(probe, "k", bloom_build(keys, "k"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "LeftSemi" in plan
    # the semi join must be the broadcast form, not a sort-merge that
    # would shuffle the probe stream
    import re
    semi_lines = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
    assert semi_lines and all("Broadcast" in ln for ln in semi_lines), \
        semi_lines


def test_hdr_merge_associative_and_error_bound(spark):
    """r11 quantile sketch: (a) shard sketches merged in ANY grouping
    equal the whole-corpus sketch (count addition is associative and
    commutative); (b) every quantile estimate under-reports its exact
    type-1 quantile by at most one bucket width (relative
    2^-(SUB_BITS-1)); (c) negative/NULL inputs fail loudly."""
    import pytest as _pytest
    from mr_mpi_blast_spark.operators.profile import (
        HDR_SUB_BITS, hdr_merge, hdr_quantiles, hdr_sketch)
    vals = [((i * 2654435761) % 100_000,) for i in range(5000)]
    df = spark.createDataFrame(vals, "v long")
    whole = {r.bucket: r.cnt for r in hdr_sketch(df, "v").collect()}
    thirds = [spark.createDataFrame(vals[i::3], "v long")
              for i in range(3)]
    sks = [hdr_sketch(t, "v") for t in thirds]
    merged = {r.bucket: r.cnt
              for r in hdr_merge(hdr_merge(sks[0], sks[1]),
                                 sks[2]).collect()}
    merged2 = {r.bucket: r.cnt
               for r in hdr_merge(sks[2],
                                  hdr_merge(sks[1], sks[0])).collect()}
    assert merged == whole == merged2

    qs = [100, 500, 900, 990, 999]
    est = {r.q_permille: r.est
           for r in hdr_quantiles(hdr_sketch(df, "v"), qs).collect()}
    svals = sorted(v for (v,) in vals)
    import math
    for q in qs:
        exact = svals[math.ceil(q * len(svals) / 1000) - 1]
        assert est[q] <= exact, (q, est[q], exact)
        assert exact <= est[q] * (1 + 2 ** -(HDR_SUB_BITS - 1)) + 1, \
            (q, est[q], exact)

    bad = spark.createDataFrame([(5,), (-1,)], "v long")
    with _pytest.raises(Exception, match="non-negative"):
        hdr_sketch(bad, "v").collect()
