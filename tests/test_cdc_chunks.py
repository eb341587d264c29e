"""CDC (snapshot_diff / apply_changeset) and sliding-window chunking:
handcrafted edges for null-safe comparison, merge semantics, and
exact window enumeration."""

import pytest
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.cdc import apply_changeset, snapshot_diff
from mr_mpi_blast_spark.operators.sampling import chunk_documents


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged -> not emitted
         (2, "b", 20.0),          # null -> value: changed (1 col)
         (4, "d", 41.0),          # two cols changed
         (5, "e", 50.0)],         # added
        "k long, s string, v double")
    got = {r.k: (r.change_type, r.n_changed_cols)
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: ("changed", 1), 3: ("removed", 0),
                   4: ("changed", 2), 5: ("added", 0)}
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_diff(old, new.withColumnRenamed("v", "w"), ["k"])


def test_apply_changeset_merge_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string")
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "I")],
        "k long, s string, op string")
    got = {r.k: r.s for r in
           apply_changeset(target, changes, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}
    with pytest.raises(ValueError, match="changeset columns"):
        apply_changeset(target, changes.drop("s"), ["k"])


def test_apply_then_diff_roundtrip(spark):
    """diff(v1, apply(v1, changes)) recovers exactly the changeset's
    keys and classes — the two operators are mutual inverses."""
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string")
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "I")],
        "k long, s string, op string")
    v2 = apply_changeset(target, changes, ["k"])
    got = {r.k: r.change_type
           for r in snapshot_diff(target, v2, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


@pytest.mark.parametrize("n,starts", [
    (1, [0]), (24, [0]), (32, [0]), (33, [0, 24]),
    (56, [0, 24]), (57, [0, 24, 48]), (81, [0, 24, 48, 72]),
])
def test_chunk_windows_exact(spark, n, starts):
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(df, 32, 24).collect(),
                  key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in rows] == list(range(len(starts)))
    for r, s in zip(rows, starts):
        want = [f"w{i}" for i in range(s, min(s + 32, n))]
        assert r.chunk_text.split(" ") == want
        assert r.n_tokens == len(want)


def test_chunk_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, 8, 9)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, 8, 0)


def test_anomaly_algebra_matches_float_zscore(spark):
    """The cross-multiplied integer test agrees with the float
    z-score definition everywhere the float is not AT the boundary
    (population sigma; |z| > 1.5)."""
    import random
    random.seed(9)
    rows = [(i, i % 7, round(random.uniform(0, 560.0), 2))
            for i in range(600)]
    import statistics
    by_user = {}
    for i, u, v in rows:
        by_user.setdefault(u, []).append((i, round(v * 100)))
    want = set()
    for u, evs in by_user.items():
        xs = [c for _, c in evs]
        mu = statistics.fmean(xs)
        sig = statistics.pstdev(xs)
        for i, c in evs:
            if sig > 0 and abs((c - mu) / sig) > 1.5000001:
                want.add(i)
    df = spark.createDataFrame(
        [(i, u, v) for i, u, v in rows],
        "event_id long, user_id long, value double")
    e = df.selectExpr("event_id", "user_id",
                      "CAST(floor(value*100 + 0.5) AS BIGINT) AS cents")
    s = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"))
    d = F.col("n") * F.col("cents") - F.col("s1")
    got = {r.event_id for r in
           e.join(s, "user_id")
            .filter(F.lit(4) * d * d
                    > F.lit(9) * (F.col("n") * F.col("s2")
                                  - F.col("s1") * F.col("s1")))
            .collect()}
    assert got == want


def test_chunk_reconstruction_property(spark):
    """Lossless-coverage property: taking the first `stride` tokens of
    every chunk plus the remainder of the final chunk reproduces the
    exact token stream — no token is dropped or duplicated beyond the
    declared overlap, for any document length."""
    import random
    random.seed(4)
    lengths = [1, 2, 23, 24, 25, 31, 32, 33, 47, 48, 49, 56, 57, 96,
               random.randint(60, 200)]
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(n)))
            for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in chunk_documents(df, 32, 24).collect():
        out.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
    for i, n in enumerate(lengths):
        chunks = [out[i][k] for k in sorted(out[i])]
        rebuilt = []
        for k, ch in enumerate(chunks):
            rebuilt += ch[:24] if k < len(chunks) - 1 else ch
        assert rebuilt == [f"t{i}x{j}" for j in range(n)], (i, n)
        # every non-final chunk is full-width
        assert all(len(c) == 32 for c in chunks[:-1])


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
