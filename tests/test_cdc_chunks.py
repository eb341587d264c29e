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


def test_apply_changeset_rejects_unknown_ops(spark):
    """r10 advisory closure: a typo'd op code must fail loudly, not be
    silently filtered out of both the touched-key set and the upsert
    payload (= data loss); validate=False restores the old permissive
    behavior for callers that pre-validated."""
    target = spark.createDataFrame([(1, "a")], "k long, s string")
    changes = spark.createDataFrame(
        [(2, "b", "I"), (3, "c", "X")], "k long, s string, op string")
    with pytest.raises(ValueError, match="unknown op code.*'X'"):
        apply_changeset(target, changes, ["k"])
    # NULL op is also unknown: ~isin() is NULL (not TRUE) for it, so
    # an isin-only probe would let it through to be silently dropped
    nullop = spark.createDataFrame(
        [(2, "b", "I"), (5, "x", None)], "k long, s string, op string")
    with pytest.raises(ValueError, match="unknown op code"):
        apply_changeset(target, nullop, ["k"])
    got = {r.k: r.s for r in
           apply_changeset(target, changes, ["k"],
                           validate=False).collect()}
    assert got == {1: "a", 2: "b"}   # X row dropped, by explicit opt-out


def test_apply_changeset_unique_key_assertion(spark):
    target = spark.createDataFrame([(1, "a")], "k long, s string")
    dup = spark.createDataFrame(
        [(2, "b", "I"), (2, "c", "U")], "k long, s string, op string")
    with pytest.raises(ValueError, match="more than once"):
        apply_changeset(target, dup, ["k"], assert_unique_keys=True)
    ok = spark.createDataFrame(
        [(2, "b", "I")], "k long, s string, op string")
    got = {r.k: r.s for r in
           apply_changeset(target, ok, ["k"],
                           assert_unique_keys=True).collect()}
    assert got == {1: "a", 2: "b"}


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
