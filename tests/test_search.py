"""Semantics + plan-shape tests for operators/search.py (BM25
retrieval and corpus-LM bigram scoring).

The oracle tests in test_facade_oracles.py pin cross-engine value
equality on the real tables; these tests pin the SEMANTICS on
hand-computable fixtures (a Python reference implementation of the
same formulas) and the plan shape (WindowGroupLimit top-k, broadcast
term stats, no cartesian product on the corpus side).
"""

import math

import pytest
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.search import (BM25_B, BM25_K1,
                                                 bigram_lm_score,
                                                 bm25_topk)


def _bm25_ref(docs: dict[int, str], queries: dict[int, tuple[str, ...]],
              k1: float = BM25_K1, b: float = BM25_B):
    """Pure-Python BM25 reference with the same micro-unit
    quantization (floor(x*1e6 + 0.5) per term, integer sum)."""
    toks = {d: t.lower().split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) * 1.0 / n
    out = {}
    for qid, terms in queries.items():
        scores = {}
        for d, t in toks.items():
            micro = 0
            matched = False
            for term in set(terms):
                tf = t.count(term)
                if tf == 0:
                    continue
                matched = True
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b
                                                    + b * len(t) / avgdl))
                micro += math.floor(idf * tfn * 1e6 + 0.5)
            if matched:
                scores[d] = micro
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


DOCS = {
    1: "apple banana cherry apple",          # tf(apple)=2, dl=4
    2: "apple kiwi kiwi melon plum fig",     # tf(apple)=1, dl=6
    3: "banana cherry melon plum",           # no apple
    4: "apple",                              # tf=1, dl=1 (short doc)
}
QUERIES = {0: ("apple",), 1: ("apple", "melon")}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id BIGINT, text STRING")


def test_bm25_matches_python_reference(docs_df):
    got = bm25_topk(docs_df, QUERIES, k=10).collect()
    ref = _bm25_ref(DOCS, QUERIES)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, expect in ref.items():
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in expect]
        for r, (_, micro) in zip(rows, expect):
            assert r.score == micro / 1e6
    # only matching docs appear (inverted-index semantics)
    assert all(r.doc_id != 3 for r in by_q[0])


def test_bm25_ranking_properties(docs_df):
    rows = {r.doc_id: r for r in
            bm25_topk(docs_df, {0: ("apple",)}, k=10).collect()}
    # higher tf wins over same-ish dl; the short doc's length
    # normalization (dl=1 vs avgdl) beats tf=2 at dl=4 for b=0.75
    assert rows[4].score > rows[1].score > rows[2].score


def test_bm25_k_cutoff_and_plan(docs_df):
    df = bm25_topk(docs_df, QUERIES, k=1)
    rows = df.collect()
    assert sorted({r.query_id for r in rows}) == [0, 1]
    assert all(r.rank == 1 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan        # map-side top-k prune
    assert "CartesianProduct" not in plan    # stats row is broadcast


def _lm_ref(docs: dict[int, str]):
    toks = {d: t.lower().split() for d, t in docs.items()}
    bgs = {d: [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]
           for d, t in toks.items()}
    allb = [b for bs in bgs.values() for b in bs]
    cb = {b: allb.count(b) for b in set(allb)}
    cw = {}
    for b in allb:
        cw[b.split(" ")[0]] = cw.get(b.split(" ")[0], 0) + 1
    out = {}
    for d, bs in bgs.items():
        if not bs:
            out[d] = (0, None)
            continue
        micro = sum(math.floor(
            math.log(cb[b] * 1.0 / cw[b.split(" ")[0]]) * 1e6 + 0.5)
            for b in bs)
        out[d] = (len(bs), (micro * 1.0 / len(bs)) / 1e6)
    return out


def test_lm_score_matches_python_reference(spark):
    docs = {
        1: "a b a b c",        # repeated bigram "a b"
        2: "a b",              # single bigram
        3: "x",                # no bigram -> NULL score
        4: "c a b",
    }
    df = spark.createDataFrame([(d, t) for d, t in docs.items()],
                               "doc_id BIGINT, text STRING")
    got = {r.doc_id: (r.n_bigrams, r.avg_logp)
           for r in bigram_lm_score(df).collect()}
    ref = _lm_ref(docs)
    assert set(got) == set(ref)              # every doc emits a row
    for d in ref:
        assert got[d][0] == ref[d][0], d
        assert got[d][1] == ref[d][1], d
    assert got[3] == (0, None)
    # p("a b" | "a") = 3/3 -> ln 1 = 0 contribution; doc 2 is pure
    # "a b" so its avg_logp is exactly 0
    assert got[2][1] == 0.0


def test_lm_score_empty_and_single_token(spark):
    # guards the Spark sequence(1, 0) descending-array pitfall
    df = spark.createDataFrame([(1, ""), (2, "word"), (3, "  ")],
                               "doc_id BIGINT, text STRING")
    got = {r.doc_id: (r.n_bigrams, r.avg_logp)
           for r in bigram_lm_score(df).collect()}
    assert got == {1: (0, None), 2: (0, None), 3: (0, None)}


# ---------------------------------------------------------------------------
# DSIR hashed-bigram importance weights (r8)
# ---------------------------------------------------------------------------

def _dsir_ref(docs: dict[int, tuple[str, bool]], n_buckets: int):
    """Pure-Python DSIR reference: md5-prefix bucketing, Laplace
    smoothing, micro-unit quantization of the per-bucket log ratio."""
    import hashlib

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n_buckets

    per_doc, cs, ct = {}, {}, {}
    ns = nt = 0
    for d, (t, tgt) in docs.items():
        ws = t.lower().split()
        bs = [bucket(f"{ws[i]} {ws[i+1]}") for i in range(len(ws) - 1)]
        per_doc[d] = bs
        for b in bs:
            cs[b] = cs.get(b, 0) + 1
            ns += 1
            if tgt:
                ct[b] = ct.get(b, 0) + 1
                nt += 1
    out = {}
    for d, bs in per_doc.items():
        if not bs:
            out[d] = (0, None)
            continue
        micro = sum(math.floor(math.log(
            (ct.get(b, 0) + 1) * (ns + n_buckets) * 1.0
            / ((cs[b] + 1) * (nt + n_buckets))) * 1e6 + 0.5) for b in bs)
        out[d] = (len(bs), micro / 1e6)
    return out


def test_dsir_matches_python_reference(spark):
    from mr_mpi_blast_spark.operators.search import dsir_log_weights
    docs = {
        1: ("the quick brown fox", True),     # target
        2: ("the quick brown dog", True),     # target, shares bigrams
        3: ("lorem ipsum dolor sit", False),  # pure source
        4: ("the quick ipsum", False),        # mixed
        5: ("x", False),                      # no bigrams -> NULL
    }
    df = spark.createDataFrame(
        [(d, t, tgt) for d, (t, tgt) in docs.items()],
        "doc_id BIGINT, text STRING, is_tgt BOOLEAN")
    got = {r.doc_id: (r.n_features, r.log_weight)
           for r in dsir_log_weights(df, F.col("is_tgt"),
                                     n_buckets=64).collect()}
    ref = _dsir_ref(docs, 64)
    assert got == ref
    # directionality: target-bigram docs score above pure-source docs
    assert got[1][1] > got[3][1]
    assert got[5] == (0, None)


def test_dsir_bucket_cross_engine_equality():
    """The Spark and DuckDB renderings of the md5-prefix bucket must
    compute the identical function — this is the whole reason md5 was
    chosen over xxhash64 (which only Spark has)."""
    import duckdb
    from mr_mpi_blast_spark.operators.search import (dsir_bucket_duckdb,
                                                     dsir_bucket_spark)
    from mr_mpi_blast_spark.session import get_spark
    spark = get_spark("test")
    strs = ["hello world", "a b", "", "ünïcode tëxt", "the quick",
            "0", "fffffff f"]
    con = duckdb.connect()
    for s in strs:
        lit = "'" + s.replace("'", "''") + "'"
        a = spark.sql(
            f"SELECT {dsir_bucket_spark(lit)}").first()[0]
        b = con.execute(
            f"SELECT {dsir_bucket_duckdb(lit)}").fetchone()[0]
        assert a == b, s


def test_staged_tf_paths_match_direct(spark):
    """The tf_table staged paths (r9) must be value-identical to the
    direct corpus-explode paths — the stats derive by summation from
    the staged per-(doc, gram) counts instead of re-exploding, so the
    counts (and every downstream micro-unit) are equal by
    construction; pin it anyway, round-tripping the stage through
    parquet exactly as the registered queries do."""
    import os
    import tempfile

    from mr_mpi_blast_spark.operators.search import (bigram_lm_score,
                                                     dsir_log_weights,
                                                     dsir_tf_table,
                                                     lm_tf_table)
    docs = {1: ("the quick brown fox", True),
            2: ("the quick brown dog", True),
            3: ("lorem ipsum dolor sit", False),
            4: ("the quick ipsum", False),
            5: ("x", False)}
    df = spark.createDataFrame(
        [(d, t, tgt) for d, (t, tgt) in docs.items()],
        "doc_id BIGINT, text STRING, is_tgt BOOLEAN")
    with tempfile.TemporaryDirectory() as tmp:
        lm_path = os.path.join(tmp, "lmtf")
        lm_tf_table(df).write.parquet(lm_path)
        direct = {r.doc_id: r for r in bigram_lm_score(df).collect()}
        staged = {r.doc_id: r for r in bigram_lm_score(
            df, tf_table=spark.read.parquet(lm_path)).collect()}
        assert staged == direct

        ds_path = os.path.join(tmp, "dsirtf")
        dsir_tf_table(df, F.col("is_tgt"), n_buckets=64) \
            .write.parquet(ds_path)
        direct = {r.doc_id: r for r in dsir_log_weights(
            df, F.col("is_tgt"), n_buckets=64).collect()}
        staged = {r.doc_id: r for r in dsir_log_weights(
            df, F.col("is_tgt"), n_buckets=64,
            tf_table=spark.read.parquet(ds_path)).collect()}
        assert staged == direct


def test_dsir_sample_nesting_and_policy(spark):
    """dsir_sample: samples nest in base_rate (the id bucket is
    fixed); featureless docs are excluded by stated policy; the
    argmax-weight doc survives at base_rate=1 (its normalized rate is
    exactly 1); validation rejects out-of-range rates."""
    from mr_mpi_blast_spark.operators.search import (dsir_log_weights,
                                                     dsir_sample)

    rows = [(i, "en" if i % 3 == 0 else "xx",
             ("spark shuffle join " if i % 3 == 0 else "row scan agg ")
             * (3 + i % 4)) for i in range(40)]
    rows.append((99, "en", "solo"))  # 1 token -> no bigrams -> excluded
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    pred = F.col("lang") == "en"

    small = {r.doc_id for r in dsir_sample(df, pred, 0.4).collect()}
    big = {r.doc_id for r in dsir_sample(df, pred, 1.0).collect()}
    assert small <= big and big
    assert 99 not in big                       # featureless: excluded
    w = dsir_log_weights(df, pred).collect()
    top = max((r for r in w if r.n_features > 0),
              key=lambda r: (r.log_weight, -r.doc_id))
    assert top.doc_id in big                   # rate(argmax) == base_rate=1
    out_cols = set(dsir_sample(df, pred, 1.0).columns)
    assert {"doc_id", "lang", "text", "n_features", "log_weight"} == out_cols

    import pytest as _pytest
    with _pytest.raises(ValueError):
        dsir_sample(df, pred, 1.5)
