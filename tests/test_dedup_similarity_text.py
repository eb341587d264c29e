"""Dedup / similarity / text operators (beyond-reference surface).

The DuckDB oracle gate covers cross-engine value equality; these tests
cover operator semantics the oracle can't: LSH candidate recall vs the
exact path, SimHash banding (pigeonhole completeness), numpy-vs-
expression ANN parity, and planted-near-dup detection."""

import pytest
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.dedup import (exact_dedup,
                                                minhash_lsh_pairs,
                                                ngram_jaccard_pairs,
                                                simhash_near_pairs,
                                                simhash_signatures)
from mr_mpi_blast_spark.operators.similarity import (brute_force_topk,
                                                     brute_force_topk_numpy,
                                                     ivf_topk)
from mr_mpi_blast_spark.functions.text import lang_id
from mr_mpi_blast_spark.session import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_exact_dedup_counts(spark, docs):
    total = docs.count()
    agg = exact_dedup(docs).agg(F.sum("n")).first()[0]
    assert agg == total          # every doc in exactly one group


def test_lsh_equals_exact(spark, docs):
    """MinHash-LSH + verify finds exactly the >= tau pairs the exact
    quadratic path finds (recall 1.0 at the planted similarity)."""
    exact = {(r.da, r.db) for r in
             ngram_jaccard_pairs(docs, 10, 0.8).collect()}
    lsh = {(r.da, r.db) for r in
           minhash_lsh_pairs(docs, 10, 0.8).collect()}
    assert exact, "testdata should contain planted near-duplicates"
    assert lsh == exact


@pytest.mark.slow
def test_prefix_filter_equals_naive(spark, docs):
    """The AllPairs prefix-filtered exact join returns pair-identical
    (da, db, jac) to the naive Σ df² join-count form at two
    thresholds (the prefix-length arithmetic differs per t)."""
    from mr_mpi_blast_spark.operators.dedup import ngram_jaccard_pairs_prefix
    for t in (0.8, 0.5):
        naive = {(r.da, r.db, r.jac) for r in
                 ngram_jaccard_pairs(docs, 10, t).collect()}
        pref = {(r.da, r.db, r.jac) for r in
                ngram_jaccard_pairs_prefix(docs, 10, t).collect()}
        assert naive and pref == naive


def test_dedup_detects_planted_duplicate(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog " * 10),
            (2, "the quick brown fox jumps over the lazy dog " * 10),
            (3, "a completely different document about spark engines " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_dedup(df).filter(F.col("n") > 1).collect()
    assert len(groups) == 1 and groups[0].keeper == 1 and groups[0].n == 2


@pytest.mark.slow
def test_simhash_properties(spark, docs):
    sig = simhash_signatures(docs.limit(50))
    rows = sig.collect()
    assert all(len(r.simhash) == 64 and set(r.simhash) <= {"0", "1"}
               for r in rows)
    # deterministic across invocations
    again = {r.doc_id: r.simhash for r in simhash_signatures(docs.limit(50)).collect()}
    assert {r.doc_id: r.simhash for r in rows} == again


def test_simhash_near_pairs_pigeonhole(spark):
    """A pair within max_hamming MUST be found (banding is lossless up
    to the distance bound); identical docs have distance 0."""
    base = "spark catalyst tungsten shuffle partition broadcast " * 8
    rows = [(1, base), (2, base),
            (3, base.replace("shuffle", "exchange")),
            (4, "entirely unrelated words about biology and genomes " * 8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.da, r.db): r.hamming
             for r in simhash_near_pairs(df, max_hamming=10).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_ann_numpy_matches_expression(spark, emb):
    q = emb.filter(F.col("vec_id") % 20 == 0)
    a = {(r.qid, r.rank): (r.nid, r.cos)
         for r in brute_force_topk(q, emb, k=5).collect()}
    b = {(r.qid, r.rank): (r.nid, r.cos)
         for r in brute_force_topk_numpy(q, emb, k=5).collect()}
    assert a == b


def test_ivf_is_subset_of_bruteforce_space(spark, emb):
    """IVF results are genuine neighbors (cos values match brute-force
    pairs) and each query searches only its bucket."""
    q = emb.filter(F.col("vec_id") % 20 == 0)
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "embedding")
    ivf = ivf_topk(q, emb, cents, k=3).collect()
    assert len(ivf) > 0
    brute = {(r.qid, r.nid): r.cos
             for r in brute_force_topk(q, emb, k=emb.count()).collect()}
    for r in ivf:
        assert brute[(r.qid, r.nid)] == r.cos


def test_lang_id_on_clear_text(spark):
    rows = [(1, "the cat and the dog sat in a corner of the room"),
            (2, "el perro y el gato de la casa que se fue"),
            (3, "der Hund und die Katze ist von dem Haus mit ein Ball"),
            (4, "zzz qqq xxx")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang for r in
           df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_rplsh_pairs_precision_and_recall(spark, emb):
    """The LSH near-dup path returns a SUBSET of the exact pairs
    (candidates are verified with the exact cosine, so precision is 1)
    and at a modest threshold finds nearly all of them."""
    from mr_mpi_blast_spark.operators.similarity import (cosine_pairs_numpy,
                                                         cosine_pairs_rplsh)
    tau = 0.45
    exact = {(r.va, r.vb): r.cos for r in
             cosine_pairs_numpy(emb, tau).collect()}
    # 32 bands => per-pair collision probability ~0.998 at tau=0.45;
    # with only ~7 true pairs at sf0.001 the default 95% plan can
    # legitimately drop 1-2 (small-sample variance), so the recall
    # property is asserted at a band count where a miss means a bug.
    lsh = {(r.va, r.vb): r.cos for r in
           cosine_pairs_rplsh(emb, tau, n_bands=32).collect()}
    assert set(lsh) <= set(exact)                       # precision 1.0
    assert len(lsh) >= 0.9 * len(exact)                 # recall
    for k, v in lsh.items():
        assert v == exact[k]                            # same verify expr


def test_rplsh_deterministic(spark, emb):
    from mr_mpi_blast_spark.operators.similarity import cosine_pairs_rplsh
    a = sorted(map(tuple, cosine_pairs_rplsh(emb, 0.45).collect()))
    b = sorted(map(tuple, cosine_pairs_rplsh(emb, 0.45).collect()))
    assert a == b


def test_cosine_pairs_auto_routes_by_size(spark, emb):
    """Below the cutover the exact broadcast path runs; above it the
    LSH plan (identifiable by its mapInPandas signature stage +
    band-key join) takes over."""
    from mr_mpi_blast_spark.operators.similarity import cosine_pairs_auto
    small = cosine_pairs_auto(emb, 0.45, exact_max_rows=10**9)
    big = cosine_pairs_auto(emb, 0.45, exact_max_rows=1)
    small_plan = small._jdf.queryExecution().analyzed().toString()
    big_plan = big._jdf.queryExecution().analyzed().toString()
    assert "signatures" in big_plan or "FlatMapGroups" in big_plan \
        or big_plan != small_plan
    # both answer the same contract on this corpus (LSH may drop a few;
    # the quantitative recall bound lives in the dedicated test above)
    s = {(r.va, r.vb) for r in small.collect()}
    b = {(r.va, r.vb) for r in big.collect()}
    assert b <= s and len(b) >= 0.5 * len(s)


@pytest.mark.slow
def test_ivf_assign_pandas_parity(spark, emb):
    """The million-centroid assignment path (broadcast centroid matrix
    + BLAS argmax per Arrow batch) must agree row-for-row with the
    literal-expression path on every contract variant — nprobe=1,
    nprobe>1, with_rank — including tie handling (cos floor-rounded to
    1e-6 before ranking, lowest cid wins) and zero-norm vectors."""
    from mr_mpi_blast_spark.operators.similarity import (
        _collect_centroids, _ivf_assign_pandas, ivf_assign)

    cents = _collect_centroids(
        emb.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("cid"), "embedding"),
        "cid", "embedding")
    # a zero-norm row exercises the try_divide/coalesce twin
    zero = spark.createDataFrame(
        [(99999, [0.0] * len(cents[0][1]))],
        "vec_id long, embedding array<double>")
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("embedding")).unionByName(zero)

    for kwargs in ({"nprobe": 1, "with_rank": False},
                   {"nprobe": 1, "with_rank": True},
                   {"nprobe": 3, "with_rank": True},
                   {"nprobe": 2, "with_rank": False}):
        lit = {tuple(r) for r in ivf_assign(vecs, cents, **kwargs).collect()}
        pnd = {tuple(r) for r in _ivf_assign_pandas(
            vecs, cents, "vec_id", "embedding",
            kwargs["nprobe"], kwargs["with_rank"]).collect()}
        assert lit == pnd, f"parity break at {kwargs}"


def test_ivf_assign_auto_switch(spark, emb, monkeypatch):
    """Above IVF_LITERAL_MAX_CENTROIDS, ivf_assign routes to the
    pandas path (plan shows MapInPandas, no generated literal tree)
    and still matches the literal path's assignment."""
    from mr_mpi_blast_spark.operators import similarity as sim

    cents = sim._collect_centroids(
        emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cid"), "embedding"),
        "cid", "embedding")
    vecs = emb.filter(F.col("vec_id") < 200).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    lit_rows = {tuple(r) for r in sim.ivf_assign(vecs, cents).collect()}
    monkeypatch.setattr(sim, "IVF_LITERAL_MAX_CENTROIDS", 4)
    routed = sim.ivf_assign(vecs, cents)
    assert "MapInPandas" in routed._jdf.queryExecution().executedPlan().toString()
    assert {tuple(r) for r in routed.collect()} == lit_rows


def test_trained_ivf_centroids_and_recall(spark):
    """Seeded k-means is deterministic (same seed -> identical
    centroids, different seed -> different), centroids are unit-norm,
    and recall@k rises monotonically with nprobe, reaching 1.0 when
    every bucket is probed (nprobe = k_centroids => exhaustive)."""
    import numpy as np
    from mr_mpi_blast_spark.operators.similarity import (ivf_recall,
                                                         train_ivf_centroids)
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = train_ivf_centroids(e, k=4, n_iter=5, seed=7).collect()
    c2 = train_ivf_centroids(e, k=4, n_iter=5, seed=7).collect()
    c3 = train_ivf_centroids(e, k=4, n_iter=5, seed=8).collect()
    assert [r["embedding"] for r in sorted(c1, key=lambda r: r["cid"])] \
        == [r["embedding"] for r in sorted(c2, key=lambda r: r["cid"])]
    assert [r["embedding"] for r in c1] != [r["embedding"] for r in c3]
    for r in c1:
        assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-9

    cents = train_ivf_centroids(e, k=4, n_iter=5, seed=7)
    q = e.filter(e.vec_id % 10 == 0)
    rec = {r["nprobe"]: r["recall"]
           for r in ivf_recall(q, e, cents, k=3,
                               nprobes=(1, 2, 4)).collect()}
    assert rec[1] <= rec[2] <= rec[4]
    assert rec[4] == 1.0          # probing all 4 buckets == brute force


def test_text_repetition_degenerate_docs(spark, tmp_path):
    """Single-word (and effectively-empty) documents must not crash the
    shuffle-free run-length fold: sequence(1, size-1) on a 1-element
    array is the DESCENDING [1, 0] and ws[1] raises INVALID_ARRAY_INDEX
    under Spark 4 ANSI mode unless the size<2 case is guarded."""
    import __spark_entry__ as e
    rows = [(1, "solo"), (2, "  "), (3, "a a a b"), (4, "u v w x y z")]
    (spark.createDataFrame(rows, "doc_id long, text string")
     .write.parquet(str(tmp_path / "documents.parquet")))
    out = {r.doc_id: r for r in
           e.queries()["text_repetition"](spark, str(tmp_path)).collect()}
    assert 2 not in out                      # all-whitespace doc filtered
    assert out[1].n_words == 1 and out[1].distinct_ratio == 1.0 \
        and out[1].top_word_frac == 1.0
    assert out[3].top_word_frac == 0.75 and out[3].verdict == "repetitive"
    assert out[4].distinct_ratio == 1.0 and out[4].verdict == "ok"


def test_fingerprint_sketch_plan_is_group_limited(spark, docs):
    """The k-min sketch must prune BEFORE aggregation: a dense_rank
    group limit caps collect_set state at k hashes per doc. Without
    it the aggregate holds every distinct shingle hash per document —
    object-hash state that went superlinear at the sf0.1->1.0 decade
    (0.9 s -> 14.9 s for 10x rows). Pin the shape: WindowGroupLimit
    present, and no exchange between the shingle explode and the
    aggregate (documents are co-located by the compute repartition,
    so the prune and the aggregation are partition-local)."""
    from mr_mpi_blast_spark.functions.text import fingerprints
    plan = (fingerprints(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "WindowGroupLimit" in plan
    gen = plan.index("Generate explode")
    assert "Exchange" not in plan[:gen], (
        "shuffle above the shingle explode — the k-min prune is no "
        "longer partition-local")


def test_fingerprint_sketch_values(spark, tmp_path):
    """Sketch = the k smallest md5s over distinct 16-char shingles,
    recomputed naively in Python (hashlib) — pins the dense_rank
    rewrite to the semantic spec independent of the DuckDB oracle."""
    import hashlib as hl
    from mr_mpi_blast_spark.functions.text import fingerprints
    texts = {1: "the quick brown fox jumps over the lazy dog",
             2: "aaaaaaaaaaaaaaaaaaaaaaaa",        # degenerate: 1 shingle
             3: "short",                            # < n chars
             4: "word " * 40}
    rows = [(i, t) for i, t in texts.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in fingerprints(df).collect()}
    for i, t in texts.items():
        norm = " ".join(t.lower().split())
        sh = ({norm[j:j + 16] for j in range(max(len(norm) - 16, 0) + 1)}
              or {norm})
        hashes = sorted(hl.md5(s.encode()).hexdigest() for s in sh)
        assert got[i].fp_exact == hl.md5(norm.encode()).hexdigest()
        assert got[i].fp_sketch == "|".join(hashes[:4]), f"doc {i}"


def test_ngram_collisions_boundaries(spark):
    """Exact w-gram collision edges: a doc with exactly w words forms
    ONE gram; docs shorter than w form none (and must not trip
    sequence(1, n<1), which would count DOWNWARD); collision counts
    are distinct-gram counts, not occurrence counts."""
    from mr_mpi_blast_spark.operators.dedup import ngram_collisions

    w9 = " ".join(f"t{i}" for i in range(9))          # 9 words
    test = spark.createDataFrame(
        [(1, w9),                                      # exactly w
         (2, "too short"),                             # < w: no grams
         (3, f"{w9} {w9}")],                           # repeats the gram
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(10, f"prefix words {w9} suffix words"),      # contains the gram
         (11, "unrelated text entirely different")],
        "doc_id long, text string")
    out = {(r.test_doc, r.train_doc): r.n_collisions
           for r in ngram_collisions(test, train, w=9).collect()}
    # doc 1 and doc 3 each share exactly ONE distinct 9-gram with doc
    # 10; doc 3's internal repeat must not inflate the count; doc 2
    # and doc 11 appear nowhere
    assert out == {(1, 10): 1, (3, 10): 1}
    # max_train_df=None and a cap above every df are both identity
    capped_hi = {(r.test_doc, r.train_doc): r.n_collisions
                 for r in ngram_collisions(test, train, w=9,
                                           max_train_df=5).collect()}
    assert capped_hi == out
    # a staged (train_doc, gh) table is a drop-in for deriving train
    # grams from text (the one-time-build path for production reuse)
    from mr_mpi_blast_spark.operators.dedup import word_gram_hashes
    staged = word_gram_hashes(train, 9, "train_doc")
    via_staged = {(r.test_doc, r.train_doc): r.n_collisions
                  for r in ngram_collisions(test, train, w=9,
                                            max_train_df=5,
                                            train_grams=staged).collect()}
    assert via_staged == out


def test_ngram_collisions_boilerplate_cap(spark):
    """The train-side df cap drops boilerplate grams BEFORE the join.

    Fixture: one 'license header' 9-gram shared by 8 train docs and 4
    test docs (train-df 8), plus one genuinely leaked 9-gram in 1
    train + 1 test doc (train-df 1). Each doc is exactly the gram (9
    words), so collision-join input rows = Σ f·g over surviving grams:
    uncapped 8*4 + 1*1 = 33, capped (max_train_df=2) just 1 — the f·g
    quadratic blow-up a ubiquitous gram causes at web scale, removed
    by a map-side-combinable count + left-semi join, not by AQE
    splitting (which shares the rows out but cannot shrink them)."""
    from mr_mpi_blast_spark.operators.dedup import ngram_collisions

    boiler = " ".join(f"b{i}" for i in range(9))
    leak = " ".join(f"l{i}" for i in range(9))
    train = spark.createDataFrame(
        [(i, boiler) for i in range(8)] + [(8, leak)],
        "doc_id long, text string")
    test = spark.createDataFrame(
        [(100 + i, boiler) for i in range(4)] + [(104, leak)],
        "doc_id long, text string")

    uncapped = {(r.test_doc, r.train_doc)
                for r in ngram_collisions(test, train, w=9).collect()}
    assert len(uncapped) == 8 * 4 + 1          # the f*g join blow-up
    capped = {(r.test_doc, r.train_doc)
              for r in ngram_collisions(test, train, w=9,
                                        max_train_df=2).collect()}
    # the genuine leak survives; every boilerplate-driven pair is gone
    assert capped == {(104, 8)}
    # cap boundary is inclusive: df == cap survives
    at_cap = {(r.test_doc, r.train_doc)
              for r in ngram_collisions(test, train, w=9,
                                        max_train_df=8).collect()}
    assert at_cap == uncapped


def test_signature_cache_release(spark):
    """Library persist() lifecycle: the pair generators register their
    persisted signature tables so callers can release them — a
    long-lived session looping over corpora must not accumulate cached
    storage (VERDICT r7 item 5). Compared as persistent-RDD ID SETS,
    not counts: ContextCleaner unpersists other tests' dereferenced
    caches asynchronously, so a count-delta assertion flakes whenever
    a stale fixture cache happens to be collected mid-test (observed
    under load, r9); old ids can only DISAPPEAR, so asserting on the
    new-id set is exact."""
    from mr_mpi_blast_spark.operators.dedup import (
        release_signature_caches, signature_cache_scope)

    def persist_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    release_signature_caches()                 # clean slate (this module)
    rows = [(i, f"some shared prefix text {i} with enough characters "
                f"to shingle properly {i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    ids0 = persist_ids()
    minhash_lsh_pairs(df, n=10, threshold=0.5).count()
    simhash_near_pairs(df).count()
    new = persist_ids() - ids0
    assert len(new) == 2                       # the two signature tables
    assert release_signature_caches() == 2
    assert not (persist_ids() & new)

    ids0 = persist_ids()
    with signature_cache_scope():
        minhash_lsh_pairs(df, n=10, threshold=0.5).count()
        new = persist_ids() - ids0
        assert len(new) == 1
    assert not (persist_ids() & new)


def test_duplicate_span_profile_semantics(spark):
    """ExactSubstr span edges: a 7-token cross-doc duplicate block
    merges its 3 overlapping dup 5-grams into ONE maximal span;
    non-contiguous dup positions whose gram intervals still overlap
    merge (interval union, not position adjacency); a within-doc
    repeat counts as duplication (any second occurrence); docs
    shorter than min_len appear with zeroed counts; clean docs
    appear with zeroed counts."""
    from mr_mpi_blast_spark.operators.dedup import duplicate_span_profile

    B = " ".join(f"b{i}" for i in range(7))     # shared 7-token block
    W = [f"w{i}" for i in range(7)]
    docs = spark.createDataFrame([
        (1, f"a0 a1 {B} a2 a3"),                 # B at pos 3..9 of 11
        (2, f"c0 {B} c1 c2 c3"),                 # B at pos 2..8 of 11
        # doc 3: pos-1 gram dup'd via doc 4, pos-3 gram dup'd via doc
        # 5, pos-2 gram unique -> islands 1 and 3 overlap through the
        # gram length and must merge into one 7-token span
        (3, " ".join(W)),
        (4, f"u0 {' '.join(W[:5])} u1"),         # w0..w4 at pos 2..6
        (5, f"{' '.join(W[2:])} v0 v1"),         # w2..w6 at pos 1..5
        # doc 6: the same 5-gram twice WITHIN one doc (13 tokens)
        (6, "d0 d1 d2 d3 d4 z0 z1 z2 d0 d1 d2 d3 d4"),
        (7, "short doc"),                        # < min_len: no grams
        (8, "e0 e1 e2 e3 e4 e5"),                # clean, >= min_len
    ], "doc_id long, text string")

    out = {r.doc_id: r for r in
           duplicate_span_profile(docs, min_len=5).collect()}
    assert len(out) == 8                        # every doc has a row
    exp = {
        1: (11, 1, 7), 2: (11, 1, 7),           # one merged 7-token span
        3: (7, 1, 7),                            # overlap-merge: 1..7
        4: (7, 1, 5), 5: (7, 1, 5),
        6: (13, 2, 10),                          # within-doc repeat
        7: (2, 0, 0), 8: (6, 0, 0),
    }
    got = {k: (v.n_tokens, v.n_dup_spans, v.dup_tokens)
           for k, v in out.items()}
    assert got == exp
    assert out[6].dup_frac == pytest.approx(0.7692)   # floor 1e-4
    assert out[1].dup_frac == pytest.approx(0.6364)   # 7/11
    assert out[7].dup_frac == 0.0


# ---------------------------------------------------------------------------
# SemDeDup (r8): k-means partition + within-cluster cosine prune
# ---------------------------------------------------------------------------

def _semdedup_fixture(spark):
    """2-D hand fixture: two planted duplicate pairs (one per
    cluster), a tie-assigned diagonal vector, an anti-aligned vector,
    and a zero-norm vector."""
    from mr_mpi_blast_spark.operators.similarity import centroid_triples
    cents = centroid_triples([(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]),        # cluster 0, cent_cos = 1.0
         (2, [0.999, 0.02]),     # cluster 0, near-dup of 1
         (3, [0.7, 0.7]),        # equidistant tie -> cluster 0 (low cid)
         (4, [0.0, 1.0]),        # cluster 1, cent_cos = 1.0
         (5, [0.02, 0.999]),     # cluster 1, near-dup of 4
         (6, [-1.0, 0.0]),       # cluster 1 (cos 0 beats cos -1)
         (7, [0.0, 0.0])],       # zero norm: cos 0 everywhere -> c0
        "vec_id long, embedding array<double>")
    return vecs, cents


def test_semdedup_keep_farthest(spark):
    """Paper-default rule: within each tau-duplicate set the member
    with the LOWEST centroid similarity survives — so the planted
    duplicates drop the centroid-aligned member (1 and 4), and
    below-tau / cross-cluster members are untouched."""
    from mr_mpi_blast_spark.operators.similarity import semdedup
    vecs, cents = _semdedup_fixture(spark)
    rows = {r.vec_id: r for r in
            semdedup(vecs, cents, tau=0.95).collect()}
    assert len(rows) == 7                       # one row per input
    assert {i: r.cid for i, r in rows.items()} == {
        1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1, 7: 0}
    assert {i for i, r in rows.items() if not r.kept} == {1, 4}
    assert rows[1].cent_cos == 1.0
    assert rows[7].cent_cos == 0.0              # zero norm -> cos 0.0
    assert rows[3].cent_cos == pytest.approx(0.707107, abs=1e-6)


def test_semdedup_keep_closest(spark):
    """keep='closest' flips the keep order: the centroid-aligned
    member survives and the off-axis duplicate drops."""
    from mr_mpi_blast_spark.operators.similarity import semdedup
    vecs, cents = _semdedup_fixture(spark)
    rows = semdedup(vecs, cents, tau=0.95, keep="closest").collect()
    assert {r.vec_id for r in rows if not r.kept} == {2, 5}
    with pytest.raises(ValueError, match="keep"):
        semdedup(vecs, cents, tau=0.95, keep="best")
    with pytest.raises(ValueError, match="method"):
        semdedup(vecs, cents, tau=0.95, method="auto")


def test_semdedup_blas_method_parity(spark):
    """The per-cluster BLAS prune (the registered query's method) must
    match the relational join method row-for-row on the hand fixture —
    both keep orders, including the tie-assigned and zero-norm rows."""
    from mr_mpi_blast_spark.operators.similarity import semdedup
    vecs, cents = _semdedup_fixture(spark)
    for keep in ("farthest", "closest"):
        j = {tuple(r) for r in
             semdedup(vecs, cents, tau=0.95, keep=keep).collect()}
        b = {tuple(r) for r in
             semdedup(vecs, cents, tau=0.95, keep=keep,
                      method="blas").collect()}
        assert j == b, keep


def test_semdedup_cross_cluster_blindness(spark):
    """The SemDeDup approximation, pinned: a near-duplicate pair
    SPLIT across two clusters is not examined, so both survive."""
    from mr_mpi_blast_spark.operators.similarity import (centroid_triples,
                                                         semdedup)
    cents = centroid_triples([(0, [1.0, 0.0]), (1, [0.92, 0.4])])
    # cos(a, b) ~ 0.9998, but a sits nearer c0 and b nearer c1
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.195]), (2, [1.0, 0.215])],
        "vec_id long, embedding array<double>")
    rows = semdedup(vecs, cents, tau=0.95).collect()
    assert {r.cid for r in rows} == {0, 1}
    assert all(r.kept for r in rows)


@pytest.mark.slow
def test_semdedup_pandas_path_parity(spark, emb, monkeypatch):
    """Above IVF_LITERAL_MAX_CENTROIDS the assignment runs on the
    broadcast+BLAS pandas path; the full semdedup output (assignment,
    cent_cos, kept flags) must match the literal path row-for-row."""
    from mr_mpi_blast_spark.operators import similarity as sim
    cents = sim._collect_centroids(
        emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cid"), "embedding"),
        "cid", "embedding")
    vecs = emb.filter(F.col("vec_id") < 150).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    lit = {tuple(r) for r in sim.semdedup(vecs, cents, tau=0.45).collect()}
    monkeypatch.setattr(sim, "IVF_LITERAL_MAX_CENTROIDS", 4)
    routed = sim.semdedup(vecs, cents, tau=0.45)
    assert "MapInPandas" in (routed._jdf.queryExecution()
                             .executedPlan().toString())
    assert {tuple(r) for r in routed.collect()} == lit


def test_signature_cache_scope_thread_isolation(spark):
    """A scope releases only its own thread's registrations: a
    concurrent thread's signature table (registered outside any scope
    on that thread) survives the scope exit and is released by the
    global release_signature_caches()."""
    import threading
    from mr_mpi_blast_spark.operators import dedup as dd

    dd.release_signature_caches()                   # clean slate
    outer = []

    def other_thread():
        sig = dd._cache_sigs(spark.range(5))
        sig.count()
        outer.append(sig)

    with dd.signature_cache_scope():
        mine = dd._cache_sigs(spark.range(3))
        mine.count()
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        assert mine.storageLevel.useMemory
    assert not mine.storageLevel.useMemory          # scope released it
    assert outer[0].storageLevel.useMemory          # survived the scope
    assert dd.release_signature_caches() == 1
    assert not outer[0].storageLevel.useMemory


def test_pandas_paths_preserve_id_type(spark, monkeypatch):
    """The BLAS assignment and semdedup prune paths must keep the
    input id column's type (a string id used to crash the Arrow
    conversion; an int id silently widened to long)."""
    from mr_mpi_blast_spark.operators import similarity as sim
    cents = sim.centroid_triples([(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    vecs = spark.createDataFrame(
        [("a1", [1.0, 0.0]), ("b2", [0.9, 0.1]), ("c3", [0.0, 1.0])],
        "vec_id string, embedding array<double>")
    lit = sim.ivf_assign(vecs, cents)
    assert dict(lit.dtypes)["vec_id"] == "string"
    monkeypatch.setattr(sim, "IVF_LITERAL_MAX_CENTROIDS", 1)
    routed = sim.ivf_assign(vecs, cents)
    assert dict(routed.dtypes)["vec_id"] == "string"
    assert ({tuple(r) for r in routed.collect()}
            == {tuple(r) for r in lit.collect()})
    for method in ("join", "blas"):
        sd = sim.semdedup(vecs, cents, tau=0.95, method=method)
        assert dict(sd.dtypes)["vec_id"] == "string"
        assert {r.vec_id for r in sd.collect() if not r.kept} == {"a1"}


def test_ivf_topk_numpy_parity(spark, emb):
    """The BLAS IVF search twin (r9) must agree row-for-row with the
    literal-expression ivf_topk on the real table — nprobe 1 and 2,
    including rank order and the 1e-4 output rounding — and on a
    tie/zero-norm fixture (zero-norm query and corpus rows cos to 0.0
    on both paths; assignment ties take the lowest cid)."""
    from mr_mpi_blast_spark.operators.similarity import (ivf_topk,
                                                         ivf_topk_numpy)

    q = emb.filter(F.col("vec_id") % 20 == 0)
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "embedding")
    for nprobe in (1, 2):
        lit = {tuple(r) for r in
               ivf_topk(q, emb, cents, k=3, nprobe=nprobe).collect()}
        blas = {tuple(r) for r in
                ivf_topk_numpy(q, emb, cents, k=3,
                               nprobe=nprobe).collect()}
        assert lit == blas, f"parity break at nprobe={nprobe}"

    d = 4
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),      # centroid 0
            (1, [0.0, 1.0, 0.0, 0.0]),      # centroid 1
            (2, [1.0, 0.0, 0.0, 0.0]),      # dup of c0 (tie with 0)
            (3, [0.0] * d),                 # zero-norm corpus row
            (4, [0.7, 0.7, 0.0, 0.0]),      # equidistant tie c0/c1
            (5, [0.9, 0.1, 0.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qf = spark.createDataFrame([(10, [1.0, 0.05, 0.0, 0.0]),
                                (11, [0.0] * d)],
                               "vec_id long, embedding array<double>")
    cf = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), "embedding")
    for nprobe in (1, 2):
        lit = {tuple(r) for r in
               ivf_topk(qf, vecs, cf, k=4, nprobe=nprobe).collect()}
        blas = {tuple(r) for r in
                ivf_topk_numpy(qf, vecs, cf, k=4,
                               nprobe=nprobe).collect()}
        assert lit == blas, f"fixture parity break at nprobe={nprobe}"


def test_duplicate_span_remove_semantics(spark):
    """ExactSubstr removal edges: the corpus-first copy of a
    duplicated block survives while every later copy is excised; a
    within-doc repeat keeps its first occurrence; docs shorter than
    min_len and clean docs pass through; a doc whose duplicate block
    is its entire text empties (kept_tokens 0, clean_text '')."""
    from mr_mpi_blast_spark.operators.dedup import duplicate_span_remove

    B = " ".join(f"b{i}" for i in range(7))     # shared 7-token block
    docs = spark.createDataFrame([
        (1, f"a0 a1 {B} a2 a3"),                 # first copy: kept
        (2, f"c0 {B} c1 c2 c3"),                 # later copy: excised
        (3, B),                                  # later copy IS the doc
        (4, "d0 d1 d2 d3 d4 z0 z1 z2 d0 d1 d2 d3 d4"),  # within-doc
        (5, "short doc"),                        # < min_len
        (6, "e0 e1 e2 e3 e4 e5"),                # clean
    ], "doc_id long, text string")

    out = {r.doc_id: r for r in
           duplicate_span_remove(docs, min_len=5).collect()}
    assert len(out) == 6
    got = {k: (v.n_tokens, v.kept_tokens, v.clean_text)
           for k, v in out.items()}
    assert got == {
        1: (11, 11, f"a0 a1 {B} a2 a3"),
        2: (11, 4, "c0 c1 c2 c3"),
        3: (7, 0, ""),
        4: (13, 8, "d0 d1 d2 d3 d4 z0 z1 z2"),
        5: (2, 2, "short doc"),
        6: (6, 6, "e0 e1 e2 e3 e4 e5"),
    }


def test_sq8_topk_exhaustive_refine_equals_bruteforce(spark, emb):
    """SQ8 with a candidate budget covering the whole corpus reduces
    to exact brute force (stage 2 re-scores every vector under the
    identical floor-1e-6/lowest-nid contract) — pinning the re-rank
    path end to end. With the production budget (refine=3) the
    results stay ranked by the same exact cos key, and every returned
    cos equals the brute-force cos for that (qid, nid)."""
    from mr_mpi_blast_spark.operators.similarity import (
        brute_force_topk_numpy, sq8_topk_numpy)

    q = emb.filter(F.col("vec_id") % 20 == 0)
    bf = {(r.qid, r.rank): (r.nid, r.cos)
          for r in brute_force_topk_numpy(q, emb, k=5).collect()}
    full = {(r.qid, r.rank): (r.nid, r.cos)
            for r in sq8_topk_numpy(q, emb, k=5, refine=1000).collect()}
    assert full == bf

    bf_cos = {(r.qid, r.nid): r.cos
              for r in brute_force_topk_numpy(q, emb, k=500).collect()}
    got = sq8_topk_numpy(q, emb, k=5, refine=3).collect()
    assert {r.qid for r in got} == {k[0] for k in bf}
    for r in got:
        assert r.cos == bf_cos[(r.qid, r.nid)]


def test_sq8_topk_zero_norm_and_tie_fixture(spark):
    """SQ8 edges: a zero-norm corpus row scores 0.0 in both stages
    (never NaN), a zero-norm query returns all-0.0 cos with lowest-nid
    rank order, and exact duplicates tie-break by lowest nid."""
    from mr_mpi_blast_spark.operators.similarity import sq8_topk_numpy

    d = 4
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),      # dup of 0 (tie)
            (3, [0.0] * d),                 # zero-norm corpus row
            (4, [0.7, 0.7, 0.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qf = spark.createDataFrame([(10, [1.0, 0.0, 0.0, 0.0]),
                                (11, [0.0] * d)],
                               "vec_id long, embedding array<double>")
    out = {(r.qid, r.rank): (r.nid, r.cos)
           for r in sq8_topk_numpy(qf, vecs, k=5, refine=1).collect()}
    assert out[(10, 1)] == (0, 1.0) and out[(10, 2)] == (2, 1.0)
    assert out[(10, 5)][1] == 0.0           # zero-norm row: cos 0.0
    # zero-norm query: every cos 0.0, ranks by lowest nid
    assert [out[(11, i)][0] for i in range(1, 6)] == [0, 1, 2, 3, 4]
    assert all(out[(11, i)][1] == 0.0 for i in range(1, 6))


def test_sq8_staged_codes_parity(spark, emb):
    """The staged code-table scan (sq8_encode artifact + codes=) must
    return row-identical results to the on-the-fly quantizing scan —
    same codes, same candidate cut, same re-rank."""
    from mr_mpi_blast_spark.operators.similarity import (sq8_encode,
                                                         sq8_scale,
                                                         sq8_topk_numpy)
    q = emb.filter(F.col("vec_id") % 20 == 0)
    scale = sq8_scale(emb)
    codes = sq8_encode(emb, scale)
    fly = {tuple(r) for r in sq8_topk_numpy(q, emb, k=5, refine=3,
                                            scale=scale).collect()}
    stg = {tuple(r) for r in sq8_topk_numpy(q, emb, k=5, refine=3,
                                            scale=scale,
                                            codes=codes).collect()}
    assert fly == stg


def test_bruteforce_numpy_zero_norm_matches_expression(spark):
    """Zero-norm fixture parity for the numpy brute-force path: the
    expression twin scores zero-norm vectors as cos 0.0 (try_divide +
    coalesce); the numpy path's bare division used to emit NaN rows
    instead (latent divergence, r9). Both paths must now agree on a
    fixture WITH zero-norm query and corpus rows."""
    from mr_mpi_blast_spark.operators.similarity import (
        brute_force_topk, brute_force_topk_numpy)

    d = 4
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0] * d),                 # zero-norm corpus row
            (4, [0.7, 0.7, 0.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qf = spark.createDataFrame([(10, [1.0, 0.0, 0.0, 0.0]),
                                (11, [0.0] * d)],   # zero-norm query
                               "vec_id long, embedding array<double>")
    expr = {tuple(r) for r in brute_force_topk(qf, vecs, k=5).collect()}
    blas = {tuple(r) for r in
            brute_force_topk_numpy(qf, vecs, k=5).collect()}
    assert expr == blas
    cos = {(q, n): c for q, n, c, _ in expr}
    assert cos[(10, 3)] == 0.0 and cos[(11, 0)] == 0.0


def _reference_span_remove(docs, L):
    """Pure-Python replay of the duplicate_span_remove semantics, kept
    as the randomized oracle: corpus-first gram occurrence canonical,
    later occurrences marked, interval union per doc, token survives
    iff uncovered."""
    occ = {}
    toks = {d: t.split() for d, t in docs}
    for d, ws in sorted(toks.items()):
        for p in range(len(ws) - L + 1):
            occ.setdefault(" ".join(ws[p:p + L]), []).append((d, p + 1))
    removed = {d: set() for d in toks}
    for gram, places in occ.items():
        if len(places) < 2:
            continue
        for d, p in sorted(places)[1:]:
            removed[d].update(range(p, p + L))
    out = {}
    for d, ws in toks.items():
        kept = [w for i, w in enumerate(ws, 1) if i not in removed[d]]
        out[d] = (len(ws), len(kept), " ".join(kept))
    return out


def test_duplicate_span_remove_random_matches_reference(spark):
    """Randomized semantics net for the removal operator: a seeded
    80-doc corpus over an 8-word vocabulary (dense gram sharing,
    within-doc repeats, heavy overlap-merge pressure) must match the
    pure-Python replay of the declared semantics exactly."""
    import random
    from mr_mpi_blast_spark.operators.dedup import duplicate_span_remove

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(8)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(2, 40))))
            for i in range(80)]
    ref = _reference_span_remove(docs, 5)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.kept_tokens, r.clean_text)
           for r in duplicate_span_remove(df, min_len=5).collect()}
    assert got == ref


def test_dedup_keep_best_prefers_quality_over_min_id(spark):
    """Keeper semantics: within a near-dup cluster the HIGHEST-quality
    member wins even when it has the larger doc_id (the exact case
    keep-min-id gets wrong); quality ties fall to the lowest id."""
    from mr_mpi_blast_spark.functions.text import quality_features
    from mr_mpi_blast_spark.operators.dedup import (connected_components,
                                                    minhash_lsh_pairs,
                                                    signature_cache_scope)
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight ") * 3
    rows = [(1, base + "!!!!!!!!!! ;;;;;;;;;;"),   # punct-laden copy
            (2, base),                             # clean copy: better
            (3, "an unrelated document about entirely different things "
                "with many various words in it " * 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from mr_mpi_blast_spark.operators.dedup import keep_best
    with signature_cache_scope():
        pairs = minhash_lsh_pairs(df, n=10, threshold=0.5)
        comp = connected_components(pairs)
        q = quality_features(df).select("doc_id", "quality")
        rows_out = keep_best(comp, q).collect()       # production path
    got = {r.cluster: (r.keeper, r.n_members) for r in rows_out}
    assert got == {1: (2, 2)}   # cluster of {1,2}: doc 2 wins on quality

    # exact quality tie (identical texts) falls to the LOWEST id
    dup = "same words repeated here for a while now " * 5
    tie = spark.createDataFrame([(7, dup), (5, dup)],
                                "doc_id long, text string")
    with signature_cache_scope():
        p2 = minhash_lsh_pairs(tie, n=10, threshold=0.5)
        c2 = connected_components(p2)
        q2 = quality_features(tie).select("doc_id", "quality")
        out2 = keep_best(c2, q2).collect()
    assert [(r.cluster, r.keeper) for r in out2] == [(5, 5)]
