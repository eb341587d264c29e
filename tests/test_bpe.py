"""BPE tokenizer learning: canonical semantics vs a pure-Python
token-list reference, merge-apply boundary behavior (the cases a
string-replace implementation gets wrong), determinism, and edges.
The DuckDB oracle parity lives in test_facade_oracles.py."""

import random
import statistics
import time

import pytest
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.bpe import (BPE_DELIM, _apply_merge,
                                              bpe_encode, bpe_encode_words,
                                              bpe_learn, bpe_learn_iter,
                                              word_counts)


def _bpe_ref(word_freqs: dict[str, int], n_merges: int):
    """Canonical BPE over token lists (greedy left-to-right apply)."""
    words = [(list(w), f) for w, f in sorted(word_freqs.items())]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for toks, f in words:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (lft, rgt), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lft, rgt, lft + rgt, n))
        for toks, _ in words:
            out, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == lft
                        and toks[i + 1] == rgt):
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks[:] = out
    return merges


def _wc_df(spark, word_freqs):
    return spark.createDataFrame(sorted(word_freqs.items()),
                                 "word string, wf long")


def _learned(spark, word_freqs, n):
    return [(m.rank, m.lft, m.rgt, m.lft + m.rgt, m.n)
            for m in bpe_learn(_wc_df(spark, word_freqs), n)]


@pytest.mark.slow
def test_bpe_classic_corpus(spark):
    """The Sennrich toy corpus: merges match the canonical reference
    rank for rank, counts included. (Slow suite: 6 iterations of
    growing fold-stack plan compiles; the default-run canonical pin
    is the 3-merge boundary-hazard test below plus the facade
    oracle.)"""
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert _learned(spark, wf, 6) == _bpe_ref(wf, 6)


def test_bpe_boundary_hazard_canonical(spark):
    """After merge 1 fuses (e, s) into 'es', merge 2 = (w, e) must NOT
    touch the [w, es] token sequence ('es' merely STARTS with 'e') —
    the exact case a string-replace merge-apply over the delimited
    form corrupts, changing merge 3."""
    wf = {"es": 10, "wes": 6, "wet": 5, "weq": 4}
    ref = _bpe_ref(wf, 3)
    assert [(m[1], m[2]) for m in ref] == [("e", "s"), ("w", "e"),
                                           ("w", "es")]
    assert _learned(spark, wf, 3) == ref


def test_apply_merge_fold_semantics(spark):
    """Direct fold checks: greedy non-overlap, consecutive pairs, and
    both boundary-hazard directions (rgt-prefix, lft-suffix)."""
    d = BPE_DELIM
    cases = [
        (("a", "a"), ["a", "a", "a"], f"aa{d}a"),      # greedy leftmost
        (("a", "b"), ["a", "b", "a", "b"], f"ab{d}ab"),  # both pairs
        (("w", "e"), ["w", "es"], f"w{d}es"),          # rgt-prefix: no
        (("a", "b"), ["xa", "b"], f"xa{d}b"),          # lft-suffix: no
        (("a", "b"), ["w"], "w"),                      # single token
    ]
    rows = [(i, d.join(toks)) for i, ((_, _), toks, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, t string")
    for i, ((lft, rgt), _, want) in enumerate(cases):
        got = (df.filter(F.col("i") == i)
               .select(_apply_merge(F.col("t"), lft, rgt).alias("t"))
               .first().t)
        assert got == want, (lft, rgt)


@pytest.mark.slow
def test_bpe_256_merges_values_and_flat_cost(spark):
    """The merge-count scale regime (r9): 256 merges on a seeded
    synthetic vocabulary, value-exact against the canonical Python
    reference for the FULL chain, with per-iteration wall time staying
    flat — the staged-materialization loop applies exactly one fold to
    the previous localCheckpoint, so iteration 250 must cost what
    iteration 5 cost (the pre-r9 stacked-fold form was O(n_merges²)
    with a 256-deep lambda chain by the end). Synthetic vocabulary
    because the sf0.01 testdata corpus has only 31 distinct words —
    BPE exhausts its pairs far before 256 merges there."""
    rng = random.Random(42)
    wf = {"".join(rng.choice("abcdefghijklmnopqrst")
                  for _ in range(rng.randint(8, 14))): rng.randint(1, 50)
          for _ in range(400)}
    n = 256
    ref = _bpe_ref(dict(wf), n)
    assert len(ref) == n, "vocabulary too small to sustain 256 merges"
    got, times = [], []
    t0 = time.monotonic()
    for m in bpe_learn_iter(_wc_df(spark, wf), n):
        t1 = time.monotonic()
        times.append(t1 - t0)
        t0 = t1
        got.append((m.rank, m.lft, m.rgt, m.lft + m.rgt, m.n))
    assert got == ref
    # Flatness: generous 4x bound (box noise comes in multi-second
    # bursts; compare quartile medians, not extremes). The pre-r9
    # form's last-quartile median would be ~40x the first's here.
    first_q = statistics.median(times[:64])
    last_q = statistics.median(times[-64:])
    assert last_q < 4 * first_q + 0.5, (first_q, last_q)


@pytest.mark.slow
def test_bpe_1024_merges_flat_cost(spark):
    """The production-merge-count tier (r10): 1024 merges, value-exact
    against the python reference end-to-end, per-iteration wall time
    flat (quartile medians) — four materialization generations beyond
    the 256 test, so any per-generation cost accumulation (lineage,
    block-manager pressure, plan depth) would show. The full
    4096-merge curve is committed evidence from scripts/bpe_curve.py
    (PLANS.md round-10 section) — at ~15 min end-to-end it lives
    there, not in the suite; this tier keeps the claim regression-
    tested at suite-compatible cost. Shuffle partitions are pinned
    low for the probe: 32 reduce tasks on a 2k-row working set would
    measure scheduler overhead, not the loop."""
    rng = random.Random(1337)
    wf = {"".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                  for _ in range(rng.randint(14, 22))): rng.randint(1, 50)
          for _ in range(1200)}
    n = 1024
    ref = _bpe_ref(dict(wf), n)
    assert len(ref) == n, "vocabulary too small to sustain 1024 merges"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        got, times = [], []
        t0 = time.monotonic()
        for m in bpe_learn_iter(_wc_df(spark, wf).coalesce(4), n):
            t1 = time.monotonic()
            times.append(t1 - t0)
            t0 = t1
            got.append((m.rank, m.lft, m.rgt, m.lft + m.rgt, m.n))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got == ref
    first_q = statistics.median(times[:256])
    last_q = statistics.median(times[-256:])
    assert last_q < 4 * first_q + 0.5, (first_q, last_q)


def test_bpe_materialize_every_equivalence(spark):
    """materialize_every > 1 (bounded fold stacking between
    checkpoints) and a caller-supplied materializer change execution
    shape only, never values."""
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    want = _bpe_ref(wf, 4)
    assert _learned(spark, wf, 4) == want
    got_k3 = [(m.rank, m.lft, m.rgt, m.lft + m.rgt, m.n)
              for m in bpe_learn(_wc_df(spark, wf), 4,
                                 materialize_every=3)]
    assert got_k3 == want
    staged = [(m.rank, m.lft, m.rgt, m.lft + m.rgt, m.n)
              for m in bpe_learn(_wc_df(spark, wf), 4,
                                 materialize=lambda df: df)]
    assert staged == want
    with pytest.raises(ValueError, match="materialize_every"):
        bpe_learn(_wc_df(spark, wf), 2, materialize_every=0)


def test_bpe_early_stop_and_validation(spark):
    """Single-character words have no pairs: zero merges regardless of
    the requested count; n_merges < 1 raises."""
    assert _learned(spark, {"a": 5, "b": 3}, 4) == []
    with pytest.raises(ValueError, match="n_merges"):
        bpe_learn(_wc_df(spark, {"ab": 1}), 0)
    # the iterator entry point must raise at CALL time, not first
    # next() (r9 review find: a bare generator deferred it)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_learn_iter(_wc_df(spark, {"ab": 1}), 0)
    with pytest.raises(ValueError, match="materialize_every"):
        bpe_learn_iter(_wc_df(spark, {"ab": 1}), 2, materialize_every=0)


def _ref_encode(word: str, merges) -> list[str]:
    """Greedy left-to-right apply of each merge in rank order — the
    canonical BPE encode for one word."""
    toks = list(word)
    for _, lft, rgt, _, _ in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == lft and toks[i + 1] == rgt:
                out.append(lft + rgt)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_encode_words_canonical(spark):
    """Vocabulary encode matches the canonical per-word greedy apply
    of the learned merge chain, and decode-by-concatenation recovers
    every word exactly (merges only ever fuse adjacent tokens)."""
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_learn(_wc_df(spark, wf), 5)
    ref = _bpe_ref(dict(wf), 5)
    assert [(m.rank, m.lft, m.rgt) for m in merges] == \
        [(r, l, g) for r, l, g, _, _ in ref]
    enc = {r.word: r.tokens
           for r in bpe_encode_words(
               _wc_df(spark, wf).select("word"), merges,
               materialize_every=2).collect()}
    for w in wf:
        assert enc[w] == _ref_encode(w, ref), w
        assert "".join(enc[w]) == w


def test_bpe_encode_roundtrip_random(spark):
    """Round-trip property on a seeded random vocabulary: for every
    word, concatenating its BPE tokens recovers the word."""
    rng = random.Random(7)
    wf = {"".join(rng.choice("abcdef") for _ in range(rng.randint(1, 12))):
          rng.randint(1, 9) for _ in range(120)}
    merges = bpe_learn(_wc_df(spark, wf), 12)
    assert len(merges) == 12
    rows = bpe_encode_words(_wc_df(spark, wf).select("word"),
                            merges, materialize_every=4).collect()
    assert len(rows) == len(wf)
    for r in rows:
        assert "".join(r.tokens) == r.word
        assert all(t != "" for t in r.tokens)


def test_bpe_encode_docs(spark):
    """Doc-level encode: positional reassembly across words, token
    counts, normalization, and the empty-document left-join edge."""
    docs = spark.createDataFrame(
        [(1, "low lower low"), (2, "  Newest   WIDEST "), (3, ""),
         (4, None)],
        "doc_id long, text string")
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_learn(_wc_df(spark, wf), 4)
    ref = _bpe_ref(dict(wf), 4)
    got = {r.doc_id: (r.n_tokens, r.token_str)
           for r in bpe_encode(docs, merges).collect()}
    exp1 = (_ref_encode("low", ref) + _ref_encode("lower", ref)
            + _ref_encode("low", ref))
    exp2 = _ref_encode("newest", ref) + _ref_encode("widest", ref)
    assert got[1] == (len(exp1), " ".join(exp1))
    assert got[2] == (len(exp2), " ".join(exp2))
    assert got[3] == (0, "")
    assert got[4] == (0, "")
    # zero merges: pure character tokenization
    got0 = {r.doc_id: r.token_str for r in bpe_encode(docs, []).collect()}
    assert got0[1] == " ".join("low lower low".replace(" ", ""))


def test_word_counts_normalizes(spark):
    docs = spark.createDataFrame(
        [(1, "The  Quick   quick"), (2, ""), (3, "quick")],
        "doc_id long, text string")
    got = {r.word: r.wf for r in word_counts(docs).collect()}
    assert got == {"the": 1, "quick": 3}


def _hf_tokenizers():
    try:
        import tokenizers
        return tokenizers
    except ImportError:
        return None


@pytest.mark.skipif(_hf_tokenizers() is None,
                    reason="HuggingFace tokenizers not installed")
def test_bpe_parity_with_hf_tokenizers(spark):
    """Env-gated external-parity check (the BLAST+-parity analog for
    the tokenizer family): on a TIE-FREE fixture — every iteration
    has a strictly-unique max-count pair, so any tie policy yields
    the same sequence — HuggingFace tokenizers' BPE trainer must
    learn the same merges in the same order, and its encoder must
    produce the same tokens our greedy rank-order fold does (the two
    apply algorithms are canonically equivalent: a merge's sides only
    involve tokens from strictly lower ranks, so lower-rank pairs can
    never be re-created by a later merge)."""
    import json as _json

    tokenizers = _hf_tokenizers()
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    # frequencies chosen so the ARGMAX pair count is strictly unique
    # at every iteration — verified below by replaying the pair
    # tables, not by eyeballing the winners (distinct winner counts
    # across iterations would not rule out a within-iteration tie)
    wf = {"aaab": 97, "aab": 41, "abab": 17, "bbba": 7, "ba": 3}
    n = 4
    ref = _bpe_ref(dict(wf), n)

    words = [(list(w), f) for w, f in sorted(wf.items())]
    for rank, lft, rgt, _, _ in ref:
        counts: dict[tuple[str, str], int] = {}
        for toks, f in words:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + f
        top = sorted(counts.values(), reverse=True)
        assert len(top) < 2 or top[0] != top[1], \
            f"fixture has an argmax tie at iteration {rank}"
        for toks, _ in words:
            out, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == lft
                        and toks[i + 1] == rgt):
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks[:] = out

    corpus = [" ".join([w] * f) for w, f in wf.items()]
    alphabet = sorted({c for w in wf for c in w})
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    trainer = trainers.BpeTrainer(
        vocab_size=len(alphabet) + n, min_frequency=1,
        show_progress=False, special_tokens=[],
        initial_alphabet=alphabet)
    tok.train_from_iterator(corpus, trainer)
    hf_merges = _json.loads(tok.to_str())["model"]["merges"]
    hf_pairs = [tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
                for m in hf_merges]
    assert hf_pairs == [(l, r) for _, l, r, _, _ in ref]

    merges = bpe_learn(_wc_df(spark, wf), n)
    assert [(m.lft, m.rgt) for m in merges] == hf_pairs
    enc = {r.word: r.tokens
           for r in bpe_encode_words(
               _wc_df(spark, wf).select("word"), merges).collect()}
    for w in wf:
        assert tok.encode(w).tokens == enc[w], w


def test_bpe_encode_oracle_early_stop(spark):
    """Engine/oracle agreement when the corpus exhausts its pairs
    BEFORE n_merges (the r9 review find): the oracle's per-merge CTE
    is a LEFT JOIN ON TRUE, so an empty b{k} passes tokens through
    unchanged — a cross join there annihilated the vocabulary chain
    and reported every document as n_tokens=0 while the engine,
    fed the shorter learned list, encoded normally. Latent on the
    shipped corpora (they sustain all 6 merges); armed by any small
    corpus or larger n_merges."""
    import duckdb

    from mr_mpi_blast_spark.operators.bpe import (bpe_encode,
                                                  bpe_encode_oracle_sql,
                                                  word_counts)
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "b a"), (3, "")],
        "doc_id long, text string")
    n_req = 4                      # only 2 merges are learnable
    merges = bpe_learn(word_counts(docs), n_req)
    assert 0 < len(merges) < n_req
    got = {r.doc_id: (r.n_tokens, r.token_str)
           for r in bpe_encode(docs, merges).collect()}
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    want = {r[0]: (r[1], r[2])
            for r in con.execute(
                bpe_encode_oracle_sql(n_req, norm)).fetchall()}
    assert got == want
    assert got[1][0] > 0           # the collapse reported 0 here
