"""DuckDB oracle checks for the thin relational facades.

These 11 queries register at the tail of the entry registry (after the
substantive operators), which puts them outside the external driver's
bounded recording prefix. This suite keeps their value-level evidence
self-contained in the repo: each facade's Spark result is compared
against its own `oracle_sql()` entry executed by DuckDB over the same
parquet tables at sf0.001 — identical comparison semantics to
scripts/check_correctness.py (order-insensitive, name-sorted columns,
integer/float dtype drift is a failure because the driver's value-hash
is representation-sensitive).
"""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

FACADES = [
    "workitem_cross", "union_slices", "filter_scan", "aggregate_shuffle",
    "gather_coalesce", "global_topn", "distinct_dims", "semi_join",
    "anti_join", "set_intersect", "set_except",
    # correctness-only exhaustive twins (each a twin/projection of a
    # recorded query) — registered in the tail so unique-evidence
    # queries keep the driver's prefix slots. r7 moved the gapped/
    # capped blastn tails INTO the recorded prefix (the reference's
    # default mode is unique evidence) and demoted these three twins:
    # dedup_simhash (projection of dedup_simhash_pairs),
    # ann_ivf_nprobe2 (parameter twin of ann_ivf_topk),
    # multimodal_resize (meta-plumbing twin of multimodal_decode).
    "dedup_ngram_jaccard", "ann_cosine_topk",
    "dedup_simhash", "ann_ivf_nprobe2", "multimodal_resize",
    # PII scrub: derived pseudo-PII machinery check (tail-registered)
    "text_pii_scrub", "text_repetition",
    # r8: decontam_ngram moved INTO the driver prefix (unique
    # semantics); ann_cosine_topk_numpy demoted here in its place
    # (same _ANN_ORACLE as ann_cosine_topk — BLAS-path twin), and the
    # boilerplate-capped decontam variant registers as a tail twin
    "ann_cosine_topk_numpy", "decontam_ngram_capped",
    # r8: BM25 retrieval + corpus-LM perplexity filter (new operators;
    # window full — micro-unit integer-sum determinism, see
    # operators/search.py)
    "text_bm25_search", "text_lm_score",
    # r8: SemDeDup cluster-then-prune (new operator; window full)
    "embedding_semdedup",
    # r8: DSIR hashed-bigram importance weights (new operator; window
    # full — md5-prefix bucketing computed identically in both engines)
    "dsir_weights",
    # r8: BPE tokenizer learning (new operator; window full — strings
    # + exact integer counts, oracle replays the iteration chain)
    "bpe_merges",
    # r9: BPE corpus encode (apply step; window full — the oracle
    # replays learn-then-encode end to end)
    "bpe_encode",
    # r9: ExactSubstr span removal (apply step of dedup_substr_spans;
    # window full — strings + exact integer counts)
    "dedup_substr_remove",
    # r9: SQ8 quantized ANN (window full — stage-1 candidate cut is
    # exact integer math, stage-2 re-rank shares the ann_cosine_topk
    # rounding contract)
    "ann_sq8_topk",
    # r9: temperature-scaled domain mixing weights (window full —
    # exact integer token sums, sqrt power, sorted-fold denominator)
    "mix_weights",
    # r9: JSONL source/sink round-trip (window full — the oracle is
    # the source table; exact value preservation through JSON)
    "jsonl_roundtrip",
    # r9: 2-D skyline (window full — the oracle is the independent
    # quadratic NOT-EXISTS definition, validating the sweep itself)
    "skyline_parts",
    # r9: top-k similarity join (window full — engine searches via
    # the exact join-count form, oracle ranks the naive quadratic
    # join on shingle text)
    "similarity_join_topk",
    # r9: mixed-corpus materialization (apply step of mix_weights;
    # window full — oracle replays weights + md5 bucket arithmetic)
    "mix_sample",
    # r9: quality-aware keeper per near-dup cluster (window full —
    # oracle: recursive closure + shared quality rendering + window)
    "dedup_keep_best",
    # r9 continuation: DSIR resampling apply (window full — oracle
    # replays the shared DSIR CTE chain + max anchor + md5 buckets)
    "dsir_sample",
    # r9 continuation: CCNet head/middle/tail perplexity tiers
    # (window full — oracle: shared LM CTE chain + NTILE window; the
    # engine ranks hierarchically on the exact integer micro mean)
    "ccnet_buckets",
    # r9 continuation: deterministic pre-training shuffle + shards
    # (window full — oracle replays the md5(seed:id) order)
    "corpus_shuffle",
    # r9 continuation: per-column profiling pass (window full —
    # oracle is an independent per-column UNION ALL of aggregates)
    "table_profile",
    # r9 continuation: ORC source/sink round-trip (window full — the
    # oracle is the source table; exact preservation)
    "orc_roundtrip",
    # r9 continuation: PageRank in exact int64 micros (window full —
    # the oracle replays the unrolled power iterations with `//`,
    # matching bit-exactly; no tolerance)
    "graph_pagerank",
    # r9 continuation: temporal analytics trio (window full — exact
    # timestamp/date arithmetic; resample values pass through with no
    # arithmetic so parity is exact)
    "events_funnel", "events_resample", "events_retention",
    # r9 continuation: materialized inverted index (window full —
    # exact integer counts, comma-joined posting rendering)
    "inverted_index",
    # r9 continuation: PIVOT / UNPIVOT pair (window full — oracle is
    # the conditional-aggregation / UNION-ALL form respectively)
    "events_pivot", "lineitem_unpivot",
    # r9 continuation: sliding-window chunking (window full — exact
    # integer window enumeration, identical in both engines)
    "doc_chunks",
    # r9 continuation: CDC pair (window full — apply's oracle builds
    # the post-merge snapshot directly from the change rules; diff's
    # oracle re-derives v2 and the full-outer IS DISTINCT FROM diff)
    "orders_cdc_apply", "orders_snapshot_diff",
    # r9 continuation: z-order manifest + time-RANGE rolling window
    # (window full — exact integer Morton/cents arithmetic; the
    # zorder oracle replays the identical generated expression)
    "lineitem_zorder", "events_rolling",
    # r9 continuation: TPC-H Q5-shape star join, Markov transition
    # matrix, blocked Levenshtein fuzzy join, exact-integer z-score
    # anomaly flag (window full)
    "local_supplier_volume", "events_transitions", "part_fuzzy_match",
    "events_anomaly",
    # r9 continuation: full CUBE lattice with grouping_id (window
    # full — same bit order in both engines, first column = MSB)
    "revenue_cube",
    # r9 continuation: sliding-window aggregate (window full — the
    # oracle enumerates the 4 epoch-aligned member windows per event
    # from floor arithmetic; counts + integer cents)
    "events_sliding",
    # r9 continuation: market-basket co-purchase top-k (window full —
    # hot-basket bound stated; total-order ranking, exact counts)
    "part_copurchase",
    # r9 continuation: histogram-based exact trimmed mean (window
    # full — the oracle is the per-row rank definition, proving the
    # histogram overlap arithmetic IS rank trimming)
    "events_trimmed_mean",
    # r9 continuation: SCD2 history build + incremental view
    # maintenance (window full — IVM's oracle aggregates the
    # post-merge snapshot directly; integer cents meet bit-exactly)
    "events_scd2", "orders_ivm_agg",
    # r9 continuation: count-min sketch heavy hitters (window full —
    # md5-salted hashes make construction bit-identical; the oracle
    # replays the sketch AND the exact side)
    "text_cms_heavy_hitters",
    # r9 continuation: degree-oriented triangle counts (window full —
    # the oracle is the naive triple self-join, an independent
    # definition validating the orientation trick)
    "graph_triangles",
    # r9 continuation: k-core by fixed-round peeling (window full —
    # the oracle replays the exact 12-round unroll as MATERIALIZED
    # CTEs; early stop provably equals the unroll)
    "graph_kcore",
]

# Tail-registered entries with NO value oracle by nature (the driver
# records them rows-only): excluded from the per-facade oracle
# parametrization but part of the tail for the ordering contract.
# r9: run_summary (wall-clock timing epilogue) moved here so its
# recorded prefix slot could go to the value-oracled
# dedup_substr_spans; its deterministic evidence is in test_runlog.py.
TAIL_NO_ORACLE = ["run_summary"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _veq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


# Belt-and-braces: the gapped/capped blastn tails are driver-recorded
# (prefix slots 48-50) but ALSO oracle-checked here, so their value
# evidence survives even if a future registration pushes one past the
# driver's window (the ordering test below fails loudly first).
# blast_pipeline: the flagship's production-tail oracle (r7 — the
# driver previously saw it rows-only) is checked here at sf0.001 too.
PREFIX_TAILS = ["blast_gapped_tail", "blast_gapped_nucl_tail",
                "blast_capped_tail", "blast_pipeline",
                # r9: promoted into the driver prefix (swapped with
                # run_summary) — keep the in-repo parity net per this
                # list's charter
                "dedup_substr_spans"]


@pytest.mark.parametrize("name", FACADES + PREFIX_TAILS)
def test_facade_matches_oracle(spark, oracle_con, name):
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert name in qs and name in oracles
    sdf = qs[name](spark, SF_DIR).toPandas()
    odf = oracle_con.execute(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    for c in sdf.columns:
        si = pd.api.types.is_integer_dtype(sdf[c])
        oi = pd.api.types.is_integer_dtype(odf[c])
        sf = pd.api.types.is_float_dtype(sdf[c])
        of = pd.api.types.is_float_dtype(odf[c])
        assert not ((si and of) or (sf and oi)), (
            f"{name}.{c}: dtype drift spark={sdf[c].dtype} "
            f"oracle={odf[c].dtype} (driver-hash risk)")
    sdf, odf = _canon(sdf), _canon(odf)
    for c in sdf.columns:
        for i, (x, y) in enumerate(zip(sdf[c].tolist(), odf[c].tolist())):
            assert _veq(x, y), f"{name}.{c}[{i}]: spark={x!r} oracle={y!r}"


def test_facades_registered_after_substantive_queries():
    """Registration order is the contract: every tail entry (facade or
    exhaustive twin) sits after every substantive query so the
    driver's bounded prefix records the unique-evidence operators.
    This is plain source order, asserted here so a future edit can't
    silently regress it (and so no post-hoc registry mutation is ever
    needed again). The prefix budget is 50: every unique-evidence
    kernel tail must sit inside it — blast_capped_tail is on the
    boundary (index 49), so the NEXT substantive registration anywhere
    before the tail section fails here, loudly, instead of silently
    pushing a recorded query past the driver's window."""
    names = list(entry.queries())
    tail = set(FACADES) | set(TAIL_NO_ORACLE)
    first_facade = min(names.index(n) for n in tail)
    last_substantive = max(i for i, n in enumerate(names) if n not in tail)
    assert last_substantive < first_facade
    for name in ["blast_tail"] + PREFIX_TAILS:
        assert names.index(name) < 50, (
            f"{name} at registry index {names.index(name)} — outside "
            "the driver's 50-slot recording window; demote a twin "
            "to the tail section")
