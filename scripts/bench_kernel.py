#!/usr/bin/env python
"""Kernel micro-bench: batched vs sequential paths, exact-word vs
neighborhood (-threshold) seeding, on a deterministic synthetic protein
corpus (no Spark session — pure kernel throughput, single thread).

Prints one JSON line:
  {"exact_w4": {"batched": s, "sequential": s, "hits": n},
   "nb_w3_t11": {"batched": s, "sequential": s, "hits": n}}

Context for the numbers: at word_size=3/T=11 the neighborhood yields
~500x more seed hits than exact w4 on the same corpus (every query
word seeds on ~65 neighbor words), so wall-clock is not comparable
across configs — per-hit cost is. The batched path must beat the
sequential per-seed loop at equal output (parity is pinned by
tests/test_batched_parity.py).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mr_mpi_blast_spark.config import BlastConfig
from mr_mpi_blast_spark.kernel.builtin import (SubjectIndex,
                                               _align_query_sequential,
                                               align_block, align_query)

RES20 = "ARNDCQEGHILKMFPSTWYV"


def _corpus(seed=7, n_subjects=60, sub_len=400, n_queries=30, q_len=150):
    rng = np.random.default_rng(seed)

    def rp(n):
        return "".join(rng.choice(list(RES20), size=n))

    def mut(s, r):
        out = list(s)
        for i in range(len(out)):
            if rng.random() < r:
                out[i] = RES20[rng.integers(20)]
        return "".join(out)

    subjects = [(f"s{i}", rp(sub_len)) for i in range(n_subjects)]
    queries = []
    for qn in range(n_queries):
        src = subjects[rng.integers(n_subjects)][1]
        a = int(rng.integers(0, sub_len - q_len))
        queries.append((qn, mut(src[a:a + q_len], 0.1)))
    return subjects, queries


def _time(fn, queries, reps=3):
    best = float("inf")
    hits = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        hits = sum(len(fn(q, s)) for q, s in queries)
        best = min(best, time.perf_counter() - t0)
    return best, hits


def _corpus_dna(seed=7, n_subjects=60, sub_len=2000, n_queries=30,
                q_len=300):
    from mr_mpi_blast_spark.kernel.builtin import revcomp
    rng = np.random.default_rng(seed)
    nucs = "ACGT"
    subjects = [(f"s{i}", "".join(rng.choice(list(nucs), size=sub_len)))
                for i in range(n_subjects)]
    queries = []
    for qn in range(n_queries):
        src = subjects[rng.integers(n_subjects)][1]
        a = int(rng.integers(0, sub_len - q_len))
        frag = "".join(c if rng.random() > 0.05 else nucs[rng.integers(4)]
                       for c in src[a:a + q_len])
        queries.append((qn, revcomp(frag) if qn % 2 else frag))
    return subjects, queries


def main():
    prot_subjects, prot_queries = _corpus()
    dna_subjects, dna_queries = _corpus_dna()
    out = {}
    for label, cfg in [
        ("exact_w4", BlastConfig(task="blastp", word_size=4)),
        ("nb_w3_t11", BlastConfig(task="blastp", word_size=3,
                                  threshold=11)),
        ("blastn_w8", BlastConfig(task="blastn", word_size=8,
                                  min_score=12)),
        ("blastn_w11", BlastConfig(task="blastn", word_size=11,
                                   min_score=16)),
        ("nb_w3_t11_win40", BlastConfig(task="blastp", word_size=3,
                                        threshold=11, window_size=40)),
        ("exact_w4_gapped", BlastConfig(task="blastp", word_size=4,
                                        gapped=True)),
        ("blastn_w8_gapped", BlastConfig(task="blastn", word_size=8,
                                         min_score=12, reward=2, penalty=-3,
                                         gapped=True)),
    ]:
        if cfg.task == "blastn":
            subjects, queries = dna_subjects, dna_queries
        else:
            subjects, queries = prot_subjects, prot_queries
        idx = SubjectIndex(subjects, cfg.word_size, 4096,
                           protein=cfg.task == "blastp")
        # warm the per-volume word/neighborhood caches for BOTH paths
        # (the pipeline reuses them across blocks the same way)
        for q, s in queries:
            align_query(q, s, idx, cfg)
            _align_query_sequential(q, s, idx, cfg)
        tb, nb = _time(lambda q, s: align_query(q, s, idx, cfg), queries)
        ts, ns = _time(lambda q, s: _align_query_sequential(q, s, idx, cfg),
                       queries)
        assert nb == ns, (label, nb, ns)
        # block-level batching: the whole query list in ONE call (the
        # align_block hot path the pipeline actually runs)
        tblk = float("inf")
        nblk = 0
        for _ in range(3):
            t0 = time.perf_counter()
            nblk = len(align_block(queries, idx, cfg))
            tblk = min(tblk, time.perf_counter() - t0)
        assert nblk == ns, (label, nblk, ns)
        out[label] = {"block_s": round(tblk, 3), "batched_s": round(tb, 3),
                      "sequential_s": round(ts, 3),
                      "speedup": round(ts / tb, 2),
                      "block_speedup": round(ts / tblk, 2), "hits": nb}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
