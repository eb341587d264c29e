"""Builtin deterministic alignment kernel (K1).

The reference's kernel is NCBI C++ BLAST invoked per work item
(mrblast.cpp:700-1176). This engine treats the kernel as pluggable
(SURVEY §7.1): this module is the hermetic default — a deterministic
ungapped seed-and-extend aligner (BLAST's core loop: exact word match
-> X-drop extension -> Karlin-Altschul scoring) in pure Python over
pandas batches, invoked via applyInPandas per query block.

Faithful semantics kept from the reference:
- subject k-mer index built once per DB partition and *cached per
  worker process* across tasks (S7 DB-handle reuse, mrblast.cpp:838-845);
- e-values computed against the effective size of the WHOLE database,
  not the partition (S8, mrblast.cpp:404-433) — the dbsize scalar is
  passed in from a global aggregate;
- both strands searched for nucleotide tasks; kernel reports raw
  forward coordinates + strand signs, the strand swap is a downstream
  projection (P4, mrblast.cpp:1082-1086);
- ultra-frequent seeds are skipped (max_kmer_hits), the low-complexity
  masking analog (F3 -dust).

Simplifications vs NCBI BLAST (documented, deterministic): ungapped
extension only (gaps column is 0), exact-word seeding (no neighborhood
words / T threshold for blastp).

Scoring fidelity: blastn uses the configured reward/penalty with the
published ungapped Karlin-Altschul parameters for +1/-2
(lambda=1.33, K=0.621, H=1.12); blastp scores with BLOSUM62 and its
published ungapped parameters (lambda=0.3176, K=0.134, H=0.4012) —
the same constants NCBI's blastp reports for ungapped statistics
(doc/USERGUIDE:46-66 routes -matrix through to the same tables).
Characters outside the 24-letter BLOSUM alphabet score as X.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from pyspark.sql.types import (DoubleType, IntegerType, LongType, StringType,
                               StructField, StructType)

from mr_mpi_blast_spark.config import BlastConfig

# ungapped Karlin-Altschul (lambda, K, H) per scoring system
KA_NUCL_1_2 = (1.33, 0.621, 1.12)         # blastn +1/-2
KA_BLOSUM62 = (0.3176, 0.134, 0.4012)     # blastp BLOSUM62

# kept as module constants for blastn compatibility with round-1 users
LAMBDA, KAPPA = KA_NUCL_1_2[0], KA_NUCL_1_2[1]

# BLOSUM62 (Henikoff & Henikoff 1992), the standard 24-letter table as
# shipped with NCBI BLAST (data/BLOSUM62). Row/col order below:
_B62_ALPHA = "ARNDCQEGHILKMFPSTWYVBZX*"
_B62_ROWS = [
    # A   R   N   D   C   Q   E   G   H   I   L   K   M   F   P   S   T   W   Y   V   B   Z   X   *
    [ 4, -1, -2, -2,  0, -1, -1,  0, -2, -1, -1, -1, -1, -2, -1,  1,  0, -3, -2,  0, -2, -1,  0, -4],
    [-1,  5,  0, -2, -3,  1,  0, -2,  0, -3, -2,  2, -1, -3, -2, -1, -1, -3, -2, -3, -1,  0, -1, -4],
    [-2,  0,  6,  1, -3,  0,  0,  0,  1, -3, -3,  0, -2, -3, -2,  1,  0, -4, -2, -3,  3,  0, -1, -4],
    [-2, -2,  1,  6, -3,  0,  2, -1, -1, -3, -4, -1, -3, -3, -1,  0, -1, -4, -3, -3,  4,  1, -1, -4],
    [ 0, -3, -3, -3,  9, -3, -4, -3, -3, -1, -1, -3, -1, -2, -3, -1, -1, -2, -2, -1, -3, -3, -2, -4],
    [-1,  1,  0,  0, -3,  5,  2, -2,  0, -3, -2,  1,  0, -3, -1,  0, -1, -2, -1, -2,  0,  3, -1, -4],
    [-1,  0,  0,  2, -4,  2,  5, -2,  0, -3, -3,  1, -2, -3, -1,  0, -1, -3, -2, -2,  1,  4, -1, -4],
    [ 0, -2,  0, -1, -3, -2, -2,  6, -2, -4, -4, -2, -3, -3, -2,  0, -2, -2, -3, -3, -1, -2, -1, -4],
    [-2,  0,  1, -1, -3,  0,  0, -2,  8, -3, -3, -1, -2, -1, -2, -1, -2, -2,  2, -3,  0,  0, -1, -4],
    [-1, -3, -3, -3, -1, -3, -3, -4, -3,  4,  2, -3,  1,  0, -3, -2, -1, -3, -1,  3, -3, -3, -1, -4],
    [-1, -2, -3, -4, -1, -2, -3, -4, -3,  2,  4, -2,  2,  0, -3, -2, -1, -2, -1,  1, -4, -3, -1, -4],
    [-1,  2,  0, -1, -3,  1,  1, -2, -1, -3, -2,  5, -1, -3, -1,  0, -1, -3, -2, -2,  0,  1, -1, -4],
    [-1, -1, -2, -3, -1,  0, -2, -3, -2,  1,  2, -1,  5,  0, -2, -1, -1, -1, -1,  1, -3, -1, -1, -4],
    [-2, -3, -3, -3, -2, -3, -3, -3, -1,  0,  0, -3,  0,  6, -4, -2, -2,  1,  3, -1, -3, -3, -1, -4],
    [-1, -2, -2, -1, -3, -1, -1, -2, -2, -3, -3, -1, -2, -4,  7, -1, -1, -4, -3, -2, -2, -1, -2, -4],
    [ 1, -1,  1,  0, -1,  0,  0,  0, -1, -2, -2,  0, -1, -2, -1,  4,  1, -3, -2, -2,  0,  0,  0, -4],
    [ 0, -1,  0, -1, -1, -1, -1, -2, -2, -1, -1, -1, -1, -2, -1,  1,  5, -2, -2,  0, -1, -1,  0, -4],
    [-3, -3, -4, -4, -2, -2, -3, -2, -2, -3, -2, -3, -1,  1, -4, -3, -2, 11,  2, -3, -4, -3, -2, -4],
    [-2, -2, -2, -3, -2, -1, -2, -3,  2, -1, -1, -2, -1,  3, -3, -2, -2,  2,  7, -1, -3, -2, -1, -4],
    [ 0, -3, -3, -3, -1, -2, -2, -3, -3,  3,  1, -2,  1, -1, -2, -2,  0, -3, -1,  4, -3, -2, -1, -4],
    [-2, -1,  3,  4, -3,  0,  1, -1,  0, -3, -4,  0, -3, -3, -2,  0, -1, -4, -3, -3,  4,  1, -1, -4],
    [-1,  0,  0,  1, -3,  3,  4, -2,  0, -3, -3,  1, -1, -3, -1,  0, -1, -3, -2, -2,  1,  4, -1, -4],
    [ 0, -1, -1, -1, -2, -1, -1, -1, -1, -1, -1, -1, -1, -1, -2,  0,  0, -2, -1, -1, -1, -1, -1, -4],
    [-4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4, -4,  1],
]

_B62_X = _B62_ALPHA.index("X")


def _b62_index_table() -> np.ndarray:
    """256-entry char-code -> BLOSUM62 row index (unknown -> X)."""
    tbl = np.full(256, _B62_X, dtype=np.int8)
    for i, ch in enumerate(_B62_ALPHA):
        tbl[ord(ch)] = i
        tbl[ord(ch.lower())] = i
    return tbl


_B62_IDX = _b62_index_table()
_B62 = np.array(_B62_ROWS, dtype=np.int32)


def blosum62_score(a: str, b: str) -> int:
    """Pairwise BLOSUM62 score; non-residue characters score as X."""
    return int(_B62[_B62_IDX[ord(a) & 0xFF], _B62_IDX[ord(b) & 0xFF]])


def scoring_params(cfg: BlastConfig) -> tuple[float, float, float]:
    """(lambda, K, H) for the config's scoring system (S8 statistics)."""
    return KA_BLOSUM62 if cfg.task == "blastp" else KA_NUCL_1_2

# Raw kernel output: scoring-space facts only; relational projections
# (P2-P9) happen downstream as column expressions.
RAW_HITS = StructType([
    StructField("qid", LongType(), False),
    StructField("sid", StringType(), False),
    StructField("score", IntegerType(), False),
    StructField("align_len", IntegerType(), False),
    StructField("ident_count", IntegerType(), False),
    StructField("gaps", IntegerType(), False),
    StructField("qstart0", IntegerType(), False),
    StructField("qend0", IntegerType(), False),
    StructField("sstart0", IntegerType(), False),
    StructField("send0", IntegerType(), False),
    StructField("qstrand", IntegerType(), False),
    StructField("sstrand", IntegerType(), False),
    StructField("qlen", IntegerType(), False),
])

_COMPLEMENT = str.maketrans("ACGTacgt", "TGCAtgca")

# S7: per-worker subject index cache, keyed by (db_part, generation).
_DB_CACHE: dict = {}


def revcomp(seq: str) -> str:
    return seq.translate(_COMPLEMENT)[::-1]


class SubjectIndex:
    """k-mer -> [(subject_idx, pos)...] over one DB partition."""

    def __init__(self, subjects: list[tuple[str, str]], word_size: int,
                 max_kmer_hits: int):
        self.subjects = subjects
        self.word_size = word_size
        index: dict[str, list[tuple[int, int]]] = {}
        for si, (_, seq) in enumerate(subjects):
            for pos in range(0, len(seq) - word_size + 1):
                kmer = seq[pos:pos + word_size]
                bucket = index.setdefault(kmer, [])
                if len(bucket) <= max_kmer_hits:   # keep one past cap to detect
                    bucket.append((si, pos))
        # drop over-cap kmers entirely (dust analog: repetitive words)
        self.index = {k: v for k, v in index.items()
                      if len(v) <= max_kmer_hits}


def get_subject_index(cache_key: str, subjects, word_size: int,
                      max_kmer_hits: int) -> SubjectIndex:
    """DB-handle reuse (mrblast.cpp:838-845): build the partition index
    once per Python worker, reuse across query-block tasks."""
    return get_subject_index_lazy(cache_key, lambda: list(subjects),
                                  word_size, max_kmer_hits)


def get_subject_index_lazy(cache_key: str, loader, word_size: int,
                           max_kmer_hits: int) -> SubjectIndex:
    """Same cache, but subjects come from a zero-arg ``loader`` that is
    only invoked on a miss — so the lazy staged-volume path pays the
    read+index cost once per worker per partition."""
    key = (cache_key, word_size, max_kmer_hits)
    idx = _DB_CACHE.get(key)
    if idx is None:
        idx = SubjectIndex(loader(), word_size, max_kmer_hits)
        _DB_CACHE.clear()      # one partition resident at a time, like the ref
        _DB_CACHE[key] = idx
    return idx


def pair_scorer(cfg: BlastConfig):
    """char-pair -> score for the config's scoring system: BLOSUM62
    lookups for blastp, reward/penalty for blastn."""
    if cfg.task == "blastp":
        return blosum62_score
    reward, penalty = cfg.reward, cfg.penalty

    def sc(a: str, b: str) -> int:
        return reward if a == b else penalty
    return sc


def _extend(q: str, s: str, qpos: int, spos: int, k: int,
            sc, xdrop: int):
    """Ungapped X-drop extension around an exact word match; ``sc`` is
    the pairwise scorer (pair_scorer). Returns
    (score, qs, qe, ss, se, ident) with 0-based inclusive ends."""
    qlen, slen = len(q), len(s)
    # seed: exact word match, scored through the same matrix
    score = 0
    for i in range(k):
        score += sc(q[qpos + i], s[spos + i])
    ident = k
    # extend right from end of word
    best_score, best_qe, best_ident = score, qpos + k - 1, ident
    i, j, cur, cur_ident = qpos + k, spos + k, score, ident
    while i < qlen and j < slen:
        if q[i] == s[j]:
            cur_ident += 1
        cur += sc(q[i], s[j])
        if cur > best_score:
            best_score, best_qe, best_ident = cur, i, cur_ident
        elif best_score - cur > xdrop:
            break
        i += 1
        j += 1
    score, qe, ident = best_score, best_qe, best_ident
    # extend left from start of word
    best_score, best_qs, best_ident = score, qpos, ident
    i, j, cur, cur_ident = qpos - 1, spos - 1, score, ident
    while i >= 0 and j >= 0:
        if q[i] == s[j]:
            cur_ident += 1
        cur += sc(q[i], s[j])
        if cur > best_score:
            best_score, best_qs, best_ident = cur, i, cur_ident
        elif best_score - cur > xdrop:
            break
        i -= 1
        j -= 1
    qs = best_qs
    ss = spos - (qpos - qs)
    se = ss + (qe - qs)
    return best_score, qs, qe, ss, se, best_ident


def align_query(qid: int, seq: str, index: SubjectIndex,
                cfg: BlastConfig) -> list[tuple]:
    """All HSPs of one query against one indexed partition, both strands."""
    out = []
    k = cfg.word_size
    qlen = len(seq)
    sc = pair_scorer(cfg)
    strands = [(seq, 1)]
    if cfg.task == "blastn":
        strands.append((revcomp(seq), -1))
    for q, qstrand in strands:
        seen: dict[tuple[int, int], int] = {}   # (si, diag) -> covered qend
        for qpos in range(0, len(q) - k + 1):
            hits = index.index.get(q[qpos:qpos + k])
            if not hits:
                continue
            for si, spos in hits:
                diag = spos - qpos
                if seen.get((si, diag), -1) >= qpos:
                    continue
                score, qs, qe, ss, se, ident = _extend(
                    q, index.subjects[si][1], qpos, spos, k,
                    sc, cfg.xdrop)
                seen[(si, diag)] = qe
                if score < cfg.min_raw_score:
                    continue
                if qstrand == -1:
                    # map coords back to the forward query orientation
                    qs, qe = qlen - qe - 1, qlen - qs - 1
                out.append((qid, index.subjects[si][0], score,
                            qe - qs + 1, ident, 0,
                            qs, qe, ss, se, qstrand, 1, qlen))
    return out


def make_block_kernel(subjects_bc, cfg: BlastConfig, cache_key: str):
    """Kernel factory for applyInPandas over query blocks (K1/K2).

    subjects_bc: Spark broadcast of list[(sid, seq)] for ONE db
    partition — the Spark analog of every rank having the partition's
    volume files on local disk. Kept for small-DB callers; the scale
    path is make_lazy_block_kernel, which never routes subject rows
    through the driver.
    """
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        index = get_subject_index(cache_key, subjects_bc.value,
                                  cfg.word_size, cfg.max_kmer_hits)
        rows: list[tuple] = []
        # K2 batch loop: iterate queries within the block
        for qid, seq in zip(pdf["qid"].to_numpy(), pdf["seq"].to_numpy()):
            rows.extend(align_query(int(qid), seq, index, cfg))
        return pd.DataFrame(rows, columns=[f.name for f in RAW_HITS.fields])
    return kernel


def read_staged_part(db_dir: str, part: str) -> list[tuple[str, str]]:
    """Executor-side load of one staged DB partition:
    ``{db_dir}/db_part={part}/*.parquet`` -> [(sid, seq)...].

    This is the reference's "volume files on local disk" model
    (doc/USERGUIDE:224-264): the database is staged to shared storage
    once by a distributed write, and each worker reads only the volume
    it is about to search — the driver never holds subject rows."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(db_dir, f"db_part={part}", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no staged volume at {db_dir}/db_part={part}")
    out: list[tuple[str, str]] = []
    for f in files:
        t = pq.read_table(f, columns=["sid", "seq"])
        out.extend(zip(t.column("sid").to_pylist(), t.column("seq").to_pylist()))
    return out


def make_lazy_block_kernel(db_dir: str, cfg: BlastConfig, gen: str):
    """Kernel factory for the cogrouped work-item plan: one invocation
    per (query block x db_part) group. The group's ``db_part`` column
    names the staged volume; the subject index is built on first touch
    and reused across blocks of the same partition via the per-worker
    cache (S7 DB-handle reuse, mrblast.cpp:838-845), keyed by ``gen``
    so a restaged database can never hit a stale index."""
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        part = str(pdf["db_part"].iat[0])
        index = get_subject_index_lazy(
            f"{db_dir}:{part}:{gen}",
            lambda: read_staged_part(db_dir, part),
            cfg.word_size, cfg.max_kmer_hits)
        rows: list[tuple] = []
        for qid, seq in zip(pdf["qid"].to_numpy(), pdf["seq"].to_numpy()):
            rows.extend(align_query(int(qid), seq, index, cfg))
        return pd.DataFrame(rows, columns=[f.name for f in RAW_HITS.fields])
    return kernel


def karlin_altschul_bitscore(score: float,
                             ka: tuple[float, float, float] = KA_NUCL_1_2,
                             ) -> float:
    """bitscore = (lambda*S - ln K) / ln 2 (mrblast.cpp:1039 semantics)."""
    return (ka[0] * score - math.log(ka[1])) / math.log(2.0)


def length_adjustment(qlen: int, dbsize: int,
                      ka: tuple[float, float, float]) -> int:
    """One-shot K-A length adjustment: floor(ln(K*m*n)/H) — the classic
    closed-form approximation of NCBI's fixed-point iteration
    (Altschul-Gish 1996). Effective lengths keep short queries from
    inflated significance."""
    return int(math.log(ka[1] * qlen * dbsize) / ka[2])


def karlin_altschul_evalue(score: float, qlen: int, dbsize: int,
                           n_seqs: int | None = None,
                           ka: tuple[float, float, float] = KA_NUCL_1_2,
                           length_adjust: bool = True) -> float:
    """E = m' * n' * 2^-bit with effective lengths (m'=qlen-l,
    n'=dbsize-n_seqs*l) when adjusting, raw m*n otherwise."""
    bit = karlin_altschul_bitscore(score, ka)
    if length_adjust and n_seqs:
        ell = length_adjustment(qlen, dbsize, ka)
        m_eff = max(qlen - ell, 1.0)
        n_eff = max(dbsize - n_seqs * ell, 1.0)
        return m_eff * n_eff * math.pow(2.0, -bit)
    return qlen * dbsize * math.pow(2.0, -bit)
