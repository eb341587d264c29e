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
  masking analog (F3 -dust);
- F3 masking options (doc/USERGUIDE:47-50) as seeding-level analogs:
  -dust/-seg -> word_low_complexity seed drop, -soft_masking ->
  lowercase subject words excluded from the index, -lcase_masking ->
  lowercase query words skipped, -window_size -> two-hit seeding.
  All default off (None) so they never perturb runs that don't ask
  for them; the NCBI kernel forwards the real flags instead.

Simplifications vs NCBI BLAST (documented, deterministic): extension
is ungapped by default (gaps column 0), with BLAST's stage-2
affine-gap extension available via BlastConfig(gapped=True) — Gotoh
local DP around HSPs that clear gap_trigger, gap cost open +
L*extend, gapped Karlin-Altschul rows keyed on the actual scoring
scheme (matrix/reward/penalty + gap costs; unknown schemes raise,
calibratable via the kernel/ka_sim.py island estimator).
The gapped DP runs on a window around the ungapped HSP rather than
BLAST+'s unbounded X-drop extension; the window doubles whenever the
alignment touches a growable edge (gapped_extend), so results are not
truncated, but pathological alignments wider than _GAP_PAD_MAX per
side are. blastp seeding defaults to exact word matches; BLAST's
neighborhood-word seeding (words scoring >= T against the query word
under BLOSUM62) is available via BlastConfig(threshold=T), the real
-threshold semantics for short protein words.

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

# Raw-output spec version: callers that persist RAW_HITS keyed on input
# content must also key on this, so a kernel change (scoring, seeding,
# extension) invalidates cached raw hits from older code. Bump on any
# change that can alter RAW_HITS values for some config.
KERNEL_SPEC = "k6"

# On-disk subject-index pickle format version: salted into the disk
# cache path ALONGSIDE KERNEL_SPEC, so a storage-layout change (e.g.
# r8's list->numpy window arrays) invalidates published index pickles
# WITHOUT pretending RAW_HITS values changed (KERNEL_SPEC's contract).
INDEX_FORMAT_SPEC = "i2"

# ungapped Karlin-Altschul (lambda, K, H) per scoring system
KA_NUCL_1_2 = (1.33, 0.621, 1.12)         # blastn +1/-2
KA_BLOSUM62 = (0.3176, 0.134, 0.4012)     # blastp BLOSUM62
# Gapped Karlin-Altschul (lambda, K, H) keyed on the ACTUAL gap costs,
# per NCBI blast_stat.c's precomputed tables — the reference forwards
# -gapopen/-gapextend straight to NCBI (doc/USERGUIDE:47-50), where
# blast_stat.c looks up the row matching the costs and ERRORS on
# unsupported pairs. Same contract here: unknown (open, extend) raises
# instead of silently reusing the default-cost constants.
#
# BLOSUM62 rows are the published blosum62_values table (Altschul et
# al. 1997 / NCBI blast_stat.c; reproduced in Korf, Yandell & Bedell,
# "BLAST", O'Reilly 2003, App. B).
KA_GAPPED_BLOSUM62: dict[tuple[int, int], tuple[float, float, float]] = {
    (11, 2): (0.297, 0.082, 0.27),
    (10, 2): (0.291, 0.075, 0.23),
    (9, 2):  (0.279, 0.058, 0.19),
    (8, 2):  (0.264, 0.045, 0.15),
    (7, 2):  (0.239, 0.027, 0.10),
    (6, 2):  (0.201, 0.012, 0.061),
    (13, 1): (0.292, 0.071, 0.23),
    (12, 1): (0.283, 0.059, 0.19),
    (11, 1): (0.267, 0.041, 0.14),   # blastp default costs
    (10, 1): (0.243, 0.024, 0.10),
    (9, 1):  (0.206, 0.010, 0.052),
}
# Gapped nucleotide rows are keyed on the FULL scheme
# (reward, penalty, gap_open, gap_extend): gapped statistics depend on
# the substitution scores as much as the gap costs. (Until round 5
# this table was keyed on gap costs alone under a "+1/-2" label and
# carried (5,2) -> (0.625, 0.275, 0.85); the island-method estimator
# in kernel/ka_sim.py showed that row is really blast_stat.c's
# blastn_values_2_3 entry — +2/-3 with gaps (5,2), the NCBI blastn
# task defaults, {5, 2, 0.625, 0.41, 0.78} — and that +1/-2 under the
# same gap costs behaves nearly ungapped (lambda ~1.33: one gap costs
# 7 while a mismatch costs 2). Simulation reproduces lambda 0.625 and
# K ~0.40 for +2/-3 (5,2); the old K=0.275 was wrong.) Unknown
# schemes raise; calibrate a row with kernel/ka_sim.py or supply
# BlastConfig(ka_gapped=...). UNGAPPED statistics need no table at
# all — kernel/ka.py solves Karlin-Altschul 1990 exactly for any
# reward/penalty (validated against the published rows above).
KA_GAPPED_NUCL: dict[tuple[int, int, int, int],
                     tuple[float, float, float]] = {
    (2, -3, 5, 2): (0.625, 0.41, 0.78),  # NCBI blastn task defaults
}
# kept as a named constant for round-3 callers
KA_BLOSUM62_G111 = KA_GAPPED_BLOSUM62[(11, 1)]

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

# Extended matrix for the batched extension path: row/col _B62_SENT is
# the subject-boundary / out-of-range sentinel, scoring so negative
# that the X-drop test stops an extension the moment it reaches one
# (the batched analog of per-subject array bounds). int32 keeps the
# extension's 2D temporaries half the size (bandwidth is the batched
# path's ceiling); the sentinel is sized so a whole 256-wide chunk of
# sentinels (256 x -4e6 ~ -1.02e9) still cannot wrap int32, yet dwarfs
# any real xdrop. Block-level prefix sums over cats that CONTAIN
# sentinel rows must accumulate in int64 (they do, explicitly).
_B62_SENT = len(_B62_ALPHA)                   # 24
_B62_NEG = -(4 * 10 ** 6)
_B62E = np.full((_B62_SENT + 1, _B62_SENT + 1), _B62_NEG, dtype=np.int32)
_B62E[:_B62_SENT, :_B62_SENT] = _B62


def _b62_row_maps() -> list[dict[str, int]]:
    """One {char: score} dict per matrix row, covering all 256 byte
    chars (unknowns pre-resolved to the X column) — the kernel's inner
    loop is a single dict hit per pair, no numpy scalar indexing
    (~20x faster than per-pair ndarray lookups in CPython)."""
    return [{chr(c): int(_B62_ROWS[ri][_B62_IDX[c]]) for c in range(256)}
            for ri in range(len(_B62_ALPHA))]


_B62_ROWMAP = _b62_row_maps()
_B62_X_ROW = _B62_ROWMAP[_B62_X]


def _b62_row(ch: str) -> dict[str, int]:
    o = ord(ch)
    return _B62_ROWMAP[_B62_IDX[o]] if o < 256 else _B62_X_ROW


def blosum62_score(a: str, b: str) -> int:
    """Pairwise BLOSUM62 score; non-residue characters score as X."""
    row = _b62_row(a)
    return row[b] if ord(b) < 256 else row["X"]


def scoring_params(cfg: BlastConfig) -> tuple[float, float, float]:
    """(lambda, K, H) for the config's scoring system (S8 statistics).

    Gapped runs look up the row matching the EFFECTIVE gap costs
    (blast_stat.c semantics: statistics are a function of the costs,
    not just the matrix). Unsupported cost pairs raise ValueError —
    never silently score with another pair's constants. A user with a
    cost pair this table lacks supplies the row explicitly via
    cfg.ka_gapped=(lambda, K, H) — e.g. copied from their BLAST+
    install's reported statistics — which takes precedence over the
    table. (The alternative — shipping blastn rows from memory without
    the published source at hand — risks silently wrong e-values,
    which is strictly worse than this loud contract.)

    Ungapped runs need no table at all: for any blastn
    reward/penalty the exact Karlin-Altschul 1990 solution is
    computed analytically (kernel/ka.py — the same math NCBI's
    blast_stat.c runs), mirroring the reference's pass-through of
    arbitrary -reward/-penalty (doc/USERGUIDE:47-50). The default
    +1/-2 and blastp BLOSUM62 constants stay pinned to the published
    values; tests assert the solver reproduces both to 4 digits."""
    if cfg.gapped:
        if cfg.ka_gapped is not None:
            return cfg.ka_gapped
        if cfg.task == "blastp":
            table, key = (KA_GAPPED_BLOSUM62,
                          (cfg.gap_open_eff, cfg.gap_extend_eff))
        else:
            # gapped nucleotide statistics depend on reward/penalty as
            # much as the gap costs — key on the full scheme
            table, key = (KA_GAPPED_NUCL,
                          (cfg.reward, cfg.penalty,
                           cfg.gap_open_eff, cfg.gap_extend_eff))
        try:
            return table[key]
        except KeyError:
            raise ValueError(
                f"no gapped Karlin-Altschul parameters for {cfg.task} "
                f"scheme {key}; supported: {sorted(table)}. Either add "
                f"the published blast_stat.c row, calibrate one with "
                f"the island-method estimator (kernel/ka_sim.py, "
                f"documented tolerances), or pass the statistics "
                f"explicitly via BlastConfig(ka_gapped=(lambda, K, H))"
            ) from None
    if cfg.task == "blastp":
        return KA_BLOSUM62
    if (cfg.reward, cfg.penalty) == (1, -2):
        return KA_NUCL_1_2
    from mr_mpi_blast_spark.kernel.ka import ka_ungapped_nucl
    return ka_ungapped_nucl(cfg.reward, cfg.penalty)

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


def word_is_lowercase_masked(word: str) -> bool:
    """True when the word overlaps a soft-masked (lowercase) region —
    the FASTA convention dustmasker/segmasker emit and
    -soft_masking/-lcase_masking consume (doc/USERGUIDE:47-50)."""
    return any(c.islower() for c in word)


def word_low_complexity(word: str, protein: bool) -> bool:
    """Builtin dust/seg analog: a seed word is low-complexity when its
    distinct-character count collapses (homopolymer/dimer repeats for
    nucleotides, homopolymer for the k=3 protein words). Far simpler
    than NCBI's DUST/SEG scoring but catches the same seed explosions,
    and only ever *drops seeds* — extension is untouched, matching
    soft-masking semantics.

    Case-folds per codepoint (fold_case_str semantics — a char whose
    str.upper() is multi-char, e.g. eszett, stays itself) so this
    scalar form agrees with the vectorized masked-index build
    (_low_complexity_windows_np) for EVERY input, not just biological
    alphabets."""
    return len(set(fold_case_str(word))) <= (1 if protein else 2)


# vectorized forms of the two word predicates above, evaluated over a
# whole subject's codepoints at once (the masked index build): tables
# cover the Latin-1 range the biological alphabets live in; rarer
# codepoints fall back to the exact per-char predicate
_LOWER_TBL = np.array([chr(i).islower() for i in range(256)], dtype=bool)
_UPPER_TBL = np.array(
    [ord(chr(i).upper()) if len(chr(i).upper()) == 1
     and ord(chr(i).upper()) < 2 ** 31 else i for i in range(256)],
    dtype=np.int64)


def _islower_np(codes: np.ndarray) -> np.ndarray:
    out = np.zeros(len(codes), dtype=bool)
    small = codes < 256
    out[small] = _LOWER_TBL[codes[small]]
    for i in np.flatnonzero(~small).tolist():
        out[i] = chr(int(codes[i])).islower()
    return out


def _upper_np(codes: np.ndarray) -> np.ndarray:
    out = codes.copy()
    small = codes < 256
    out[small] = _UPPER_TBL[codes[small]]
    for i in np.flatnonzero(~small).tolist():
        u = chr(int(codes[i])).upper()
        if len(u) == 1:
            out[i] = ord(u)
    return out


def fold_case_str(s: str) -> str:
    """LENGTH-PRESERVING case fold for sequence data: each character
    maps to its single-codepoint uppercase, or stays itself when
    str.upper() would change the string's length (e.g. eszett ->
    'SS'). Every coordinate in the engine (window positions, HSP
    spans, identity counts) assumes the folded string is positionally
    aligned with the original — plain str.upper() breaks that for a
    handful of codepoints and used to crash the masked index build
    (mask computed on the original, windows enumerated on a
    longer folded string)."""
    codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
    folded = _upper_np(codes.astype(np.int64)).astype("<u4")
    return folded.tobytes().decode("utf-32-le")


def _low_complexity_windows_np(codes: np.ndarray, k: int,
                               protein: bool) -> np.ndarray:
    """word_low_complexity for every length-k window of a codepoint
    array: distinct (case-folded) count <= 1 for protein words, <= 2
    for nucleotide words — k-1 vectorized passes tracking the first
    and (for nucleotides) second distinct value."""
    nw = len(codes) - k + 1
    if nw <= 0:
        return np.zeros(0, dtype=bool)
    u = _upper_np(codes)
    a = u[:nw]
    if protein:
        ok = np.ones(nw, dtype=bool)
        for j in range(1, k):
            ok &= u[j:j + nw] == a
        return ok
    second = np.full(nw, -1, dtype=np.int64)
    ok = np.ones(nw, dtype=bool)
    for j in range(1, k):
        v = u[j:j + nw]
        isnew = (v != a) & (second == -1)
        second = np.where(isnew, v, second)
        ok &= (v == a) | (v == second)
    return ok


# polynomial rolling-hash base for the vectorized word index (FNV
# prime; uint64 wraparound multiply — collisions are resolved by an
# exact word compare at seed time, so the hash only routes, never
# decides)
_HASH_P = np.uint64(1099511628211)
# separator codepoint beyond U+10FFFF: windows spanning two subjects
# absorb it and can never equal a query word's hash
_HASH_SEP = 0x110000


def _window_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """Horner-scheme hash of every length-k window of a codepoint
    array: h_i = sum_j codes[i+j] * P^(k-1-j) (mod 2^64). k vectorized
    passes, no per-window Python work."""
    n = len(codes) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = codes[:n].astype(np.uint64)
    for j in range(1, k):
        h = h * _HASH_P + codes[j:j + n].astype(np.uint64)
    return h


# the 20 standard residues — the alphabet BLAST enumerates
# neighborhood words over (degenerate codes B/Z/X never seed)
_STD_RES = "ARNDCQEGHILKMFPSTWYV"
_STD_RES_IDX = np.array([_B62_ALPHA.index(r) for r in _STD_RES],
                        dtype=np.intp)


def neighborhood_words(word: str, threshold: int) -> list[tuple[str, int]]:
    """BLAST's blastp neighborhood for one query word: every length-k
    word over the 20 standard residues whose BLOSUM62 score against
    ``word`` is >= threshold, as (neighbor, score) pairs — including
    the query word itself ONLY when its self-score clears the
    threshold (real -threshold semantics: a low-complexity query word
    below T produces no seeds at all).

    Enumeration is branch-and-bound over positions: a prefix is pruned
    the moment prefix_score + max-achievable-suffix < threshold, so
    the cost tracks the neighborhood size (tens of words at the
    default T=11, k=3), not 20^k. Results are memoized per (word, T)
    at the call sites (query vocabularies repeat heavily)."""
    k = len(word)
    qrows = []
    for c in word:
        o = ord(c)
        ri = _B62_IDX[o] if o < 256 else _B62_X
        qrows.append(_B62[ri][_STD_RES_IDX])
    suffix_max = [0] * (k + 1)
    for i in range(k - 1, -1, -1):
        suffix_max[i] = suffix_max[i + 1] + int(qrows[i].max())
    out: list[tuple[str, int]] = []

    def rec(i: int, prefix: str, sc: int) -> None:
        if i == k:
            out.append((prefix, sc))
            return
        row, rem = qrows[i], suffix_max[i + 1]
        for j, r in enumerate(_STD_RES):
            v = int(row[j])
            if sc + v + rem >= threshold:
                rec(i + 1, prefix + r, sc + v)

    rec(0, "", 0)
    return out


class SubjectIndex:
    """k-mer -> [(subject_idx, pos)...] over one DB partition.

    ``encoded`` (ord + BLOSUM row-index arrays per subject) is built
    lazily on first protein search so nucleotide indexes pay nothing.

    soft_mask drops seed words overlapping lowercase (masked) subject
    regions; complexity drops low-complexity words (F3 -dust/-seg
    analogs). Both affect seeding only — extension still scores
    through masked regions, the soft-masking contract.

    fold_case: when masking is in play, case is annotation, not
    sequence (the dustmasker convention BLAST+ consumes) — index keys
    and extension strings are case-folded (length-preserving
    fold_case_str) so a masked region still *matches* during
    extension. Off by default so unmasked runs stay byte-identical.

    One physical form: the hashed build — all subjects are
    concatenated (with separators) into one codepoint array, every
    window hashed in k vectorized passes, buckets grouped by a single
    argsort; subject-side masking (soft_mask/complexity) is a
    vectorized window-drop filter inside the same build. Hash
    collisions cannot corrupt results: seed consumers re-verify the
    exact word before extending. ``hashed`` is always True in
    production; tests force it False (with a hand-built _str_index)
    only to drive the sequential oracle's dict route for equivalence
    checks. The string-keyed ``index`` mapping is materialized lazily
    from the hashed form for callers that introspect it.
    """

    def __init__(self, subjects: list[tuple[str, str]], word_size: int,
                 max_kmer_hits: int, soft_mask: bool = False,
                 complexity: bool = False, protein: bool = False,
                 fold_case: bool = False):
        self.subjects = subjects
        self.word_size = word_size
        self.fold_case = fold_case
        self.max_kmer_hits = max_kmer_hits
        self._encoded: list[tuple[np.ndarray, np.ndarray]] | None = None
        self._str_index: dict[str, list[tuple[int, int]]] | None = None
        self.ext_seqs = ([fold_case_str(seq) for _, seq in subjects] if fold_case
                         else [seq for _, seq in subjects])
        # every config builds the hashed form: subject-side masking
        # (soft_mask / complexity) is a vectorized per-window drop
        # filter inside the build, so masked configs run the same
        # batched hot path as everything else (the per-window dict
        # build this replaced was the one remaining sequential route)
        self.hashed = True
        self._build_hashed(soft_mask=soft_mask, complexity=complexity,
                           protein=protein)

    def _build_hashed(self, soft_mask: bool = False,
                      complexity: bool = False,
                      protein: bool = False) -> None:
        k = self.word_size
        sep = np.full(k - 1 if k > 1 else 0, _HASH_SEP, dtype=np.uint32)
        chunks, offs, lens = [], [], []
        cursor = 0
        for s in self.ext_seqs:
            codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
            offs.append(cursor)
            lens.append(len(codes))
            chunks.append(codes)
            chunks.append(sep)
            cursor += len(codes) + len(sep)
        cat = (np.concatenate(chunks) if chunks
               else np.empty(0, dtype=np.uint32))
        h = _window_hashes(cat, k)
        # keep only windows fully inside one subject
        si_arr = np.repeat(np.arange(len(lens), dtype=np.int32),
                           [max(L - k + 1, 0) for L in lens])
        pos_parts = [np.arange(max(L - k + 1, 0), dtype=np.int32)
                     for L in lens]
        pos_arr = (np.concatenate(pos_parts) if pos_parts
                   else np.empty(0, dtype=np.int32))
        gidx = (pos_arr + np.array(offs, dtype=np.int64)[si_arr]
                if len(si_arr) else np.empty(0, dtype=np.int64))
        if (soft_mask or complexity) and len(si_arr):
            # subject-side masking as a window drop filter (F3): the
            # predicates run on the ORIGINAL subject strings (case is
            # annotation; self.ext_seqs may be case-folded), vectorized
            # per subject in the same (si asc, pos asc) enumeration
            # order as the window arrays above
            parts = []
            for _, s in self.subjects:
                nw = max(len(s) - k + 1, 0)
                if nw == 0:
                    continue
                codes = np.frombuffer(s.encode("utf-32-le"),
                                      dtype="<u4").astype(np.int64)
                m = np.zeros(nw, dtype=bool)
                if soft_mask:
                    low = _islower_np(codes).astype(np.int64)
                    c = np.concatenate(([0], np.cumsum(low)))
                    m |= (c[k:] - c[:-k]) > 0
                if complexity:
                    m |= _low_complexity_windows_np(codes, k, protein)
                parts.append(m)
            keep_w = ~np.concatenate(parts)
            si_arr, pos_arr = si_arr[keep_w], pos_arr[keep_w]
            gidx = gidx[keep_w]
        # empty gidx -> empty hash set (NOT the raw h: when every
        # subject is shorter than k, h still holds separator-spanning
        # windows that must never become buckets)
        hv = h[gidx.astype(np.int64)]
        # group by hash: stable sort keeps (si asc, pos asc) bucket
        # order — identical iteration order to the dict build
        order = np.argsort(hv, kind="stable")
        hs, sis, poss = hv[order], si_arr[order], pos_arr[order]
        bounds = np.flatnonzero(hs[1:] != hs[:-1]) + 1
        starts = np.concatenate(([0], bounds)) if len(hs) else np.empty(0, int)
        ends = np.concatenate((bounds, [len(hs)])) if len(hs) else np.empty(0, int)
        keep = (ends - starts) <= self.max_kmer_hits
        # sorted-key + bucket-bounds arrays: query words resolve via ONE
        # vectorized searchsorted per query (no dict, no per-bucket
        # Python fill — that loop was most of the build cost).
        # Stored as NUMPY arrays, not lists: a 10x volume carries ~7M
        # windows, and materializing them as Python ints made every
        # index unpickle/evict cycle churn ~600 MB of small objects per
        # worker — 32 concurrent workers degraded cold-start unpickles
        # from <1 s to 80+ s (kernel-mode CPU storm) at the synthesized
        # sf1.0. Flat int64 buffers pickle/unpickle as raw bytes and
        # double as the batched path's views with zero copies.
        self._ukeys = hs[starts[keep]] if len(hs) else hs
        self._bstart = (starts[keep].astype(np.int64) if len(hs)
                        else np.empty(0, dtype=np.int64))
        self._bend = (ends[keep].astype(np.int64) if len(hs)
                      else np.empty(0, dtype=np.int64))
        self._sis = sis.astype(np.int64)
        self._poss = poss.astype(np.int64)

    def query_buckets(self, q: str) -> list[int]:
        """Bucket id (-1 = no seed) for every word position of a
        (case-resolved) query: hash all windows, then one vectorized
        searchsorted against the sorted key array."""
        codes = np.frombuffer(q.encode("utf-32-le"), dtype="<u4")
        qh = _window_hashes(codes, self.word_size)
        return self.buckets_for_hashes(qh).tolist()

    def buckets_for_hashes(self, qh: np.ndarray) -> np.ndarray:
        """Bucket id (-1 = miss) for an arbitrary array of window
        hashes — the block-batched path hashes a whole query block's
        concatenation once and resolves every window here in one
        searchsorted."""
        if not len(qh) or not len(self._ukeys):
            return np.full(len(qh), -1, dtype=np.int64)
        ii = np.searchsorted(self._ukeys, qh)
        iic = np.minimum(ii, len(self._ukeys) - 1)
        found = self._ukeys[iic] == qh
        return np.where(found, iic, -1)

    def bucket_pairs(self, bi: int) -> zip:
        """(subject_idx, pos) pairs of one bucket, in (si asc, pos asc)
        order."""
        s0, e0 = self._bstart[bi], self._bend[bi]
        return zip(self._sis[s0:e0], self._poss[s0:e0])

    @property
    def bucket_bounds_np(self) -> tuple[np.ndarray, np.ndarray]:
        """(bucket start, bucket end) arrays for the batched seeding
        path (the hashed form's _bstart/_bend as int64 views)."""
        if getattr(self, "_bounds_np", None) is None:
            self._bounds_np = (np.asarray(self._bstart, dtype=np.int64),
                               np.asarray(self._bend, dtype=np.int64))
        return self._bounds_np

    @property
    def sis_np(self) -> np.ndarray:
        if getattr(self, "_sis_np", None) is None:
            self._sis_np = np.asarray(self._sis, dtype=np.int64)
        return self._sis_np

    @property
    def poss_np(self) -> np.ndarray:
        if getattr(self, "_poss_np", None) is None:
            self._poss_np = np.asarray(self._poss, dtype=np.int64)
        return self._poss_np

    @property
    def sids_np(self) -> np.ndarray:
        """Subject display ids as an object array (vectorized gather
        for the batched emission path)."""
        if getattr(self, "_sids_np", None) is None:
            self._sids_np = np.array([sid for sid, _ in self.subjects],
                                     dtype=object)
        return self._sids_np

    def lookup_word(self, word: str) -> list[tuple[int, int]]:
        """Exact occurrences of an ARBITRARY word (not necessarily a
        query window) — the probe neighborhood seeding needs. Hashed
        form: one hash + searchsorted + exact re-verify; dict form:
        direct get."""
        if not self.hashed:
            return self._str_index.get(word, []) if self._str_index else []
        codes = np.frombuffer(word.encode("utf-32-le"), dtype="<u4")
        h = _window_hashes(codes, self.word_size)
        if not len(h) or not len(self._ukeys):
            return []
        ii = int(np.searchsorted(self._ukeys, h[0]))
        if ii >= len(self._ukeys) or self._ukeys[ii] != h[0]:
            return []
        k = self.word_size
        return [(si, spos) for si, spos in self.bucket_pairs(ii)
                if self.ext_seqs[si][spos:spos + k] == word]

    def neighborhood_hits(self, word: str, threshold: int,
                          ) -> list[tuple[list[tuple[int, int]], int, int]]:
        """Seeding candidates for one query word under -threshold
        semantics: [(occurrences, seed_score, seed_ident)] over every
        neighborhood word present in this partition. Memoized on the
        index instance (it is cached per worker across query blocks,
        so the neighborhood of a repeated word is computed once per
        volume, the lookup-table reuse real BLAST gets from its
        per-search word table)."""
        cache = getattr(self, "_nb_cache", None)
        if cache is None:
            cache = self._nb_cache = {}
        key = (word, threshold)
        got = cache.get(key)
        if got is None:
            got = []
            for w2, sc in neighborhood_words(word, threshold):
                hits = self.lookup_word(w2)
                if hits:
                    ident = sum(a == b for a, b in zip(word, w2))
                    got.append((hits, sc, ident))
            cache[key] = got
        return got

    def neighborhood_arrays(self, word: str, threshold: int,
                            ) -> tuple[np.ndarray, np.ndarray,
                                       np.ndarray, np.ndarray] | None:
        """neighborhood_hits flattened to numpy columns
        (si, spos, seed_score, seed_ident) in visit order — neighbor
        enumeration order then bucket (si, spos) order — for the
        batched seeding path: per-qpos collection becomes O(1) array
        appends instead of a per-seed Python loop. Cached per
        (word, T) like neighborhood_hits."""
        cache = getattr(self, "_nb_np_cache", None)
        if cache is None:
            cache = self._nb_np_cache = {}
        key = (word, threshold)
        got = cache.get(key, False)
        if got is not False:
            return got
        # cold path, fully vectorized: hash EVERY neighbor word at
        # once, resolve all buckets in one searchsorted, expand, and
        # exact-verify against the volume's concatenated ords in k
        # passes — the per-neighbor lookup_word loop with its
        # per-occurrence Python string compare is gone. Order is
        # identical to neighborhood_hits: neighbor enumeration order,
        # then bucket (si, spos) order (expansion is neighbor-major
        # and the verify filter preserves order).
        nbrs = neighborhood_words(word, threshold)
        out = None
        if nbrs and len(self._ukeys):
            k = self.word_size
            wordmat = np.array([[ord(c) for c in w2] for w2, _ in nbrs],
                               dtype=np.int64)
            h = np.zeros(len(nbrs), dtype=np.uint64)
            for j in range(k):
                h = h * _HASH_P + wordmat[:, j].astype(np.uint64)
            bis = self.buckets_for_hashes(h)
            live = np.flatnonzero(bis >= 0)
            if len(live):
                bstart, bend = self.bucket_bounds_np
                bb = bis[live]
                counts = bend[bb] - bstart[bb]
                total = int(counts.sum())
                if total:
                    wi = np.repeat(live, counts)
                    cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
                    within = (np.arange(total, dtype=np.int64)
                              - np.repeat(cum, counts))
                    flat = np.repeat(bstart[bb], counts) + within
                    si = self.sis_np[flat]
                    sp = self.poss_np[flat]
                    cord, _, offs = self.cat_protein
                    gpos = offs[si] + sp
                    ok = np.ones(total, dtype=bool)
                    for j in range(k):
                        ok &= cord[gpos + j] == wordmat[wi, j]
                    wi, si, sp = wi[ok], si[ok], sp[ok]
                    if len(si):
                        scs = np.array([sc for _, sc in nbrs],
                                       dtype=np.int64)[wi]
                        wo = np.array([ord(c) for c in word],
                                      dtype=np.int64)
                        idvec = (wordmat == wo[None, :]).sum(axis=1)
                        out = (si, sp, scs, idvec[wi])
        cache[key] = out
        return out

    @property
    def index(self) -> dict[str, list[tuple[int, int]]]:
        """String-keyed view (lazy for the hashed form)."""
        if self._str_index is None:
            out: dict[str, list[tuple[int, int]]] = {}
            k = self.word_size
            for s0, e0 in zip(self._bstart, self._bend):
                for si, pos in zip(self._sis[s0:e0], self._poss[s0:e0]):
                    word = self.ext_seqs[si][pos:pos + k]
                    out.setdefault(word, []).append((si, pos))
            self._str_index = out
        return self._str_index

    @property
    def encoded(self) -> list[tuple[np.ndarray, np.ndarray]]:
        if self._encoded is None:
            self._encoded = [encode_protein(s) for s in self.ext_seqs]
        return self._encoded

    @property
    def cat_protein(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Whole-volume concatenated protein encoding for the batched
        extension path: (ord array, BLOSUM row-index array, subject
        start offsets), with ONE boundary sentinel between subjects
        (ord -1 never matches a real character; row index _B62_SENT
        scores the huge negative that X-drop-stops any extension at a
        subject boundary — the batched analog of per-subject array
        bounds). Built lazily once per volume, cached like the index."""
        if getattr(self, "_cat_protein", None) is None:
            ords, rows = [], []
            offs = np.empty(len(self.ext_seqs), dtype=np.int64)
            sep_o = np.array([-1], dtype=np.int32)
            sep_r = np.array([_B62_SENT], dtype=np.intp)
            cursor = 0
            for i, s in enumerate(self.ext_seqs):
                o, r = encode_protein(s)
                offs[i] = cursor
                ords.append(o)
                rows.append(r)
                ords.append(sep_o)
                rows.append(sep_r)
                cursor += len(o) + 1
            cat_o = (np.concatenate(ords) if ords
                     else np.empty(0, dtype=np.int32))
            cat_r = (np.concatenate(rows) if rows
                     else np.empty(0, dtype=np.intp))
            self._cat_protein = (cat_o, cat_r, offs)
        return self._cat_protein

    @property
    def cat_nucl(self) -> tuple[np.ndarray, np.ndarray]:
        """Whole-volume concatenated codepoint encoding for the
        batched nucleotide extension path: (ord array, subject start
        offsets) with a -1 separator between subjects (no real
        codepoint is negative, and the rp scorer gives separators
        _B62_NEG — the batched analog of per-subject bounds). Built
        lazily once per volume, cached like the index; getattr-guarded
        so indexes unpickled from older disk-cache entries grow it on
        first touch."""
        if getattr(self, "_cat_nucl", None) is None:
            ords = []
            offs = np.empty(len(self.ext_seqs), dtype=np.int64)
            sep = np.array([-1], dtype=np.int32)
            cursor = 0
            for i, s in enumerate(self.ext_seqs):
                o = np.frombuffer(s.encode("utf-32-le"),
                                  dtype="<u4").astype(np.int32)
                offs[i] = cursor
                ords.append(o)
                ords.append(sep)
                cursor += len(o) + 1
            cat_o = (np.concatenate(ords) if ords
                     else np.empty(0, dtype=np.int32))
            self._cat_nucl = (cat_o, offs)
        return self._cat_nucl


def get_subject_index(cache_key: str, subjects, word_size: int,
                      max_kmer_hits: int, soft_mask: bool = False,
                      complexity: bool = False, protein: bool = False,
                      fold_case: bool = False) -> SubjectIndex:
    """DB-handle reuse (mrblast.cpp:838-845): build the partition index
    once per Python worker, reuse across query-block tasks."""
    return get_subject_index_lazy(cache_key, lambda: list(subjects),
                                  word_size, max_kmer_hits,
                                  soft_mask=soft_mask,
                                  complexity=complexity, protein=protein,
                                  fold_case=fold_case)


def index_cache_key(cache_key: str, word_size: int, max_kmer_hits: int,
                    soft_mask: bool = False, complexity: bool = False,
                    protein: bool = False, fold_case: bool = False) -> tuple:
    """The full identity of a built index: volume content key + every
    config field that shapes the build. One definition, shared by the
    resident cache, the disk cache, and the format pass — so they can
    never disagree about what 'the same index' means."""
    return (cache_key, word_size, max_kmer_hits, soft_mask, complexity,
            protein, fold_case)


def index_cache_path(key: tuple) -> str | None:
    """Content-keyed pickle path for a built subject index, or None
    when no trustworthy cache dir is available (uid-scoped, 0700:
    loading a pickle from a world-writable shared path would let any
    local user plant code — refuse the cache entirely if the dir
    exists but is not ours). The key is salted with KERNEL_SPEC (value
    changes) and INDEX_FORMAT_SPEC (storage-layout changes) so a
    kernel upgrade OR an index-format change invalidates pickles from
    older code."""
    import hashlib
    import tempfile
    h = hashlib.md5(
        repr((KERNEL_SPEC, INDEX_FORMAT_SPEC, key)).encode()).hexdigest()
    cache_root = os.path.join(
        os.environ.get("SPARK_GRAFT_SCRATCH", tempfile.gettempdir()),
        f"spark_graft_idx_cache_{os.getuid()}")
    try:
        st = os.stat(cache_root)
        if st.st_uid != os.getuid() or (st.st_mode & 0o077):
            return None
    except FileNotFoundError:
        pass    # created (0700) at publish time
    return os.path.join(cache_root, h + ".pkl")


def _publish_index(idx: SubjectIndex, path: str) -> None:
    """Atomically publish a built index pickle (last writer wins;
    corrupt/stale files rebuild silently on the read side)."""
    import pickle
    try:
        os.makedirs(os.path.dirname(path), mode=0o700, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(idx, fh, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except Exception:
        pass        # cache is an optimization, never a failure


def ensure_index_on_disk(cache_key: str, loader, word_size: int,
                         max_kmer_hits: int, soft_mask: bool = False,
                         complexity: bool = False, protein: bool = False,
                         fold_case: bool = False) -> bool:
    """The makeblastdb analog, explicit: build ONE volume's index and
    publish the content-keyed pickle — called by the format pass (one
    task per missing volume) BEFORE the kernel stage, so search tasks
    only ever unpickle. Without this, a cold run had every worker that
    first touched a volume build it concurrently (the publish race is
    harmless for correctness but quadratic in wall: workers x O(volume)
    builds — measured 277 s vs ~30 s at the synthesized sf1.0). Lazy
    derived arrays (protein concat encoding, bucket-bound views) are
    materialized before publishing so loaders skip those rebuilds too.
    Does NOT touch the capacity-1 resident cache. Returns True if it
    built, False if the pickle already existed (or no usable cache
    dir)."""
    key = index_cache_key(cache_key, word_size, max_kmer_hits,
                          soft_mask, complexity, protein, fold_case)
    path = index_cache_path(key)
    if path is None or os.path.exists(path):
        return False
    idx = SubjectIndex(loader(), word_size, max_kmer_hits,
                       soft_mask=soft_mask, complexity=complexity,
                       protein=protein, fold_case=fold_case)
    if protein:
        idx.cat_protein
    else:
        idx.cat_nucl
    idx.bucket_bounds_np, idx.sis_np, idx.poss_np
    _publish_index(idx, path)
    return True


def get_subject_index_lazy(cache_key: str, loader, word_size: int,
                           max_kmer_hits: int, soft_mask: bool = False,
                           complexity: bool = False, protein: bool = False,
                           fold_case: bool = False,
                           disk_cache: bool = False) -> SubjectIndex:
    """Same cache, but subjects come from a zero-arg ``loader`` that is
    only invoked on a miss — so the lazy staged-volume path pays the
    read+index cost once per worker per partition.

    disk_cache=True additionally persists the BUILT index to a
    content-keyed pickle under the scratch dir — the makeblastdb
    analog: the reference formats the database once on disk and every
    rank opens the preformatted volume (doc/USERGUIDE:224-264) instead
    of re-indexing raw FASTA per process. Here the first worker to
    touch a volume builds and publishes (atomic os.replace, last
    writer wins, corrupt/stale files rebuild silently); every other
    worker process — and every LATER process on the box — loads numpy
    arrays instead of re-hashing the volume. Callers enable it only
    for content-addressed keys (a nonce-keyed index can never be hit
    again, so persisting it would only leak scratch space); the key is
    salted with KERNEL_SPEC so a kernel upgrade invalidates pickles
    from older code."""
    key = index_cache_key(cache_key, word_size, max_kmer_hits,
                          soft_mask, complexity, protein, fold_case)
    idx = _DB_CACHE.get(key)
    if idx is None:
        path = None
        if disk_cache:
            import pickle
            path = index_cache_path(key)
            if path is not None:
                try:
                    with open(path, "rb") as fh:
                        idx = pickle.load(fh)
                except Exception:
                    idx = None
        if idx is None:
            idx = SubjectIndex(loader(), word_size, max_kmer_hits,
                               soft_mask=soft_mask, complexity=complexity,
                               protein=protein, fold_case=fold_case)
            if path is not None:
                _publish_index(idx, path)
        _DB_CACHE.clear()      # one partition resident at a time, like the ref
        _DB_CACHE[key] = idx
    return idx


def pair_scorer(cfg: BlastConfig):
    """char-pair -> score for the config's scoring system: BLOSUM62
    lookups for blastp, reward/penalty for blastn. (Reference surface
    for tests/tools; the kernel's hot loops use the specialized
    _extend_rp/_extend_rows below.)"""
    if cfg.task == "blastp":
        return blosum62_score
    reward, penalty = cfg.reward, cfg.penalty

    def sc(a: str, b: str) -> int:
        return reward if a == b else penalty
    return sc


def _extend_rp(q: str, s: str, qpos: int, spos: int, k: int,
               reward: int, penalty: int, xdrop: int):
    """Ungapped X-drop extension, reward/penalty scoring (blastn).
    Returns (score, qs, qe, ss, se, ident) with 0-based inclusive
    ends."""
    qlen, slen = len(q), len(s)
    # seed scores k matches
    score = k * reward
    ident = k
    # extend right from end of word
    best_score, best_qe, best_ident = score, qpos + k - 1, ident
    i, j, cur, cur_ident = qpos + k, spos + k, score, ident
    while i < qlen and j < slen:
        if q[i] == s[j]:
            cur += reward
            cur_ident += 1
        else:
            cur += penalty
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
            cur += reward
            cur_ident += 1
        else:
            cur += penalty
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


_B62_IDX_NP = _B62_IDX.astype(np.intp)


def encode_protein(seq: str) -> tuple[np.ndarray, np.ndarray]:
    """(raw ord array, BLOSUM row-index array) for vectorized scoring.
    Chars outside Latin-1 map to the X row (ord kept raw so identity
    counting still compares the actual characters)."""
    ords = np.fromiter(map(ord, seq), dtype=np.int32, count=len(seq))
    safe = np.where(ords < 256, ords, ord("X"))
    return ords, _B62_IDX_NP[safe]


def _extend_dir(qi: np.ndarray, si: np.ndarray, xdrop: int,
                chunk: int = 256, base: int = 0, best: int = 0,
                best_at: int = 0, t0: int = 0) -> tuple[int, int]:
    """One direction of X-drop extension over pre-gathered index
    arrays; processes in chunks so multi-megabase subjects don't pay
    for tails the drop test would never reach. base/best/best_at/t0
    carry state when a sequential prefix walk hands over mid-stream.
    Returns (best gain, chars extended)."""
    n = min(len(qi), len(si))
    qi, si = qi[:n], si[:n]
    for start in range(0, n, chunk):
        steps = _B62[qi[start:start + chunk], si[start:start + chunk]]
        c = base + np.cumsum(steps)
        run = np.maximum.accumulate(np.maximum(c, best))
        drop = (run - c) > xdrop
        stopped = bool(drop.any())
        upto = int(np.argmax(drop)) if stopped else len(c) - 1
        chunk_best = int(run[upto])
        if chunk_best > best:
            bidx = int(np.argmax(c[:upto + 1] == chunk_best))
            best, best_at = chunk_best, t0 + start + bidx + 1
        if stopped:
            return best, best_at
        base = int(c[-1])
    return best, best_at


# Sequential-prefix length before handing a still-live extension to the
# numpy chunks: random/unrelated text X-drops out well inside this many
# chars (the common case, ~7 us in the dict walk), while genuinely
# homologous stretches continue vectorized (~3 us per 256 chars).
_SEQ_PREFIX = 40


def _extend_dir_hybrid(q: str, s: str, qrows: list, i0: int, j0: int,
                       step: int, qi: np.ndarray, si: np.ndarray,
                       xdrop: int) -> tuple[int, int]:
    """One direction, hybrid: walk up to _SEQ_PREFIX chars with dict
    lookups (early-exit friendly), then continue on index arrays. i0/j0
    are the first positions in this direction; step is +1 or -1; qi/si
    are this direction's index arrays starting at the same positions."""
    qlen, slen = len(q), len(s)
    cur, best, best_at = 0, 0, 0
    t = 0
    i, j = i0, j0
    while t < _SEQ_PREFIX:
        if not (0 <= i < qlen and 0 <= j < slen):
            return best, best_at
        row = qrows[i]
        v = row.get(s[j])
        cur += v if v is not None else row["X"]
        t += 1
        if cur > best:
            best, best_at = cur, t
        elif best - cur > xdrop:
            return best, best_at
        i += step
        j += step
    return _extend_dir(qi[t:], si[t:], xdrop,
                       base=cur, best=best, best_at=best_at, t0=t)


def _extend_vec(qo: np.ndarray, qi: np.ndarray, so: np.ndarray,
                si: np.ndarray, qpos: int, spos: int, k: int,
                seed_score: int, xdrop: int,
                q: str | None = None, s: str | None = None,
                qrows: list | None = None, seed_ident: int | None = None):
    """Vectorized ungapped X-drop extension (blastp hot path): exact
    same semantics as the sequential walk — first-maximum tie-breaking,
    strict improvement, break when best-cur > xdrop — scored by numpy
    gathers over precomputed row indices. When the string forms and
    row dicts are supplied, each direction walks a short sequential
    prefix first (most extensions die there) before vectorizing."""
    if qrows is not None:
        gain_r, ext_r = _extend_dir_hybrid(
            q, s, qrows, qpos + k, spos + k, 1,
            qi[qpos + k:], si[spos + k:], xdrop)
        gain_l, ext_l = _extend_dir_hybrid(
            q, s, qrows, qpos - 1, spos - 1, -1,
            qi[:qpos][::-1], si[:spos][::-1], xdrop)
    else:
        gain_r, ext_r = _extend_dir(qi[qpos + k:], si[spos + k:], xdrop)
        gain_l, ext_l = _extend_dir(qi[:qpos][::-1], si[:spos][::-1], xdrop)
    qs, qe = qpos - ext_l, qpos + k - 1 + ext_r
    ident = seed_ident if seed_ident is not None else k
    if ext_r:
        ident += int(np.count_nonzero(
            qo[qpos + k:qpos + k + ext_r] == so[spos + k:spos + k + ext_r]))
    if ext_l:
        ident += int(np.count_nonzero(
            qo[qpos - ext_l:qpos] == so[spos - ext_l:spos]))
    ss = spos - (qpos - qs)
    se = ss + (qe - qs)
    return seed_score + gain_r + gain_l, qs, qe, ss, se, ident


# Seed-tile width for _extend_batch: keeps each 2D temporary around
# (tile x 64) x 8 B ~ 2 MB so the whole op pipeline stays in LLC even
# when block-level batching hands over 10^5+ seeds at once.
_EXT_TILE = 4096


def _extend_batch(qrow: np.ndarray | None, qord: np.ndarray,
                  crow: np.ndarray | None, cord: np.ndarray,
                  q0: np.ndarray, g0: np.ndarray, sign: int,
                  xdrop: int, chunk: int = 64, chunk_max: int = 256,
                  rp: tuple[int, int] | None = None,
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One direction of X-drop extension for N seeds AT ONCE.

    qrow/qord: the query's BLOSUM row-index and ord arrays;
    crow/cord: the whole volume's concatenated arrays (cat_protein);
    q0/g0: each seed's first query/volume position in this direction;
    sign: +1 (rightward) or -1 (leftward).

    rp=(reward, penalty) switches to nucleotide match/mismatch
    scoring on the ord arrays (qrow/crow unused, cat_nucl form): score
    = reward when ords are equal, penalty otherwise, _B62_NEG at
    out-of-range or subject-separator positions.

    Semantics are exactly the sequential walk's (_extend_dir): running
    best with first-maximum tie-breaking, strict improvement, stop
    when best - cur > xdrop — evaluated chunk-wise with 2D gathers, so
    the per-seed Python loop disappears. Out-of-range and
    subject-boundary positions score _B62_NEG, which trips the X-drop
    test at that column and can never join an alignment.

    Returns (gain, length, matches) per seed: best score gained, chars
    extended, and identities among them.

    Seeds are mutually independent, so the batch is processed in
    cache-sized TILES: one huge call (block-level batching can carry
    hundreds of thousands of seeds) would otherwise materialize
    ~100 MB 2D temporaries per numpy op and turn the extension
    DRAM-bandwidth-bound — measured 3x slower than the same seeds in
    small calls. Tiling restores cache residency at ~zero overhead."""
    n = len(q0)
    # The per-chunk int32 cumsum is only safe while a chunk of pure
    # sentinels cannot wrap: chunk_max * |_B62_NEG| must stay < 2^31.
    # A future caller widening chunk_max past ~536 would otherwise
    # silently corrupt scores — fail loudly instead (a real raise,
    # not an assert: the guard must survive `python -O`).
    if chunk_max * -_B62_NEG >= 2 ** 31:
        raise ValueError(
            f"chunk_max={chunk_max} overflows int32 cumsum "
            f"(|_B62_NEG|={-_B62_NEG})")
    if n > _EXT_TILE:
        gains = np.empty(n, dtype=np.int64)
        exts = np.empty(n, dtype=np.int64)
        ms = np.empty(n, dtype=np.int64)
        for t0 in range(0, n, _EXT_TILE):
            sl = slice(t0, min(t0 + _EXT_TILE, n))
            gains[sl], exts[sl], ms[sl] = _extend_batch(
                qrow, qord, crow, cord, q0[sl], g0[sl], sign, xdrop,
                chunk=chunk, chunk_max=chunk_max, rp=rp)
        return gains, exts, ms
    best = np.zeros(n, dtype=np.int64)
    best_at = np.zeros(n, dtype=np.int64)
    best_m = np.zeros(n, dtype=np.int64)
    base = np.zeros(n, dtype=np.int64)
    base_m = np.zeros(n, dtype=np.int64)
    active = np.arange(n)
    qlen, clen = len(qord), len(cord)
    offset = 0
    # chunk width grows geometrically to chunk_max: most seeds X-drop
    # out within a few residues (weak neighborhood seeds especially),
    # so the first round stays narrow; the few survivors — genuine
    # homologies — re-vectorize wide. Semantics are width-invariant.
    while len(active):
        j = np.arange(chunk, dtype=np.int64)
        qidx = q0[active, None] + sign * (offset + j)[None, :]
        gidx = g0[active, None] + sign * (offset + j)[None, :]
        qok = (qidx >= 0) & (qidx < qlen)
        gok = (gidx >= 0) & (gidx < clen)
        # fills are pairwise-distinct AND distinct from the subject
        # separator ord (-1), so no out-of-range pair can count as a
        # match (scores there are _B62_NEG anyway, but identity must
        # not drift either)
        qv = np.where(qok, qord[np.clip(qidx, 0, qlen - 1)], -3)
        sv = np.where(gok, cord[np.clip(gidx, 0, clen - 1)], -2)
        eq = qv == sv
        if rp is None:
            qr = np.where(qok, qrow[np.clip(qidx, 0, qlen - 1)], _B62_SENT)
            sr = np.where(gok, crow[np.clip(gidx, 0, clen - 1)], _B62_SENT)
            sc = _B62E[qr, sr]
        else:
            # match/mismatch scoring; separators/out-of-range kill the
            # extension exactly like the sentinel BLOSUM row does.
            # qv >= 0 also rejects the QUERY-side block separator (-1)
            # so a block-concatenated query can never extend into its
            # neighbor. int32 operands keep the whole pipeline narrow.
            sc = np.where(qok & gok & (sv != -1) & (qv >= 0),
                          np.where(eq, np.int32(rp[0]), np.int32(rp[1])),
                          np.int32(_B62_NEG))
        c = base[active, None] + np.cumsum(sc, axis=1)
        m = base_m[active, None] + np.cumsum(eq, axis=1)
        run = np.maximum.accumulate(
            np.maximum(c, best[active, None]), axis=1)
        drop = (run - c) > xdrop
        stopped = drop.any(axis=1)
        upto = np.where(stopped, np.argmax(drop, axis=1), chunk - 1)
        cm = np.where(j[None, :] <= upto[:, None], c, np.int32(-2**30))
        chunk_best = cm.max(axis=1)
        improved = chunk_best > best[active]
        bidx = np.argmax(cm == chunk_best[:, None], axis=1)
        rows = active[improved]
        best[rows] = chunk_best[improved]
        best_at[rows] = offset + bidx[improved] + 1
        best_m[rows] = m[improved, bidx[improved]]
        cont = ~stopped
        base[active[cont]] = c[cont, -1]
        base_m[active[cont]] = m[cont, -1]
        active = active[cont]
        offset += chunk
        chunk = min(chunk * 4, chunk_max)
    return best, best_at, best_m


def _align_protein_batched_arrays(qid: int, q_ext: str,
                                  index: SubjectIndex, cfg: BlastConfig,
                                  lcase_src: str | None,
                                  qlen: int) -> dict[str, np.ndarray]:
    """The blastp hot path with the per-seed Python loop removed: seed
    collection, exact-word verification, X-drop extension, and row
    emission are all vectorized over the volume's concatenated
    encoding (cat_protein); output is one numpy column per RAW_HITS
    field, ready for zero-copy DataFrame assembly (align_block).

    Rows are IDENTICAL to the sequential branch's (pinned by
    test_batched_parity): seeds are processed per (subject, diagonal)
    in qpos order with the same coverage dedupe (a seed starting
    inside the previous extension's query extent on its diagonal is
    skipped, and coverage updates even below min_raw_score), and
    emissions are sorted to the sequential (qpos, si, spos) visit
    order. Rounds = longest surviving seed chain on any diagonal (1-2
    in practice), each a fully vectorized batch."""
    k = cfg.word_size
    qo, qi_arr = encode_protein(q_ext)
    prefnp = np.concatenate(([0], np.cumsum(_B62[qi_arr, qi_arr],
                                            dtype=np.int64)))
    cord, crow, offs = index.cat_protein
    nb_threshold = cfg.threshold
    masked = None
    if lcase_src is not None:
        # -lcase_masking inspects the ORIGINAL query casing (q_ext may
        # be case-folded when masking options are in play)
        low = np.array([c.islower() for c in lcase_src], dtype=np.int32)
        lowc = np.concatenate(([0], np.cumsum(low)))
        masked = (lowc[k:] - lowc[:-k]) > 0       # window has lowercase

    if nb_threshold is not None:
        # --- neighborhood (-threshold) seed collection: probe every
        # neighbor word's occurrences per live query position. The
        # probes stay a (memoized) per-word loop — BLAST's word-table
        # build — but every seed they yield joins the SAME batched
        # extension below, with its own (seed_score, seed_ident)
        # carried per seed; the per-seed extension loop is gone.
        # Visit order matches the sequential branch exactly:
        # qpos-major, then neighbor-word enumeration order, then
        # bucket (si, spos) order. One (si, spos) can only match ONE
        # neighbor word (the subject word itself), so within a
        # (subject, diagonal) group qpos still strictly ascends.
        n_words = len(q_ext) - k + 1
        qp_parts: list[np.ndarray] = []
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray,
                          np.ndarray]] = []
        for qpos in range(max(n_words, 0)):
            if masked is not None and masked[qpos]:
                continue
            arrs = index.neighborhood_arrays(
                q_ext[qpos:qpos + k], nb_threshold)
            if arrs is None:
                continue
            qp_parts.append(np.full(len(arrs[0]), qpos, dtype=np.int64))
            parts.append(arrs)
        if not parts:
            return _empty_raw_cols()
        sq = np.concatenate(qp_parts)
        ssi = np.concatenate([a[0] for a in parts])
        ssp = np.concatenate([a[1] for a in parts])
        gpos = offs[ssi] + ssp
        seed_sc_all = np.concatenate([a[2] for a in parts])
        seed_id_all = np.concatenate([a[3] for a in parts])
    else:
        qb = np.asarray(index.query_buckets(q_ext), dtype=np.int64)
        if masked is not None:
            qb = np.where(masked, -1, qb)

        # --- seed collection: expand every live word position's bucket ---
        qpos_list = np.flatnonzero(qb >= 0)
        if not len(qpos_list):
            return _empty_raw_cols()
        bis = qb[qpos_list]
        bstart, bend = index.bucket_bounds_np
        counts = bend[bis] - bstart[bis]
        total = int(counts.sum())
        if total == 0:
            return _empty_raw_cols()
        sq = np.repeat(qpos_list, counts)
        cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
        flat = np.repeat(bstart[bis], counts) + within
        ssi = index.sis_np[flat]
        ssp = index.poss_np[flat]
        # exact-word re-verify, vectorized: the hash routes, the ord
        # compare decides (collisions can never fabricate a seed)
        gpos = offs[ssi] + ssp
        ok = np.ones(total, dtype=bool)
        for j in range(k):
            ok &= cord[gpos + j] == qo[sq + j]
        if not ok.all():
            sq, ssi, ssp, gpos = sq[ok], ssi[ok], ssp[ok], gpos[ok]
        if not len(sq):
            return _empty_raw_cols()
        seed_sc_all = prefnp[sq + k] - prefnp[sq]
        seed_id_all = np.full(len(sq), k, dtype=np.int64)

    core = _batched_core(q_ext, index, cfg, k, sq, ssi, ssp, gpos,
                         seed_sc_all, seed_id_all,
                         (qi_arr, qo, crow, cord, None),
                         narrow=nb_threshold is not None)
    if core is None:
        return _empty_raw_cols()
    return _raw_cols_from_core(qid, qlen, index, core, qstrand=1)


def _batched_core(q_ext: str, index: SubjectIndex, cfg: BlastConfig,
                  k: int, sq, ssi, ssp, gpos, seed_sc_all, seed_id_all,
                  ext_args, narrow: bool = False,
                  qoffs: np.ndarray | None = None,
                  q_strs: list[str] | None = None):
    """Shared batched stage for one query strand: group seeds by
    (subject, diagonal), replay the sequential coverage dedupe in
    whole-array rounds, extend every round's survivors in one 2D
    X-drop batch, optionally run the per-HSP gapped stage, and return
    the emitted rows in sequential visit order as
    (si, score, align_len, ident, gaps, qs, qe, ss, se) arrays — or
    None when nothing clears min_raw_score. ``ext_args`` =
    (qrow, qord, crow, cord, rp) selects BLOSUM (rp=None) or
    reward/penalty scoring for the extension batches.

    Block mode (qoffs/q_strs given): the query side is a whole
    BLOCK's concatenation (sentinel-separated, exactly like the
    volume's cat_protein/cat_nucl) and ``sq`` carries GLOBAL
    positions. Grouping then keys on (query, subject, diagonal-in-
    query-local-coords) so two queries can never share a coverage
    group, and the gapped stage slices each HSP's own query string
    back out via qoffs. Returned q coords stay GLOBAL; callers map
    them back per row."""
    qrow, qord, crow, cord, rp = ext_args
    # --- group by (subject, diagonal); within a group qpos ascends
    # (collection order is qpos-major, bucket order si/spos asc) ---
    seed_rank = None
    if qoffs is not None:
        qidx_all = np.searchsorted(qoffs, sq, side="right") - 1
        diag = ssp - (sq - qoffs[qidx_all])
        # lexsort (stable): groups ordered by (qidx, ssi, diag); the
        # original collection order is global-qpos-major, so within
        # each group sq still ascends — same invariant as the
        # single-query argsort path, no int64 key packing needed
        order = np.lexsort((diag, ssi, qidx_all))
        qidx_s = qidx_all[order]
        sq, ssi, ssp = sq[order], ssi[order], ssp[order]
        gpos, diag_s = gpos[order], diag[order]
        seed_sc = seed_sc_all[order]
        seed_idb = seed_id_all[order]
        seed_rank = order
        chg = ((qidx_s[1:] != qidx_s[:-1]) | (ssi[1:] != ssi[:-1])
               | (diag_s[1:] != diag_s[:-1]))
        bounds = np.flatnonzero(chg) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sq)]))
    else:
        diag = ssp - sq
        dkey = ssi * np.int64(2 ** 32) + (diag + np.int64(2 ** 31))
        order = np.argsort(dkey, kind="stable")
        sq, ssi, ssp = sq[order], ssi[order], ssp[order]
        gpos, dkey = gpos[order], dkey[order]
        seed_sc = seed_sc_all[order]
        seed_idb = seed_id_all[order]
        seed_rank = order                 # original visit rank
        bounds = np.flatnonzero(dkey[1:] != dkey[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(dkey)]))
    n_groups = len(starts)
    # group-augmented seed key: globally ascending because sq ascends
    # within each group — one searchsorted jumps every group's pointer
    # past its covered prefix in a single vectorized call (the naive
    # one-step advance loop was O(longest chain) whole-array passes: a
    # 300 bp homology puts ~300 seeds on one diagonal)
    _OFF = np.int64(1) << np.int64(32)
    # the coverage keys pack (group id, query position) into one int64;
    # silent wraparound would corrupt the dedupe, so reject outright —
    # unreachable for sane block_size (a block would need 2^32 query
    # chars or 2^31 seed groups), but loud beats wrong
    if len(sq) and (int(sq.max()) >= int(_OFF) or n_groups >= 2 ** 31):
        raise ValueError(
            f"block too large for coverage-key packing "
            f"(max qpos {int(sq.max())}, {n_groups} groups); "
            f"reduce cfg.block_size")
    gid = np.repeat(np.arange(n_groups, dtype=np.int64),
                    ends - starts)
    aug = gid * _OFF + sq
    covered = np.full(n_groups, -1, dtype=np.int64)
    g_all = np.arange(n_groups, dtype=np.int64)
    min_raw = cfg.min_raw_score
    two_hit = int(cfg.window_size or 0)
    if two_hit:
        # Two-hit seeding, vectorized. Sequential semantics per group
        # (qpos ascending): a covered seed is skipped outright; an
        # uncovered seed first compares against the LAST VISITED
        # uncovered seed (`pending`), then becomes pending itself;
        # only a pair within the window triggers an extension. So a
        # round's trigger is either the first uncovered seed (when the
        # carried pending is within the window) or the first
        # consecutive in-group pair within the window strictly after
        # it — precomputable: d_i = sq_i - sq_{i-1} and a suffix-min
        # "next index with d <= window" table.
        d_prev = np.empty(len(sq), dtype=np.int64)
        if len(sq) > 1:
            d_prev[1:] = sq[1:] - sq[:-1]
        d_prev[starts] = np.int64(2 ** 62)    # group start: no prev
        idx_all = np.arange(len(sq), dtype=np.int64)
        nok = np.where(d_prev <= two_hit, idx_all, np.int64(2 ** 62))
        next_ok = np.minimum.accumulate(nok[::-1])[::-1]
        pending = np.full(n_groups, np.int64(-2 ** 62), dtype=np.int64)
        th_done = np.zeros(n_groups, dtype=bool)
    res: list[tuple[np.ndarray, ...]] = []
    while True:
        # first seed per group with sq > covered — the sequential
        # `seen` semantics, one searchsorted for all groups
        ptr = np.searchsorted(aug, g_all * _OFF + covered, side="right")
        if two_hit:
            lg = np.flatnonzero((ptr < ends) & ~th_done)
            if not len(lg):
                break
            p = ptr[lg]
            trig_at_p = (sq[p] - pending[lg]) <= two_hit
            nxt = next_ok[np.minimum(p + 1, len(sq) - 1)]
            nxt = np.where(p + 1 < len(sq), nxt, np.int64(2 ** 62))
            cand = np.where(trig_at_p, p, nxt)
            has = cand < ends[lg]
            # no trigger left and covered only grows -> never will be
            th_done[lg[~has]] = True
            d_idx = lg[has]
            if not len(d_idx):
                continue
            ci = cand[has]
            pending[d_idx] = sq[ci]
        else:
            d_idx = np.flatnonzero(ptr < ends)
            if not len(d_idx):
                break
            ci = ptr[d_idx]
        # neighborhood seeds are mostly weak (score ~T) and X-drop out
        # within a few residues: start the extension chunk narrow and
        # let it grow; exact long-word seeds keep the wider start.
        c0 = 16 if narrow else 64
        gain_r, ext_r, m_r = _extend_batch(
            qrow, qord, crow, cord, sq[ci] + k, gpos[ci] + k, +1,
            cfg.xdrop, chunk=c0, rp=rp)
        gain_l, ext_l, m_l = _extend_batch(
            qrow, qord, crow, cord, sq[ci] - 1, gpos[ci] - 1, -1,
            cfg.xdrop, chunk=c0, rp=rp)
        score = seed_sc[ci] + gain_r + gain_l
        qs = sq[ci] - ext_l
        qe = sq[ci] + k - 1 + ext_r
        ident = seed_idb[ci] + m_r + m_l
        ss = ssp[ci] - (sq[ci] - qs)
        covered[d_idx] = qe               # coverage updates regardless
        keep = score >= min_raw
        if keep.any():
            res.append((seed_rank[ci[keep]], ssi[ci[keep]],
                        score[keep], ident[keep], qs[keep], qe[keep],
                        ss[keep]))
    if not res:
        return None
    rank = np.concatenate([r[0] for r in res])
    emit = np.argsort(rank)               # sequential visit order
    r_si = np.concatenate([r[1] for r in res])[emit]
    r_sc = np.concatenate([r[2] for r in res])[emit]
    r_id = np.concatenate([r[3] for r in res])[emit]
    r_qs = np.concatenate([r[4] for r in res])[emit]
    r_qe = np.concatenate([r[5] for r in res])[emit]
    r_ss = np.concatenate([r[6] for r in res])[emit]
    r_se = r_ss + (r_qe - r_qs)

    if cfg.gapped:
        # stage 2, batched across HSPs: the DP windows of EVERY
        # triggered HSP run through one size-tiled anti-diagonal sweep
        # (gapped_extend_batch — bit-identical to the per-HSP loop,
        # including the pad ladder), then emission/dedupe replays the
        # sequential visit order so first-wins semantics are
        # unchanged. Block mode slices each HSP's own query string
        # (DP must never see the sentinel-joined neighbors) and
        # scopes the dedupe key per query.
        ext_seqs = index.ext_seqs
        trig = cfg.gap_trigger_eff
        gap_items = []
        gap_meta = {}                 # t -> (batch position, qi_t, off)
        for t in range(len(r_sc)):
            if int(r_sc[t]) < trig:
                continue
            qs_v, qe_v = int(r_qs[t]), int(r_qe[t])
            if qoffs is not None:
                qi_t = int(np.searchsorted(qoffs, qs_v, "right")) - 1
                off = int(qoffs[qi_t])
                gap_items.append((q_strs[qi_t], ext_seqs[int(r_si[t])],
                                  qs_v - off, qe_v - off,
                                  int(r_ss[t]), int(r_se[t])))
                gap_meta[t] = (len(gap_items) - 1, qi_t, off)
            else:
                gap_items.append((q_ext, ext_seqs[int(r_si[t])],
                                  qs_v, qe_v, int(r_ss[t]), int(r_se[t])))
                gap_meta[t] = (len(gap_items) - 1, None, 0)
        gap_res = gapped_extend_batch(gap_items, cfg) if gap_items else []

        rows = []
        emitted: set[tuple] = set()
        for t in range(len(r_sc)):
            score, qs_v, qe_v, ss_v, se_v, ident_v = (
                int(r_sc[t]), int(r_qs[t]), int(r_qe[t]),
                int(r_ss[t]), int(r_se[t]), int(r_id[t]))
            gaps_n, align_len = 0, qe_v - qs_v + 1
            si_t = int(r_si[t])
            if t in gap_meta:
                pos, qi_t, off = gap_meta[t]
                (gscore, gqs, gqe, gss, gse, gident, gg, galn
                 ) = gap_res[pos]
                gqs, gqe = gqs + off, gqe + off
                key = ((qi_t, si_t, gqs, gqe, gss, gse)
                       if qi_t is not None else (si_t, gqs, gqe, gss, gse))
                if gscore < min_raw:
                    continue
                score, qs_v, qe_v, ss_v, se_v = gscore, gqs, gqe, gss, gse
                ident_v, gaps_n, align_len = gident, gg, galn
                if key in emitted:
                    continue
                emitted.add(key)
            rows.append((si_t, score, align_len, ident_v, gaps_n,
                         qs_v, qe_v, ss_v, se_v))
        if not rows:
            return None
        arr = np.array(rows, dtype=np.int64)
        return (arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4],
                arr[:, 5], arr[:, 6], arr[:, 7], arr[:, 8])
    al = r_qe - r_qs + 1
    gp = np.zeros(len(r_sc), dtype=np.int64)
    return (r_si, r_sc, al, r_id, gp, r_qs, r_qe, r_ss, r_se)


def _raw_cols_from_core(qid: int, qlen: int, index: SubjectIndex,
                        core, qstrand: int) -> dict[str, np.ndarray]:
    """RAW_HITS column dict from a _batched_core result. For the minus
    strand the query coords are mapped back to the forward
    orientation, exactly like the sequential branch (after the gapped
    stage)."""
    r_si, r_sc, al, r_id, gp, r_qs, r_qe, r_ss, r_se = core
    if qstrand == -1:
        r_qs, r_qe = qlen - r_qe - 1, qlen - r_qs - 1
    n = len(r_sc)
    i32 = np.int32
    return {
        "qid": np.full(n, qid, dtype=np.int64),
        "sid": index.sids_np[r_si],
        "score": r_sc.astype(i32),
        "align_len": al.astype(i32),
        "ident_count": r_id.astype(i32),
        "gaps": gp.astype(i32),
        "qstart0": r_qs.astype(i32),
        "qend0": r_qe.astype(i32),
        "sstart0": r_ss.astype(i32),
        "send0": r_se.astype(i32),
        "qstrand": np.full(n, qstrand, dtype=i32),
        "sstrand": np.ones(n, dtype=i32),
        "qlen": np.full(n, qlen, dtype=i32),
    }


def _align_nucl_batched_arrays(qid: int, seq: str, index: SubjectIndex,
                               cfg: BlastConfig,
                               qlen: int) -> dict[str, np.ndarray]:
    """The blastn batched path: the sequential per-seed loop replaced
    by the same vectorized stages as blastp — per strand: hashed seed
    collection over the query's word buckets, vectorized exact-word
    verification against the volume's concatenated codepoints
    (cat_nucl), (subject, diagonal) coverage dedupe in whole-array
    rounds, batched reward/penalty X-drop extension, optional gapped
    stage. Both strands run the full stage (forward first, then the
    reverse complement with coordinates mapped back), matching the
    sequential branch's strand-major emission order; rows are pinned
    identical by test_batched_parity's blastn cases."""
    k = cfg.word_size
    cord, offs = index.cat_nucl
    fold = index.fold_case
    parts: list[dict[str, np.ndarray]] = []
    strands = [(seq, 1), (revcomp(seq), -1)]
    for q, qstrand in strands:
        q_ext = fold_case_str(q) if fold else q
        qo = np.frombuffer(q_ext.encode("utf-32-le"),
                           dtype="<u4").astype(np.int32)
        qb = np.asarray(index.query_buckets(q_ext), dtype=np.int64)
        if cfg.lcase_masking:
            low = np.array([c.islower() for c in q], dtype=np.int32)
            lowc = np.concatenate(([0], np.cumsum(low)))
            qb = np.where((lowc[k:] - lowc[:-k]) > 0, -1, qb)
        qpos_list = np.flatnonzero(qb >= 0)
        if not len(qpos_list):
            continue
        bis = qb[qpos_list]
        bstart, bend = index.bucket_bounds_np
        counts = bend[bis] - bstart[bis]
        total = int(counts.sum())
        if total == 0:
            continue
        sq = np.repeat(qpos_list, counts)
        cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
        flat = np.repeat(bstart[bis], counts) + within
        ssi = index.sis_np[flat]
        ssp = index.poss_np[flat]
        gpos = offs[ssi] + ssp
        ok = np.ones(total, dtype=bool)
        for j in range(k):
            ok &= cord[gpos + j] == qo[sq + j]
        if not ok.all():
            sq, ssi, ssp, gpos = sq[ok], ssi[ok], ssp[ok], gpos[ok]
        if not len(sq):
            continue
        seed_sc_all = np.full(len(sq), k * cfg.reward, dtype=np.int64)
        seed_id_all = np.full(len(sq), k, dtype=np.int64)
        core = _batched_core(q_ext, index, cfg, k, sq, ssi, ssp, gpos,
                             seed_sc_all, seed_id_all,
                             (None, qo, None, cord,
                              (cfg.reward, cfg.penalty)))
        if core is not None:
            parts.append(_raw_cols_from_core(qid, qlen, index, core,
                                             qstrand=qstrand))
    if not parts:
        return _empty_raw_cols()
    names = [f.name for f in RAW_HITS.fields]
    return {nm: np.concatenate([p[nm] for p in parts]) for nm in names}


def _empty_raw_cols() -> dict[str, np.ndarray]:
    out = {}
    for f in RAW_HITS.fields:
        if f.name == "qid":
            out[f.name] = np.empty(0, dtype=np.int64)
        elif f.name == "sid":
            out[f.name] = np.empty(0, dtype=object)
        else:
            out[f.name] = np.empty(0, dtype=np.int32)
    return out


def _raw_cols_from_core_block(core, index: SubjectIndex,
                              qoffs: np.ndarray, qids_np: np.ndarray,
                              qlens_np: np.ndarray, qstrand: int,
                              ) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """RAW_HITS columns from a BLOCK-mode _batched_core result: each
    row's query is recovered from its global start offset, coords map
    back to that query's local (and, for the minus strand, forward)
    orientation. Also returns the per-row query index so the blastn
    caller can restore per-query strand-major emission order."""
    r_si, r_sc, al, r_id, gp, r_qs, r_qe, r_ss, r_se = core
    qidx = np.searchsorted(qoffs, r_qs, side="right") - 1
    off = qoffs[qidx]
    r_qs = r_qs - off
    r_qe = r_qe - off
    qlen = qlens_np[qidx]
    if qstrand == -1:
        r_qs, r_qe = qlen - r_qe - 1, qlen - r_qs - 1
    n = len(r_sc)
    i32 = np.int32
    cols = {
        "qid": qids_np[qidx],
        "sid": index.sids_np[r_si],
        "score": r_sc.astype(i32),
        "align_len": al.astype(i32),
        "ident_count": r_id.astype(i32),
        "gaps": gp.astype(i32),
        "qstart0": r_qs.astype(i32),
        "qend0": r_qe.astype(i32),
        "sstart0": r_ss.astype(i32),
        "send0": r_se.astype(i32),
        "qstrand": np.full(n, qstrand, dtype=i32),
        "sstrand": np.ones(n, dtype=i32),
        "qlen": qlen.astype(i32),
    }
    return cols, qidx


def _expand_buckets(index: SubjectIndex, qpos_list: np.ndarray,
                    bis: np.ndarray):
    """Expand bucket ids into per-seed (global qpos, subject idx,
    subject pos) arrays — the shared seed-expansion step of every
    batched path."""
    bstart, bend = index.bucket_bounds_np
    counts = bend[bis] - bstart[bis]
    total = int(counts.sum())
    if total == 0:
        return None
    sq = np.repeat(qpos_list, counts)
    cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
    flat = np.repeat(bstart[bis], counts) + within
    return sq, index.sis_np[flat], index.poss_np[flat]


def _align_block_protein_batched(items: list[tuple[int, str]],
                                 index: SubjectIndex, cfg: BlastConfig,
                                 ) -> dict[str, np.ndarray]:
    """Block-level blastp batching: the WHOLE query block is
    concatenated into one sentinel-separated encoding (the query-side
    mirror of the volume's cat_protein), so seed collection, exact-word
    verification, the coverage-dedupe rounds and the X-drop extension
    batches each run ONCE per (block, volume) task instead of once per
    query — the per-query fixed overhead that made seed-sparse
    workloads slower batched than sequential disappears. Rows are
    identical to align_query per query, concatenated in block order
    (pinned by test_batched_parity's block cases)."""
    k = cfg.word_size
    fold = index.fold_case
    sepw = max(k - 1, 1)
    sep_o = np.full(sepw, -1, dtype=np.int32)
    sep_r = np.full(sepw, _B62_SENT, dtype=np.intp)
    sep_c = np.full(sepw, _HASH_SEP, dtype=np.uint32)
    qids, qlens, qoffs, q_strs = [], [], [], []
    ords, rows, codes = [], [], []
    masked_parts: list[np.ndarray] = []
    cursor = 0
    for qid, seq in items:
        q_ext = fold_case_str(seq) if fold else seq
        qids.append(int(qid))
        qlens.append(len(seq))
        qoffs.append(cursor)
        q_strs.append(q_ext)
        o, r = encode_protein(q_ext)
        ords += [o, sep_o]
        rows += [r, sep_r]
        codes += [np.frombuffer(q_ext.encode("utf-32-le"),
                                dtype="<u4"), sep_c]
        nw = len(seq) - k + 1
        if nw > 0:
            v = cursor + np.arange(nw, dtype=np.int64)
            if cfg.lcase_masking:
                # original casing decides, exactly like the per-query
                # path's lcase_src
                low = np.array([ch.islower() for ch in seq],
                               dtype=np.int32)
                lowc = np.concatenate(([0], np.cumsum(low)))
                v = v[(lowc[k:] - lowc[:-k]) == 0]
            masked_parts.append(v)
        cursor += len(o) + sepw
    if not qids or not masked_parts:
        return _empty_raw_cols()
    qo = np.concatenate(ords)
    qi_arr = np.concatenate(rows)
    qc = np.concatenate(codes)
    qoffs_np = np.asarray(qoffs, dtype=np.int64)
    qlens_np = np.asarray(qlens, dtype=np.int64)
    qids_np = np.asarray(qids, dtype=np.int64)
    valid = np.concatenate(masked_parts)
    cord, crow, offs = index.cat_protein
    nb_threshold = cfg.threshold
    if nb_threshold is not None:
        # neighborhood probes stay a (memoized) per-word loop, but now
        # over the block's positions at once; every seed joins ONE
        # shared extension batch. Visit order = global qpos-major =
        # per-query sequential order concatenated.
        qn_of = np.searchsorted(qoffs_np, valid, side="right") - 1
        qp_parts: list[np.ndarray] = []
        parts: list[tuple[np.ndarray, ...]] = []
        for gp, qn in zip(valid.tolist(), qn_of.tolist()):
            lp = gp - qoffs[qn]
            arrs = index.neighborhood_arrays(
                q_strs[qn][lp:lp + k], nb_threshold)
            if arrs is None:
                continue
            qp_parts.append(np.full(len(arrs[0]), gp, dtype=np.int64))
            parts.append(arrs)
        if not parts:
            return _empty_raw_cols()
        sq = np.concatenate(qp_parts)
        ssi = np.concatenate([a[0] for a in parts])
        ssp = np.concatenate([a[1] for a in parts])
        gpos = offs[ssi] + ssp
        seed_sc_all = np.concatenate([a[2] for a in parts])
        seed_id_all = np.concatenate([a[3] for a in parts])
    else:
        h = _window_hashes(qc, k)
        qb = index.buckets_for_hashes(h[valid])
        live = qb >= 0
        qpos_list = valid[live]
        if not len(qpos_list):
            return _empty_raw_cols()
        expanded = _expand_buckets(index, qpos_list, qb[live])
        if expanded is None:
            return _empty_raw_cols()
        sq, ssi, ssp = expanded
        gpos = offs[ssi] + ssp
        ok = np.ones(len(sq), dtype=bool)
        for j in range(k):
            ok &= cord[gpos + j] == qo[sq + j]
        if not ok.all():
            sq, ssi, ssp, gpos = sq[ok], ssi[ok], ssp[ok], gpos[ok]
        if not len(sq):
            return _empty_raw_cols()
        # self-score prefix over the cat: _B62E so sentinel rows are
        # indexable (valid windows never include one)
        prefnp = np.concatenate(([0], np.cumsum(
            _B62E[qi_arr, qi_arr], dtype=np.int64)))
        seed_sc_all = prefnp[sq + k] - prefnp[sq]
        seed_id_all = np.full(len(sq), k, dtype=np.int64)
    core = _batched_core(None, index, cfg, k, sq, ssi, ssp, gpos,
                         seed_sc_all, seed_id_all,
                         (qi_arr, qo, crow, cord, None),
                         narrow=nb_threshold is not None,
                         qoffs=qoffs_np, q_strs=q_strs)
    if core is None:
        return _empty_raw_cols()
    cols, _ = _raw_cols_from_core_block(core, index, qoffs_np, qids_np,
                                        qlens_np, qstrand=1)
    return cols


def _align_block_nucl_batched(items: list[tuple[int, str]],
                              index: SubjectIndex, cfg: BlastConfig,
                              ) -> dict[str, np.ndarray]:
    """Block-level blastn batching: per strand, all of the block's
    (strand-oriented) queries concatenate into one sentinel-separated
    codepoint array and run the shared batched stages once. Final rows
    are restored to the sequential per-query strand-major order (every
    query's plus rows, then its minus rows) by a stable sort on the
    per-row query index over [plus; minus]."""
    k = cfg.word_size
    fold = index.fold_case
    sepw = max(k - 1, 1)
    sep_o = np.full(sepw, -1, dtype=np.int32)
    sep_c = np.full(sepw, _HASH_SEP, dtype=np.uint32)
    cord, offs = index.cat_nucl
    if not items:
        return _empty_raw_cols()
    qids_np = np.asarray([q for q, _ in items], dtype=np.int64)
    qlens_np = np.asarray([len(s) for _, s in items], dtype=np.int64)
    strand_parts: list[tuple[dict[str, np.ndarray], np.ndarray]] = []
    for qstrand in (1, -1):
        seqs = [s if qstrand == 1 else revcomp(s) for _, s in items]
        ords, codes, qoffs, q_strs = [], [], [], []
        masked_parts: list[np.ndarray] = []
        cursor = 0
        for s in seqs:
            q_ext = fold_case_str(s) if fold else s
            q_strs.append(q_ext)
            c = np.frombuffer(q_ext.encode("utf-32-le"), dtype="<u4")
            qoffs.append(cursor)
            ords += [c.astype(np.int32), sep_o]
            codes += [c, sep_c]
            nw = len(s) - k + 1
            if nw > 0:
                v = cursor + np.arange(nw, dtype=np.int64)
                if cfg.lcase_masking:
                    low = np.array([ch.islower() for ch in s],
                                   dtype=np.int32)
                    lowc = np.concatenate(([0], np.cumsum(low)))
                    v = v[(lowc[k:] - lowc[:-k]) == 0]
                masked_parts.append(v)
            cursor += len(c) + sepw
        if not masked_parts:
            continue
        qo = np.concatenate(ords)
        qc = np.concatenate(codes)
        qoffs_np = np.asarray(qoffs, dtype=np.int64)
        valid = np.concatenate(masked_parts)
        h = _window_hashes(qc, k)
        qb = index.buckets_for_hashes(h[valid])
        live = qb >= 0
        qpos_list = valid[live]
        if not len(qpos_list):
            continue
        expanded = _expand_buckets(index, qpos_list, qb[live])
        if expanded is None:
            continue
        sq, ssi, ssp = expanded
        gpos = offs[ssi] + ssp
        ok = np.ones(len(sq), dtype=bool)
        for j in range(k):
            ok &= cord[gpos + j] == qo[sq + j]
        if not ok.all():
            sq, ssi, ssp, gpos = sq[ok], ssi[ok], ssp[ok], gpos[ok]
        if not len(sq):
            continue
        seed_sc_all = np.full(len(sq), k * cfg.reward, dtype=np.int64)
        seed_id_all = np.full(len(sq), k, dtype=np.int64)
        core = _batched_core(None, index, cfg, k, sq, ssi, ssp, gpos,
                             seed_sc_all, seed_id_all,
                             (None, qo, None, cord,
                              (cfg.reward, cfg.penalty)),
                             qoffs=qoffs_np, q_strs=q_strs)
        if core is None:
            continue
        strand_parts.append(_raw_cols_from_core_block(
            core, index, qoffs_np, qids_np, qlens_np, qstrand))
    if not strand_parts:
        return _empty_raw_cols()
    names = [f.name for f in RAW_HITS.fields]
    if len(strand_parts) == 1:
        return strand_parts[0][0]
    qidx_all = np.concatenate([p[1] for p in strand_parts])
    emit = np.argsort(qidx_all, kind="stable")
    return {nm: np.concatenate([p[0][nm] for p in strand_parts])[emit]
            for nm in names}


def _align_protein_batched(qid: int, q_ext: str, index: SubjectIndex,
                           cfg: BlastConfig, lcase_src: str | None,
                           qlen: int) -> list[tuple]:
    """Tuple-form adapter over the arrays implementation (align_query
    API compatibility; kernels use align_block's column path)."""
    cols = _align_protein_batched_arrays(qid, q_ext, index, cfg,
                                         lcase_src, qlen)
    names = [f.name for f in RAW_HITS.fields]
    seqs = [cols[nm].tolist() for nm in names]
    return list(zip(*seqs)) if len(seqs[0]) else []


def _extend_rows(q: str, s: str, qpos: int, spos: int, k: int,
                 qrows: list, seed_score: int, xdrop: int):
    """Ungapped X-drop extension, matrix scoring (blastp): ``qrows``
    holds one precomputed {subject char: score} dict per query
    position (row maps cover all byte chars; rare non-Latin-1 subject
    chars fall back to the X column), and the seed score arrives
    precomputed from the diagonal prefix sums — one dict hit per
    extended pair is the entire scoring cost."""
    qlen, slen = len(q), len(s)
    score = seed_score
    ident = k
    best_score, best_qe, best_ident = score, qpos + k - 1, ident
    i, j, cur, cur_ident = qpos + k, spos + k, score, ident
    while i < qlen and j < slen:
        ch = s[j]
        if q[i] == ch:
            cur_ident += 1
        v = qrows[i].get(ch)
        cur += v if v is not None else qrows[i]["X"]
        if cur > best_score:
            best_score, best_qe, best_ident = cur, i, cur_ident
        elif best_score - cur > xdrop:
            break
        i += 1
        j += 1
    score, qe, ident = best_score, best_qe, best_ident
    best_score, best_qs, best_ident = score, qpos, ident
    i, j, cur, cur_ident = qpos - 1, spos - 1, score, ident
    while i >= 0 and j >= 0:
        ch = s[j]
        if q[i] == ch:
            cur_ident += 1
        v = qrows[i].get(ch)
        cur += v if v is not None else qrows[i]["X"]
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


def _pair_score_matrix(a: str, b: str, protein: bool,
                       reward: int, penalty: int) -> np.ndarray:
    """Substitution score for every (a_i, b_j) pair as an (m, n) int
    matrix — BLOSUM62 for protein, reward/penalty for nucleotide."""
    if protein:
        _, ai = encode_protein(a)
        _, bi = encode_protein(b)
        return _B62[np.ix_(ai, bi)]
    av = np.frombuffer(a.encode("utf-32-le"), dtype="<u4")
    bv = np.frombuffer(b.encode("utf-32-le"), dtype="<u4")
    return np.where(av[:, None] == bv[None, :], reward, penalty).astype(np.int32)


def gotoh_local(a: str, b: str, protein: bool, reward: int, penalty: int,
                gap_open: int, gap_extend: int,
                ) -> tuple[int, int, int, int, int, int, int, int]:
    """Affine-gap Smith-Waterman (Gotoh) with traceback over two
    windowed strings. A gap of length L costs gap_open + L*gap_extend
    (NCBI's convention). Returns (score, a0, a1, b0, b1, ident, gaps,
    align_len) with 0-based inclusive local coordinates; all-zero
    score returns (0, ...) and callers skip.

    Ties break deterministically: diagonal > gap-in-a > gap-in-b at
    equal score, and the traceback starts from the FIRST maximal cell
    in row-major order (stable across runs by construction). O(m*n)
    time/space — used only on HSP-sized windows, never whole
    sequences.

    The forward DP runs as a vectorized ANTI-DIAGONAL sweep over
    rolling 1D buffers indexed by row (every dependency of diagonal
    i+j=d lives on d-1 / d-2 at row i or i-1, i.e. pure slices — no
    2D gathers); H/pointer rows are kept diagonal-major for the
    traceback. Recurrences, pointer codes and tie-breaking are
    bit-identical to the per-cell reference (_gotoh_local_scalar,
    pinned by test_gapped's equivalence cases); the traceback stays a
    scalar walk — it is O(alignment), not O(m*n)."""
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return (0, 0, 0, 0, 0, 0, 0, 0)
    sub = _pair_score_matrix(a, b, protein, reward, penalty)
    subf = sub[:, ::-1]               # anti-diagonals become diagonals
    NEG = np.int32(-(10 ** 6))
    go = gap_open + gap_extend        # cost of a length-1 gap
    ge = gap_extend
    # rolling row-indexed buffers for diagonals d-1 / d-2; defaults ARE
    # the DP boundary: H=0 on row 0 / col 0, E/F=-inf
    H1 = np.zeros(m + 1, dtype=np.int32)
    H2 = np.zeros(m + 1, dtype=np.int32)
    E1 = np.full(m + 1, NEG, dtype=np.int32)
    F1 = np.full(m + 1, NEG, dtype=np.int32)
    # diagonal-major storage for traceback + argmax: per diagonal d the
    # compact arrays cover rows lo_d..hi_d
    hs: list = [None, None]
    phs: list = [None, None]
    pes: list = [None, None]
    pfs: list = [None, None]
    los = [0, 0]
    best_score = 0
    for d in range(2, m + n + 1):
        lo = max(1, d - n)
        hi = min(m, d - 1)
        if lo > hi:
            hs.append(None)
            phs.append(None)
            pes.append(None)
            pfs.append(None)
            los.append(lo)
            continue
        e_open = H1[lo:hi + 1] - go
        e_ext = E1[lo:hi + 1] - ge
        e_v = np.maximum(e_open, e_ext)
        pe = e_open >= e_ext
        f_open = H1[lo - 1:hi] - go
        f_ext = F1[lo - 1:hi] - ge
        f_v = np.maximum(f_open, f_ext)
        pf = f_open >= f_ext
        # sub[i-1, d-i-1] for i=lo..hi == a diagonal of the flipped
        # matrix: subf[r, r + n - d + 1] for r = lo-1..hi-1
        off = n - d + 1
        r0 = max(0, -off)
        sd = subf.diagonal(off)[lo - 1 - r0:hi - r0]
        diag = H2[lo - 1:hi] + sd
        best = np.where(diag >= 0, diag, 0).astype(np.int32)
        ptr = np.where(diag >= 0, np.int8(1), np.int8(0))
        ptr = np.where(e_v > best, np.int8(2), ptr)
        best = np.maximum(e_v, best)
        ptr = np.where(f_v > best, np.int8(3), ptr)
        best = np.maximum(f_v, best)
        hs.append(best)
        phs.append(ptr)
        pes.append(pe)
        pfs.append(pf)
        los.append(lo)
        mx = int(best.max())
        if mx > best_score:
            best_score = mx
        # rotate: new H row buffer with boundary defaults outside lo..hi
        H2 = H1
        H1 = np.zeros(m + 1, dtype=np.int32)
        H1[lo:hi + 1] = best
        E1 = np.full(m + 1, NEG, dtype=np.int32)
        E1[lo:hi + 1] = e_v
        F1 = np.full(m + 1, NEG, dtype=np.int32)
        F1[lo:hi + 1] = f_v
    if best_score <= 0:
        return (0, 0, 0, 0, 0, 0, 0, 0)
    # first maximal cell in ROW-MAJOR order: smallest i, then smallest
    # j — i.e. among diagonals containing the max, the candidate with
    # the smallest row, ties broken by smaller j = smaller d
    bi, bj = m + 1, n + 1
    for d in range(2, m + n + 1):
        hv = hs[d]
        if hv is None or len(hv) == 0:
            continue
        w = np.flatnonzero(hv == best_score)
        if not len(w):
            continue
        i = los[d] + int(w[0])        # smallest row on this diagonal
        j = d - i
        if i < bi or (i == bi and j < bj):
            bi, bj = i, j
    return _gotoh_traceback_diag(a, b, best_score, bi, bj,
                                 phs, pes, pfs, los)


def _gotoh_traceback_diag(a, b, score, i, j, phs, pes, pfs, los):
    """Scalar traceback over diagonal-major pointer rows: PH[i, j] ==
    phs[i + j][i - los[i + j]]."""
    a1, b1 = i - 1, j - 1
    ident = gaps = align_len = 0
    state = "H"
    while i > 0 and j > 0:
        d = i + j
        pos = i - los[d]
        if state == "H":
            p = phs[d][pos]
            if p == 0:
                break
            if p == 1:
                align_len += 1
                if a[i - 1] == b[j - 1]:
                    ident += 1
                i -= 1
                j -= 1
            elif p == 2:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            align_len += 1
            gaps += 1
            opened = pes[d][pos]
            j -= 1
            state = "H" if opened else "E"
        else:
            align_len += 1
            gaps += 1
            opened = pfs[d][pos]
            i -= 1
            state = "H" if opened else "F"
    return (score, i, a1, j, b1, ident, gaps, align_len)


def gotoh_local_batch(pairs, protein: bool, reward: int, penalty: int,
                      gap_open: int, gap_extend: int) -> list[tuple]:
    """Batched gotoh_local: run MANY windows' anti-diagonal forward
    sweeps simultaneously. Bit-identical to [gotoh_local(a, b, ...)
    per pair] — same recurrences, same first-maximal-cell-in-row-major
    tie-break, same scalar traceback — but the per-diagonal numpy
    dispatch cost (which dominates on HSP-sized windows: ~200
    diagonals x ~20 numpy ops each) is paid once per BATCH diagonal
    instead of once per window diagonal.

    Geometry: each window w has its own band (lo_w(d)..hi_w(d)) per
    diagonal; the batch sweeps rows 1..max(m) with a per-window
    validity mask, and masked-out cells read the SAME boundary values
    (H=0, E/F=-inf) the scalar rolling buffers provide. Windows are
    size-sorted and tiled so a short window never pays a long one's
    diagonals (and pointer storage stays cache-friendly)."""
    n_all = len(pairs)
    results: list = [None] * n_all
    order = sorted(range(n_all), key=lambda t: len(pairs[t][0]) + len(pairs[t][1]))
    # tile cap: keep the (B, D, M) pointer tensors ~tens of MB
    CELL_BUDGET = 8_000_000
    t0 = 0
    while t0 < n_all:
        t1 = t0
        mmax = nmax = 0
        while t1 < n_all:
            a, b = pairs[order[t1]]
            m2, n2 = max(mmax, len(a)), max(nmax, len(b))
            bsz = t1 - t0 + 1
            if bsz > 1 and bsz * (m2 + n2 + 1) * (m2 + 1) > CELL_BUDGET:
                break
            mmax, nmax = m2, n2
            t1 += 1
        tile = [order[t] for t in range(t0, t1)]
        for t, r in zip(tile, _gotoh_batch_tile(
                [pairs[t] for t in tile], protein, reward, penalty,
                gap_open, gap_extend)):
            results[t] = r
        t0 = t1
    return results


def _gotoh_batch_tile(pairs, protein, reward, penalty, gap_open,
                      gap_extend) -> list[tuple]:
    B = len(pairs)
    ms = np.array([len(a) for a, _ in pairs], dtype=np.int64)
    ns = np.array([len(b) for _, b in pairs], dtype=np.int64)
    M, N = int(ms.max(initial=0)), int(ns.max(initial=0))
    if M == 0 or N == 0:
        return [(0, 0, 0, 0, 0, 0, 0, 0)] * B
    NEG = np.int32(-(10 ** 6))
    go = gap_open + gap_extend
    ge = gap_extend
    # (B, M, N) substitution tensor; out-of-range cells NEG (they are
    # additionally masked out of every write, so the value is inert)
    sub_t = np.full((B, M, N), NEG, dtype=np.int32)
    for w, (a, b) in enumerate(pairs):
        if len(a) and len(b):
            sub_t[w, :len(a), :len(b)] = _pair_score_matrix(
                a, b, protein, reward, penalty)
    D = M + N
    rows = np.arange(1, M + 1)
    H1 = np.zeros((B, M + 1), dtype=np.int32)
    H2 = np.zeros((B, M + 1), dtype=np.int32)
    E1 = np.full((B, M + 1), NEG, dtype=np.int32)
    F1 = np.full((B, M + 1), NEG, dtype=np.int32)
    PH = np.zeros((B, D + 1, M + 1), dtype=np.int8)
    PE = np.zeros((B, D + 1, M + 1), dtype=np.bool_)
    PF = np.zeros((B, D + 1, M + 1), dtype=np.bool_)
    best_score = np.zeros(B, dtype=np.int64)
    best_i = np.full(B, M + 1, dtype=np.int64)
    best_j = np.full(B, N + 1, dtype=np.int64)
    for d in range(2, D + 1):
        lo = np.maximum(1, d - ns)          # (B,)
        hi = np.minimum(ms, d - 1)
        valid = (rows[None, :] >= lo[:, None]) & (rows[None, :] <= hi[:, None])
        if not valid.any():
            continue
        e_open = H1[:, 1:] - go             # cell (i, j-1), diagonal d-1
        e_ext = E1[:, 1:] - ge
        e_v = np.maximum(e_open, e_ext)
        pe = e_open >= e_ext
        f_open = H1[:, :-1] - go            # cell (i-1, j), diagonal d-1
        f_ext = F1[:, :-1] - ge
        f_v = np.maximum(f_open, f_ext)
        pf = f_open >= f_ext
        j_idx = np.clip(d - rows - 1, 0, N - 1)   # (M,)
        sd = sub_t[:, rows - 1, j_idx]            # (B, M)
        diag = H2[:, :-1] + sd
        best = np.where(diag >= 0, diag, 0).astype(np.int32)
        ptr = np.where(diag >= 0, np.int8(1), np.int8(0))
        ptr = np.where(e_v > best, np.int8(2), ptr)
        best = np.maximum(e_v, best)
        ptr = np.where(f_v > best, np.int8(3), ptr)
        best = np.maximum(f_v, best)
        # masked writes: outside the band the stored pointer stays 0
        # and the rolled buffers keep boundary values
        PH[:, d, 1:] = np.where(valid, ptr, np.int8(0))
        PE[:, d, 1:] = pe & valid
        PF[:, d, 1:] = pf & valid
        bm = np.where(valid, best, np.int32(-1))
        rowmax = bm.max(axis=1)
        # first row achieving the diagonal max (rows ascending == i
        # ascending == row-major-first on a fixed diagonal)
        cand_i = 1 + np.argmax(bm == rowmax[:, None], axis=1)
        cand_j = d - cand_i
        upd = (rowmax > best_score) | (
            (rowmax == best_score) & (rowmax > 0) & (
                (cand_i < best_i) | ((cand_i == best_i) & (cand_j < best_j))))
        best_score = np.where(upd, rowmax, best_score)
        best_i = np.where(upd, cand_i, best_i)
        best_j = np.where(upd, cand_j, best_j)
        H2 = H1
        H1 = np.zeros((B, M + 1), dtype=np.int32)
        H1[:, 1:] = np.where(valid, best, np.int32(0))
        E1 = np.full((B, M + 1), NEG, dtype=np.int32)
        E1[:, 1:] = np.where(valid, e_v, NEG)
        F1 = np.full((B, M + 1), NEG, dtype=np.int32)
        F1[:, 1:] = np.where(valid, f_v, NEG)
    out = []
    for w, (a, b) in enumerate(pairs):
        sc = int(best_score[w])
        if sc <= 0:
            out.append((0, 0, 0, 0, 0, 0, 0, 0))
            continue
        out.append(_gotoh_traceback_full(
            a, b, sc, int(best_i[w]), int(best_j[w]),
            PH[w], PE[w], PF[w]))
    return out


def _gotoh_traceback_full(a, b, score, i, j, PHd, PEd, PFd):
    """Scalar traceback over full-row diagonal-major pointer arrays:
    PH[i, j] == PHd[i + j, i] (the batch tile's storage layout)."""
    a1, b1 = i - 1, j - 1
    ident = gaps = align_len = 0
    state = "H"
    while i > 0 and j > 0:
        d = i + j
        if state == "H":
            p = PHd[d, i]
            if p == 0:
                break
            if p == 1:
                align_len += 1
                if a[i - 1] == b[j - 1]:
                    ident += 1
                i -= 1
                j -= 1
            elif p == 2:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            align_len += 1
            gaps += 1
            opened = PEd[d, i]
            j -= 1
            state = "H" if opened else "E"
        else:
            align_len += 1
            gaps += 1
            opened = PFd[d, i]
            i -= 1
            state = "H" if opened else "F"
    return (score, i, a1, j, b1, ident, gaps, align_len)


def gapped_extend_batch(items, cfg: BlastConfig) -> list[tuple]:
    """Batched gapped_extend: identical to [gapped_extend(q, s, qs,
    qe, ss, se, cfg) per item] including the geometric pad ladder —
    every pending window at a given pad level runs in ONE batched
    forward sweep; windows whose optimal alignment touches a growable
    edge re-enter the next pad level, exactly like the scalar loop."""
    n = len(items)
    results: list = [None] * n
    pads = [_GAP_PAD] * n
    pending = list(range(n))
    protein = cfg.task == "blastp"
    while pending:
        metas = []
        pairs = []
        for t in pending:
            q, s, qs, qe, ss, se = items[t]
            p = pads[t]
            q0, q1 = max(0, qs - p), min(len(q), qe + 1 + p)
            s0, s1 = max(0, ss - p), min(len(s), se + 1 + p)
            metas.append((t, q0, q1, s0, s1))
            pairs.append((q[q0:q1], s[s0:s1]))
        res = gotoh_local_batch(pairs, protein, cfg.reward, cfg.penalty,
                                cfg.gap_open_eff, cfg.gap_extend_eff)
        nxt = []
        for (t, q0, q1, s0, s1), r in zip(metas, res):
            score, a0, a1, b0, b1, ident, gaps, align_len = r
            q, s, _qs, _qe, _ss, _se = items[t]
            touches = ((a0 == 0 and q0 > 0)
                       or (a1 == q1 - q0 - 1 and q1 < len(q))
                       or (b0 == 0 and s0 > 0)
                       or (b1 == s1 - s0 - 1 and s1 < len(s)))
            if touches and pads[t] < _GAP_PAD_MAX:
                pads[t] *= 2
                nxt.append(t)
            else:
                results[t] = (score, q0 + a0, q0 + a1, s0 + b0, s0 + b1,
                              ident, gaps, align_len)
        pending = nxt
    return results


def _gotoh_traceback(a, b, H, PH, PE, PF, m, n):
    """Shared scalar traceback over filled pointer matrices —
    O(alignment length), no need to vectorize."""
    score = int(H.max())
    if score <= 0:
        return (0, 0, 0, 0, 0, 0, 0, 0)
    flat = int(np.argmax(H))          # first maximal cell, row-major
    i, j = divmod(flat, n + 1)
    a1, b1 = i - 1, j - 1
    ident = gaps = align_len = 0
    state = "H"
    while i > 0 and j > 0:
        if state == "H":
            p = PH[i, j]
            if p == 0:
                break
            if p == 1:
                align_len += 1
                if a[i - 1] == b[j - 1]:
                    ident += 1
                i -= 1
                j -= 1
            elif p == 2:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            align_len += 1
            gaps += 1
            opened = PE[i, j]
            j -= 1
            state = "H" if opened else "E"
        else:
            align_len += 1
            gaps += 1
            opened = PF[i, j]
            i -= 1
            state = "H" if opened else "F"
    return (score, i, a1, j, b1, ident, gaps, align_len)


def _gotoh_local_scalar(a: str, b: str, protein: bool, reward: int,
                        penalty: int, gap_open: int, gap_extend: int,
                        ) -> tuple[int, int, int, int, int, int, int, int]:
    """The readable per-cell reference implementation of gotoh_local,
    kept as the parity oracle for the anti-diagonal sweep
    (test_gapped equivalence + hypothesis property)."""
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return (0, 0, 0, 0, 0, 0, 0, 0)
    sub = _pair_score_matrix(a, b, protein, reward, penalty)
    NEG = -(10 ** 6)
    H = np.zeros((m + 1, n + 1), dtype=np.int32)
    E = np.full((m + 1, n + 1), NEG, dtype=np.int32)  # gap in a (left)
    Fv = np.full((m + 1, n + 1), NEG, dtype=np.int32)  # gap in b (up)
    # pointers: H: 0 stop, 1 diag, 2 from E, 3 from F; E/F: 1 = opened
    PH = np.zeros((m + 1, n + 1), dtype=np.int8)
    PE = np.zeros((m + 1, n + 1), dtype=np.int8)
    PF = np.zeros((m + 1, n + 1), dtype=np.int8)
    go = gap_open + gap_extend   # cost of a length-1 gap
    for i in range(1, m + 1):
        Hi, Hp = H[i], H[i - 1]
        Ei, Fi, Fp = E[i], Fv[i], Fv[i - 1]
        # F column-independent across j: vectorized for the whole row
        open_f = Hp - go
        ext_f = Fp - gap_extend
        np.maximum(open_f, ext_f, out=Fi[0:])
        PF[i] = np.where(open_f >= ext_f, 1, 0)
        subrow = sub[i - 1]
        for j in range(1, n + 1):
            e_open = Hi[j - 1] - go
            e_ext = Ei[j - 1] - gap_extend
            if e_open >= e_ext:
                Ei[j] = e_open
                PE[i, j] = 1
            else:
                Ei[j] = e_ext
            diag = Hp[j - 1] + subrow[j - 1]
            best, ptr = 0, 0
            if diag >= best:
                best, ptr = diag, 1
            if Ei[j] > best:
                best, ptr = Ei[j], 2
            if Fi[j] > best:
                best, ptr = Fi[j], 3
            Hi[j] = best
            PH[i, j] = ptr
    return _gotoh_traceback(a, b, H, PH, PE, PF, m, n)


# initial pad around the ungapped HSP for the stage-2 DP window; the
# window doubles (to _GAP_PAD_MAX) whenever the alignment reaches an
# edge that has sequence beyond it, so the bound never truncates.
_GAP_PAD = 24
_GAP_PAD_MAX = 4096


def gapped_extend(q: str, s: str, qs: int, qe: int, ss: int, se: int,
                  cfg: BlastConfig) -> tuple[int, int, int, int, int,
                                             int, int, int]:
    """BLAST's stage-2: affine-gap local DP on a window around an
    ungapped HSP (the HSP extent padded by _GAP_PAD on each side).

    Unlike BLAST+'s unbounded X-drop gapped extension, the DP is
    windowed — but the window GROWS: whenever the optimal local
    alignment touches a window edge that could still extend (more
    sequence exists beyond it), the pad doubles and the DP reruns, so
    no alignment is truncated by the initial window choice. Geometric
    growth keeps the total cost within ~4x of the final window's DP.
    Returns absolute coordinates in (q, s)."""
    pad = _GAP_PAD
    while True:
        q0, q1 = max(0, qs - pad), min(len(q), qe + 1 + pad)
        s0, s1 = max(0, ss - pad), min(len(s), se + 1 + pad)
        (score, a0, a1, b0, b1, ident, gaps, align_len) = gotoh_local(
            q[q0:q1], s[s0:s1], cfg.task == "blastp", cfg.reward,
            cfg.penalty, cfg.gap_open_eff, cfg.gap_extend_eff)
        touches = ((a0 == 0 and q0 > 0) or (a1 == q1 - q0 - 1 and q1 < len(q))
                   or (b0 == 0 and s0 > 0) or (b1 == s1 - s0 - 1 and s1 < len(s)))
        if not touches or pad >= _GAP_PAD_MAX:
            return (score, q0 + a0, q0 + a1, s0 + b0, s0 + b1,
                    ident, gaps, align_len)
        pad *= 2


def align_query(qid: int, seq: str, index: SubjectIndex,
                cfg: BlastConfig) -> list[tuple]:
    """All HSPs of one query against one indexed partition, both strands."""
    out = []
    k = cfg.word_size
    if k != index.word_size:
        raise ValueError(
            f"config word_size={k} does not match the subject index's "
            f"word_size={index.word_size}; rebuild the index with the "
            f"config's k (stage gen keys on word_size for this reason)")
    qlen = len(seq)
    is_protein = cfg.task == "blastp"
    # hot paths: any hashed-index config — blastp (exact-word AND
    # neighborhood -threshold) and blastn (both strands), one-hit AND
    # two-hit (-window_size) seeding: the per-seed Python loop is
    # replaced by batched 2D extension with identical outputs
    # (test_batched_parity; threshold configs carry per-seed
    # (score, ident) arrays through the batch; two-hit replays the
    # pending-seed scan with a precomputed next-trigger table).
    if index.hashed:
        if is_protein:
            q_ext = fold_case_str(seq) if index.fold_case else seq
            return _align_protein_batched(
                qid, q_ext, index, cfg,
                seq if cfg.lcase_masking else None, qlen)
        cols = _align_nucl_batched_arrays(qid, seq, index, cfg, qlen)
        names = [f.name for f in RAW_HITS.fields]
        return list(zip(*(cols[nm] for nm in names))) \
            if len(cols["qid"]) else []
    return _align_query_sequential(qid, seq, index, cfg)


def _align_query_sequential(qid: int, seq: str, index: SubjectIndex,
                            cfg: BlastConfig) -> list[tuple]:
    """The reference implementation of the seed-and-extend loop: one
    Python iteration per seed — the semantic oracle every batched path
    is pinned against (test_batched_parity). Never the production
    route (production indexes are always hashed); its dict branch runs
    only when tests force ``hashed = False`` with a hand-built
    _str_index for equivalence checks."""
    out = []
    k = cfg.word_size
    qlen = len(seq)
    is_protein = cfg.task == "blastp"
    strands = [(seq, 1)]
    if cfg.task == "blastn":
        strands.append((revcomp(seq), -1))
    fold = index.fold_case
    for q, qstrand in strands:
        q_ext = fold_case_str(q) if fold else q
        if is_protein:
            # encode once; seeds are exact word matches, so a seed's
            # score is a diagonal prefix-sum difference — O(1) per seed
            qo, qi_arr = encode_protein(q_ext)
            q_rowdicts = [_b62_row(c) for c in q_ext]
            pref = np.concatenate(
                ([0], np.cumsum(_B62[qi_arr, qi_arr]))).tolist()
            enc = index.encoded
        lcase = cfg.lcase_masking
        two_hit = int(cfg.window_size or 0)
        # neighborhood seeding (-threshold) is a blastp concept: short
        # protein words seed on near matches scoring >= T; nucleotide
        # seeding is exact-match by definition in BLAST
        nb_threshold = cfg.threshold if is_protein else None
        seen: dict[tuple[int, int], int] = {}   # (si, diag) -> covered qend
        pending: dict[tuple[int, int], int] = {}  # (si, diag) -> last seed qpos
        emitted: set[tuple] = set()   # gapped-alignment dedupe per strand
        hashed = index.hashed
        if hashed and nb_threshold is None:
            qb = index.query_buckets(q_ext)
            ext = index.ext_seqs
        for qpos in range(0, len(q) - k + 1):
            word = q[qpos:qpos + k]
            if lcase and word_is_lowercase_masked(word):
                continue
            if nb_threshold is not None:
                # each candidate carries its own seed score/identity
                # (the neighbor word generally differs from the query
                # word); the query word's own exact hits participate
                # only when its self-score clears T — BLAST semantics
                cand = index.neighborhood_hits(
                    q_ext[qpos:qpos + k], nb_threshold)
            elif hashed:
                bi = qb[qpos]
                if bi < 0:
                    continue
                wkey = q_ext[qpos:qpos + k]
                # exact-word re-verify: the hash routes, the compare
                # decides (collisions can never fabricate a seed)
                hits = [(si, spos) for si, spos in index.bucket_pairs(bi)
                        if ext[si][spos:spos + k] == wkey]
                cand = [(hits, None, None)]
            else:
                hits = index.index.get(
                    fold_case_str(word) if fold else word)
                cand = [(hits, None, None)]
            for hits, nb_score, nb_ident in cand:
                if not hits:
                    continue
                for si, spos in hits:
                    diag = spos - qpos
                    if seen.get((si, diag), -1) >= qpos:
                        continue
                    if two_hit:
                        # two-hit seeding analog (-window_size): extend only
                        # when a second seed lands on the same diagonal
                        # within the window; single seeds stay pending
                        prev = pending.get((si, diag))
                        pending[(si, diag)] = qpos
                        if prev is None or qpos - prev > two_hit:
                            continue
                    if is_protein:
                        so, si_arr = enc[si]
                        score, qs, qe, ss, se, ident = _extend_vec(
                            qo, qi_arr, so, si_arr, qpos, spos, k,
                            (nb_score if nb_score is not None
                             else pref[qpos + k] - pref[qpos]), cfg.xdrop,
                            q=q_ext, s=index.ext_seqs[si], qrows=q_rowdicts,
                            seed_ident=nb_ident)
                    else:
                        score, qs, qe, ss, se, ident = _extend_rp(
                            q_ext, index.ext_seqs[si], qpos, spos, k,
                            cfg.reward, cfg.penalty, cfg.xdrop)
                    seen[(si, diag)] = qe
                    if score < cfg.min_raw_score:
                        continue
                    gaps_n, align_len = 0, qe - qs + 1
                    if cfg.gapped and score >= cfg.gap_trigger_eff:
                        # stage 2 (BLAST's model): affine-gap DP around the
                        # ungapped HSP; several seeds of one homology can
                        # converge to the same gapped alignment — dedupe
                        (gscore, gqs, gqe, gss, gse, gident, gg, galn
                         ) = gapped_extend(q_ext, index.ext_seqs[si],
                                           qs, qe, ss, se, cfg)
                        if gscore < cfg.min_raw_score:
                            continue
                        score, qs, qe, ss, se = gscore, gqs, gqe, gss, gse
                        ident, gaps_n, align_len = gident, gg, galn
                        key = (si, qs, qe, ss, se)
                        if key in emitted:
                            continue
                        emitted.add(key)
                    if qstrand == -1:
                        # map coords back to the forward query orientation
                        qs, qe = qlen - qe - 1, qlen - qs - 1
                    out.append((qid, index.subjects[si][0], score,
                                align_len, ident, gaps_n,
                                qs, qe, ss, se, qstrand, 1, qlen))
    return out


def align_block(items, index: SubjectIndex, cfg: BlastConfig,
                ) -> pd.DataFrame:
    """K2 batch loop over one query block -> RAW_HITS DataFrame.

    For the hashed one-hit hot paths — blastp (exact or neighborhood
    seeding) AND blastn (both strands) — the WHOLE block runs as one
    sentinel-concatenated batch (block-level batching: seed
    collection, coverage rounds and extension batches happen once per
    task, not once per query), and the frame is assembled column-wise;
    no per-hit Python tuple ever exists. The sequential rows fallback
    below is unreachable in production (indexes are always hashed);
    it serves tests that force a dict-backed index."""
    names = [f.name for f in RAW_HITS.fields]
    if index.hashed:
        qitems = [(int(qid), seq) for qid, seq in items]
        if cfg.task == "blastp":
            cols = _align_block_protein_batched(qitems, index, cfg)
        else:
            cols = _align_block_nucl_batched(qitems, index, cfg)
        return pd.DataFrame(cols, columns=names)
    rows: list[tuple] = []
    for qid, seq in items:
        rows.extend(align_query(int(qid), seq, index, cfg))
    return pd.DataFrame(rows, columns=names)


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
                                  cfg.word_size, cfg.max_kmer_hits,
                                  soft_mask=cfg.subject_soft_mask,
                                  complexity=cfg.complexity_filter,
                                  protein=cfg.task == "blastp",
                                  fold_case=cfg.mask_fold_case)
        # K2 batch loop: all queries of the block through align_block
        return align_block(zip(pdf["qid"].to_numpy(),
                               pdf["seq"].to_numpy()), index, cfg)
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


def make_lazy_block_kernel(db_dir: str, cfg: BlastConfig, gen: str,
                           disk_cache: bool = False):
    """Kernel factory for the cogrouped work-item plan: one invocation
    per (query block x db_part) group. The group's ``db_part`` column
    names the staged volume; the subject index is built on first touch
    and reused across blocks of the same partition via the per-worker
    cache (S7 DB-handle reuse, mrblast.cpp:838-845), keyed by ``gen``
    so a restaged database can never hit a stale index. Callers with a
    CONTENT-addressed gen pass disk_cache=True to also persist built
    indexes on scratch disk (the makeblastdb analog — see
    get_subject_index_lazy)."""
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        part = str(pdf["db_part"].iat[0])
        index = get_subject_index_lazy(
            f"{db_dir}:{part}:{gen}",
            lambda: read_staged_part(db_dir, part),
            cfg.word_size, cfg.max_kmer_hits,
            soft_mask=cfg.subject_soft_mask,
            complexity=cfg.complexity_filter,
            protein=cfg.task == "blastp",
            fold_case=cfg.mask_fold_case,
            disk_cache=disk_cache)
        return align_block(zip(pdf["qid"].to_numpy(),
                               pdf["seq"].to_numpy()), index, cfg)
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
