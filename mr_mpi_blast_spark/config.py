"""Run configuration mirroring mrblast.ini (mrblast.cpp:296-325,
doc/USERGUIDE:275-347).

Kept: the keys that still mean something on Spark. Dropped: engine
tuning Spark owns — MEMSIZE/OUTOFCORE (Tungsten spill), MAPSTYLE
(pull-based task scheduler + AQE), VERBOSITY/TIMER (Spark UI/metrics),
page alignment. NUMITER survives as db-partition batching in the
pipeline driver loop.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BlastConfig:
    # [BLAST] / command line (doc/USERGUIDE:46-66)
    task: str = "blastn"           # blastn | blastp (alphabet + defaults)
    evalue: float = 10.0           # F1 e-value threshold (BLAST default)
    word_size: int = 11            # seed k-mer length (blastn default)
    reward: int = 1                # match score (blastn default)
    penalty: int = -2              # mismatch score
    max_target_seqs: int = 0       # F2 cap on distinct subjects/query (0 = off)

    # [MR-MPI] analogs (doc/USERGUIDE:275-347)
    block_size: int = 100_000      # BLOCKSIZE: target bp per query block
    num_hit_cutoff: int = 0        # NUMHITCUTOFF: top-k per query (0 = all)
    is_classifier: bool = False    # ISCLASSIFIER: add perc_ident/perc_cover

    # kernel internals (builtin aligner)
    xdrop: int = 20                # ungapped extension X-drop
    max_kmer_hits: int = 64        # skip ultra-frequent seeds (dust analog)
    min_score: int = 0             # 0 = derive from word size

    # scoring matrix for protein tasks (doc/USERGUIDE:46-66 -matrix);
    # the builtin kernel implements BLOSUM62, the NCBI kernel forwards
    # any name BLAST+ knows
    matrix: str = "BLOSUM62"

    # statistics (S8): effective db length; None = compute from subjects
    dbsize: int | None = None
    # subject count for the Karlin-Altschul length adjustment; None =
    # compute from subjects (must cover the WHOLE db, like dbsize)
    n_seqs: int | None = None
    # apply the K-A length adjustment (effective m'/n') to e-values;
    # one-shot floor(ln(K*m*n)/H) approximation of NCBI's iteration
    length_adjust: bool = True

    @property
    def min_raw_score(self) -> int:
        return self.min_score if self.min_score > 0 else self.word_size + 4
