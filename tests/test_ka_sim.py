"""Island-method gapped KA estimator vs published constants.

Validation ladder: (1) the vectorized DP matches a scalar reference
island-for-island; (2) UNGAPPED island statistics reproduce the exact
analytic solution (kernel/ka.py); (3) GAPPED island statistics
reproduce two independent published simulation rows — blastn defaults
+2/-3 (5,2) and BLOSUM62 (11,1); (4) the round-5 mislabel finding is
pinned: +1/-2 under (5,2) costs is statistically ungapped.

All runs are seeded (deterministic); tolerances cover the observed
seed-to-seed spread with >=1.5x margin at the test budgets.
"""

import numpy as np
import pytest

from mr_mpi_blast_spark.config import BlastConfig
from mr_mpi_blast_spark.kernel.builtin import KA_GAPPED_NUCL, scoring_params
from mr_mpi_blast_spark.kernel.ka import ka_ungapped_nucl
from mr_mpi_blast_spark.kernel.ka_sim import (estimate_ka_blosum62,
                                              estimate_ka_nucl,
                                              sw_islands_batch)


def _sw_islands_scalar(x, y, sub, open_, ext):
    """Reference implementation: cell-by-cell affine-gap SW with
    island origin tracking. Returns {origin_id: peak}."""
    m, n = len(x), len(y)
    NEG = -(1 << 40)
    H = np.zeros((m + 1, n + 1), dtype=np.int64)
    E = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    Fv = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    oH = np.full((m + 1, n + 1), -1, dtype=np.int64)
    oE = np.full((m + 1, n + 1), -1, dtype=np.int64)
    oF = np.full((m + 1, n + 1), -1, dtype=np.int64)
    peaks = {}
    gapped = open_ is not None
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if gapped:
                eo, ee = H[i, j - 1] - open_ - ext, E[i, j - 1] - ext
                E[i, j], oE[i, j] = ((eo, oH[i, j - 1]) if eo >= ee
                                     else (ee, oE[i, j - 1]))
                fo, fe = H[i - 1, j] - open_ - ext, Fv[i - 1, j] - ext
                Fv[i, j], oF[i, j] = ((fo, oH[i - 1, j]) if fo >= fe
                                      else (fe, oF[i - 1, j]))
            diag = H[i - 1, j - 1] + sub[x[i - 1], y[j - 1]]
            ob = (oH[i - 1, j - 1] if H[i - 1, j - 1] > 0
                  else i * (n + 1) + j)
            best = diag
            if gapped and E[i, j] > best:
                best, ob = E[i, j], oE[i, j]
            if gapped and Fv[i, j] > best:
                best, ob = Fv[i, j], oF[i, j]
            if best <= 0:
                H[i, j], oH[i, j] = 0, -1
            else:
                H[i, j], oH[i, j] = best, ob
                if best > peaks.get(ob, 0):
                    peaks[ob] = best
    return peaks


@pytest.mark.parametrize("open_,ext", [(None, None), (5, 2), (2, 1)])
def test_vectorized_matches_scalar(open_, ext):
    rng = np.random.default_rng(3)
    sub = np.full((4, 4), -2, dtype=np.int64)
    np.fill_diagonal(sub, 1)
    for _ in range(4):
        m, n = rng.integers(8, 30, 2)
        X = rng.integers(0, 4, (3, m))
        Y = rng.integers(0, 4, (3, n))
        peaks, _, pidx = sw_islands_batch(X, Y, sub, open_, ext, 1)
        got = {}
        for pk, b in zip(peaks, pidx):
            got.setdefault(int(b), []).append(int(pk))
        for b in range(3):
            ref = sorted(_sw_islands_scalar(X[b], Y[b], sub,
                                            open_, ext).values())
            assert sorted(got.get(b, [])) == ref


def test_ungapped_islands_match_analytic_solution():
    """Strongest self-check: the ungapped limit is exactly solvable
    (kernel/ka.py), so island statistics must land on it."""
    lam_a, k_a, h_a = ka_ungapped_nucl(1, -2)
    e = estimate_ka_nucl(1, -2, n_batches=10, seed=11)
    assert e.lam == pytest.approx(lam_a, rel=0.03)
    assert e.k == pytest.approx(k_a, rel=0.15)
    assert e.h == pytest.approx(h_a, rel=0.08)
    assert e.n_islands > 5000


def test_gapped_reproduces_published_blastn_defaults():
    """+2/-3 with gaps (5,2) — NCBI blastn task defaults: blast_stat.c
    blastn_values_2_3 row (0.625, 0.41, 0.78)."""
    e = estimate_ka_nucl(2, -3, 5, 2, n_batches=15, seed=11)
    assert e.lam == pytest.approx(0.625, rel=0.05)
    assert 0.2 < e.k < 0.7         # K error ~ exp(t * lambda-error)
    assert e.h == pytest.approx(0.78, rel=0.15)
    # and the builtin table carries exactly this published row
    assert KA_GAPPED_NUCL[(2, -3, 5, 2)] == (0.625, 0.41, 0.78)


@pytest.mark.slow
def test_gapped_reproduces_published_blosum62_11_1():
    """BLOSUM62 (11,1): published (0.267, 0.041, 0.14). H converges
    slowly at L=512 (long-alignment asymptote) — tolerances documented
    in the module header."""
    e = estimate_ka_blosum62(11, 1, n_batches=15, seed=11)
    assert e.lam == pytest.approx(0.267, rel=0.09)
    assert 0.02 < e.k < 0.09
    assert 0.10 < e.h < 0.25


@pytest.mark.slow
def test_plus1_minus2_with_5_2_gaps_is_statistically_ungapped():
    """The round-5 mislabel finding: under +1/-2 a single gap costs 7
    while a mismatch costs 2 — gaps essentially never participate, so
    the gapped statistics coincide with the ungapped solution and the
    old (0.625, ...) row (which belongs to +2/-3) was off by 2x."""
    e = estimate_ka_nucl(1, -2, 5, 2, n_batches=10, seed=11)
    lam_a = ka_ungapped_nucl(1, -2)[0]
    assert e.lam == pytest.approx(lam_a, rel=0.03)
    assert e.lam > 2 * 0.625


def test_scoring_params_full_scheme_key():
    # blastn defaults reward=1/penalty=-2: gapped stats for that
    # scheme are NOT published -> loud failure, estimator suggested
    with pytest.raises(ValueError, match="ka_sim"):
        scoring_params(BlastConfig(task="blastn", gapped=True))
    # the published +2/-3 (5,2) row resolves by full scheme key
    got = scoring_params(BlastConfig(task="blastn", reward=2,
                                     penalty=-3, gapped=True))
    assert got == (0.625, 0.41, 0.78)
    # explicit override still wins
    row = (1.30, 0.5, 0.9)
    got = scoring_params(BlastConfig(task="blastn", gapped=True,
                                     ka_gapped=row))
    assert got == row


def test_estimate_triple_roundtrip():
    """KAEstimate.triple feeds straight into BlastConfig(ka_gapped=...)
    and the pipeline accepts it."""
    e = estimate_ka_nucl(1, -2, 5, 2, n_batches=4, seed=11)
    cfg = BlastConfig(task="blastn", gapped=True, ka_gapped=e.triple)
    assert scoring_params(cfg) == e.triple


@pytest.mark.slow
def test_gapped_reproduces_published_blosum62_10_2():
    """Third independent published gapped row — BLOSUM62 (10,2) =
    (0.291, 0.075, 0.23): the estimator generalizes across gap-cost
    pairs, not just the two rows it was tuned against."""
    e = estimate_ka_blosum62(10, 2, n_batches=15, seed=11)
    assert e.lam == pytest.approx(0.291, rel=0.06)
    assert e.k == pytest.approx(0.075, rel=0.35)
    assert e.h == pytest.approx(0.23, rel=0.35)
