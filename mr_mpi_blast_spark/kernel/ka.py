"""Analytic Karlin-Altschul parameter solver (ungapped statistics).

Karlin & Altschul 1990 (PNAS 87:2264-2268) give the exact ungapped
statistics for any integer scoring scheme with negative expected
score and a positive maximum score:

- ``lambda`` is the unique positive root of
  ``sum_s P(s) * exp(lambda * s) = 1`` where ``P`` is the score
  distribution of one aligned letter pair under the background
  composition;
- ``H`` (relative entropy, nats/pair) is
  ``lambda * sum_s P(s) * exp(lambda * s) * s``;
- ``K`` is the renewal-theoretic constant
  ``K = d * lambda * exp(-2*sigma) / (H * (1 - exp(-lambda * d)))``
  with ``d`` the lattice span (gcd of the score support) and
  ``sigma = sum_{k>=1} (1/k) * [ P(S_k >= 0)
                                 + E(exp(lambda*S_k); S_k < 0) ]``
  over the k-step random-walk sums ``S_k`` — the same series NCBI's
  ``blast_stat.c`` evaluates in ``BlastKarlinLHtoK``.

This removes the fixed-table restriction for UNGAPPED statistics:
the reference forwards arbitrary ``-reward/-penalty`` to NCBI BLAST
(doc/USERGUIDE:47-50), whose blast_stat.c computes exactly these
quantities; previously this engine silently reused the +1/-2
constants for any blastn reward/penalty. Gapped statistics have no
analytic form (NCBI ships simulation-derived tables) and stay
table-driven with the explicit ``BlastConfig(ka_gapped=...)``
escape hatch.

Validation (tests/test_ka_solver.py): the solver reproduces, from
first principles, every published ungapped row this repo carries —
blastn +1/-2 -> (1.33, 0.621, 1.12) and BLOSUM62 with
Robinson & Robinson 1991 background frequencies ->
(0.3176, 0.134, 0.4012) — to 4 significant digits, plus the exact
closed forms lambda = ln 3 and K = (a-b)^2/a for the +1/-1 lattice.
"""

from __future__ import annotations

from functools import lru_cache
from math import exp, gcd

import numpy as np

__all__ = [
    "ROBINSON_FREQS",
    "solve_lambda",
    "entropy_h",
    "karlin_k",
    "ka_ungapped",
    "ka_ungapped_nucl",
    "ka_ungapped_blosum62",
]

# Robinson & Robinson 1991 (PNAS 88:8880-8884) amino-acid background
# frequencies, the standard composition NCBI's blast_stat.c uses for
# protein Karlin-Altschul statistics (Blast_ResFreqStdComp).
ROBINSON_FREQS: dict[str, float] = {
    "A": 0.07805, "R": 0.05129, "N": 0.04487, "D": 0.05364,
    "C": 0.01925, "Q": 0.04264, "E": 0.06295, "G": 0.07377,
    "H": 0.02199, "I": 0.05142, "L": 0.09019, "K": 0.05744,
    "M": 0.02243, "F": 0.03856, "P": 0.05203, "S": 0.07120,
    "T": 0.05841, "W": 0.01330, "Y": 0.03216, "V": 0.06441,
}


def _validate_pmf(pmf: dict[int, float]) -> None:
    if not pmf:
        raise ValueError("empty score distribution")
    total = sum(pmf.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"score probabilities sum to {total}, not 1")
    mean = sum(s * p for s, p in pmf.items())
    if mean >= 0:
        raise ValueError(
            f"expected score {mean:+.4f} must be negative for local "
            f"alignment statistics to exist (Karlin-Altschul 1990)")
    if max(s for s, p in pmf.items() if p > 0) <= 0:
        raise ValueError("a positive score must be achievable")


def solve_lambda(pmf: dict[int, float]) -> float:
    """Unique positive root of sum_s P(s) exp(lambda s) = 1 (bisection).

    The function is 0 at lambda=0 with negative derivative (negative
    drift) and convex, diverging as lambda grows — exactly one
    positive root.
    """
    _validate_pmf(pmf)
    scores = np.array(sorted(pmf), dtype=float)
    probs = np.array([pmf[int(s)] for s in scores], dtype=float)

    def f(lam: float) -> float:
        return float(np.sum(probs * np.exp(lam * scores)) - 1.0)

    hi = 0.5
    while f(hi) < 0:
        hi *= 2.0
        if hi > 1e4:  # pragma: no cover - malformed scheme guard
            raise ValueError("lambda root not bracketed")
    lo = 0.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) < 0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def entropy_h(pmf: dict[int, float], lam: float) -> float:
    """Relative entropy H (nats/pair): lambda * E_q[s] over the tilted
    distribution q(s) = P(s) exp(lambda s)."""
    return lam * sum(p * exp(lam * s) * s for s, p in pmf.items())


def karlin_k(pmf: dict[int, float], lam: float, h: float,
             tol: float = 1e-12, kmax: int = 5000) -> float:
    """Renewal constant K via the Karlin-Altschul series.

    sigma's k-th term is P(S_k >= 0) + E(exp(lambda S_k); S_k < 0);
    both pieces vanish geometrically (the walk drifts negative under
    P and positive under the tilted measure), so the series is summed
    by direct k-fold convolution of the score pmf until the term
    underflows ``tol`` — the same truncation strategy as
    blast_stat.c's BlastKarlinLHtoK, with a tighter tolerance.
    """
    d = 0
    for s, p in pmf.items():
        if p > 0 and s != 0:
            d = gcd(d, abs(s))
    low = min(pmf)
    high = max(pmf)
    base = np.zeros(high - low + 1, dtype=float)
    for s, p in pmf.items():
        base[s - low] = p
    cur = base.copy()
    cur_low = low
    sigma = 0.0
    for k in range(1, kmax + 1):
        if k > 1:
            cur = np.convolve(cur, base)
            cur_low += low
        idx = np.arange(cur_low, cur_low + len(cur), dtype=float)
        neg = idx < 0
        term = float(cur[~neg].sum()
                     + np.sum(cur[neg] * np.exp(lam * idx[neg])))
        sigma += term / k
        if term < tol:
            break
    return d * lam * exp(-2.0 * sigma) / (h * (1.0 - exp(-lam * d)))


def ka_ungapped(pmf: dict[int, float]) -> tuple[float, float, float]:
    """(lambda, K, H) for an arbitrary integer score distribution."""
    lam = solve_lambda(pmf)
    h = entropy_h(pmf, lam)
    return lam, karlin_k(pmf, lam, h), h


@lru_cache(maxsize=64)
def ka_ungapped_nucl(reward: int, penalty: int) -> tuple[float, float, float]:
    """Ungapped (lambda, K, H) for a blastn match/mismatch scheme under
    uniform base composition (P(match)=1/4, P(mismatch)=3/4) — the
    composition NCBI's blastn tables assume."""
    if reward <= 0 or penalty >= 0:
        raise ValueError(
            f"blastn scoring needs reward>0 and penalty<0, got "
            f"reward={reward} penalty={penalty}")
    return ka_ungapped({reward: 0.25, penalty: 0.75})


@lru_cache(maxsize=1)
def ka_ungapped_blosum62() -> tuple[float, float, float]:
    """Ungapped (lambda, K, H) for BLOSUM62 under Robinson-Robinson
    composition; reproduces the published (0.3176, 0.134, 0.4012)."""
    from mr_mpi_blast_spark.kernel.builtin import _B62_ALPHA, _B62_ROWS
    pmf: dict[int, float] = {}
    for i, a in enumerate(_B62_ALPHA):
        fa = ROBINSON_FREQS.get(a)
        if fa is None:
            continue
        for j, b in enumerate(_B62_ALPHA):
            fb = ROBINSON_FREQS.get(b)
            if fb is None:
                continue
            s = _B62_ROWS[i][j]
            pmf[s] = pmf.get(s, 0.0) + fa * fb
    return ka_ungapped(pmf)
