"""Analytic Karlin-Altschul solver vs the published constants.

The strongest possible validation available hermetically: the solver
must reproduce, from first principles, every published ungapped row
the repo already carries — and the exact closed forms where they
exist. A solver that nails lambda=ln 3 exactly, the +1/-2 triple to
3 digits AND the BLOSUM62/Robinson-Robinson triple to 3 digits is
computing the right thing, because those are three independent
scoring systems with no shared structure.
"""

import math

import pytest

from mr_mpi_blast_spark.config import BlastConfig
from mr_mpi_blast_spark.kernel import builtin
from mr_mpi_blast_spark.kernel.ka import (ROBINSON_FREQS, entropy_h,
                                          ka_ungapped, ka_ungapped_blosum62,
                                          ka_ungapped_nucl, karlin_k,
                                          solve_lambda)


def test_lambda_closed_form_plus1_minus1():
    # (1/4)e^l + (3/4)e^-l = 1  =>  e^l = 3 exactly
    lam = solve_lambda({1: 0.25, -1: 0.75})
    assert lam == pytest.approx(math.log(3.0), abs=1e-9)


def test_lambda_closed_form_plus1_minus2():
    # (1/4)x + (3/4)x^-2 = 1 => x^3 - 4x^2 + 3 = 0 => x = (3+sqrt(21))/2
    lam = solve_lambda({1: 0.25, -2: 0.75})
    assert lam == pytest.approx(math.log((3 + math.sqrt(21)) / 2), abs=1e-9)


def test_k_closed_form_pm1_lattice():
    # For scores {-1,+1} K has the closed form (a-b)^2/a
    # (blast_stat.c BlastKarlinLHtoK low==-1 && high==1 branch).
    for b in (0.10, 0.25, 0.40):
        a = 1.0 - b
        pmf = {1: b, -1: a}
        lam = solve_lambda(pmf)
        h = entropy_h(pmf, lam)
        assert karlin_k(pmf, lam, h) == pytest.approx((a - b) ** 2 / a,
                                                      rel=1e-6)


def test_reproduces_published_nucl_1_2():
    lam, k, h = ka_ungapped_nucl(1, -2)
    pl, pk, ph = builtin.KA_NUCL_1_2  # (1.33, 0.621, 1.12) published
    assert lam == pytest.approx(pl, rel=3e-3)
    assert k == pytest.approx(pk, rel=3e-3)
    assert h == pytest.approx(ph, rel=5e-3)


def test_reproduces_published_blosum62():
    lam, k, h = ka_ungapped_blosum62()
    pl, pk, ph = builtin.KA_BLOSUM62  # (0.3176, 0.134, 0.4012) published
    assert lam == pytest.approx(pl, rel=1e-3)
    assert k == pytest.approx(pk, rel=3e-3)
    assert h == pytest.approx(ph, rel=1e-3)


def test_robinson_frequencies_normalized():
    assert sum(ROBINSON_FREQS.values()) == pytest.approx(1.0, abs=1e-9)
    assert len(ROBINSON_FREQS) == 20


def test_scoring_params_uses_solver_for_nondefault_blastn():
    # Previously ungapped blastn with custom reward/penalty silently
    # reused the +1/-2 constants; now it gets the exact solution.
    cfg = BlastConfig(task="blastn", reward=2, penalty=-3, gapped=False)
    lam, k, h = builtin.scoring_params(cfg)
    ref = ka_ungapped({2: 0.25, -3: 0.75})
    assert (lam, k, h) == ref
    # and it is NOT the +1/-2 row
    assert lam != pytest.approx(builtin.KA_NUCL_1_2[0], rel=1e-3)
    # default costs keep the pinned published row verbatim
    assert builtin.scoring_params(
        BlastConfig(task="blastn", gapped=False)) == builtin.KA_NUCL_1_2


def test_lattice_span_d_respected():
    # +2/-4 lives on the even lattice (d=2); statistics must match the
    # +1/-2 system rescaled: lambda halves exactly, H halves, K equal.
    lam1, k1, h1 = ka_ungapped({1: 0.25, -2: 0.75})
    lam2, k2, h2 = ka_ungapped({2: 0.25, -4: 0.75})
    assert lam2 == pytest.approx(lam1 / 2, rel=1e-9)
    assert h2 == pytest.approx(h1, rel=1e-6)  # H = lam*E_q[s]: both scale
    assert k2 == pytest.approx(k1, rel=1e-6)


def test_rejects_nonnegative_drift():
    with pytest.raises(ValueError):
        ka_ungapped({1: 0.75, -2: 0.25})  # positive expected score
    with pytest.raises(ValueError):
        ka_ungapped_nucl(1, 2)  # nonsense penalty sign
