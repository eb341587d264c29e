"""Island-method estimator for GAPPED Karlin-Altschul parameters.

Gapped local-alignment statistics have no analytic solution; NCBI's
own gapped (lambda, K, H) tables in blast_stat.c are simulation
estimates. This module implements the same published method — island
statistics (Altschul, Bundschuh, Olsen & Hwa, Nucleic Acids Res 29
(2001) 351-361; Olsen, Bundschuh & Hwa 1999) — so a user running
gapped costs this repo's tables lack can CALIBRATE a row themselves
and pass it via ``BlastConfig(ka_gapped=...)`` instead of hitting the
loud unsupported-costs error (kernel/builtin.py:scoring_params).

Method: Smith-Waterman with affine gaps over seeded random sequence
pairs drawn from the background composition. Every positive-H cell
belongs to the "island" of its traceback origin; island peak scores
are asymptotically geometric, P(peak >= t+j) ~ exp(-lambda j), and
the expected number of islands with peak >= t in an m x n comparison
is K * m * n * exp(-lambda t) — islands ARE the HSPs the E-value
formula counts. Estimators:

- lambda: weighted linear regression of ln c(t) on t over the
  collected range (c(t) = islands with peak >= t). Integrating the
  decay over a span beats the single-threshold mean-excess MLE on
  pre-asymptotic corrections and score-lattice parity wiggle.
- K: c(t) * exp(lambda*t) / total_area, geometric-mean-averaged over
  the same t range.
- H: from E[alignment extent | peak = s] ~ lambda*s/H + const —
  extent-vs-score slope, fitted WITHIN residue classes of
  s mod period (period = the match reward for match/mismatch
  scoring: odd scores need a mismatch/gap, so extent zigzags with
  score parity and a naive fit is biased).

Everything is deterministic under a fixed seed: fixed batch count,
fixed pair lengths, numpy Generator — rerunning reproduces the same
triple exactly.

Validation ladder (tests/test_ka_sim.py):
1. the vectorized anti-diagonal DP matches a scalar reference
   implementation island-for-island (including affine-gap cases);
2. UNGAPPED islands reproduce the exact analytic solution
   (kernel/ka.py) for +1/-2 — lambda/K/H within a few percent at the
   default budget;
3. GAPPED islands reproduce the published blastn-default row
   (+2/-3, gaps (5,2)) = (0.625, 0.41, 0.78) and the BLOSUM62 (11,1)
   row = (0.267, 0.041, 0.14) within the documented tolerances.

Accuracy contract at the default budget (~30s of numpy): lambda to
~2-5%, K to ~25% (K error is dominated by lambda's via exp(lambda*t)),
H to ~10% for nucleotide schemes and ~40% for BLOSUM62 gapped (its
alignment-length asymptote converges slowly at L=512; note H only
enters e-values through the log-scale length adjustment, so +-40% on
H moves e-values by well under 2x). For sharper rows, raise
``n_batches``/``L`` — error shrinks with sqrt(sample).

This estimator is a calibration TOOL with documented tolerances, not
a silent fallback: scoring_params still refuses unknown gapped costs
so e-value precision is always a deliberate user decision.

Round-5 finding recorded here: this estimator showed the repo's
former "+1/-2 (5,2)" gapped row (0.625, 0.275, 0.85) was mislabeled —
+1/-2 under (5,2) costs behaves nearly ungapped (lambda ~= 1.33;
a single gap costs 7 while a mismatch costs 2, so gaps almost never
participate), while +2/-3 under (5,2) reproduces lambda 0.625 exactly
and K ~= 0.40 — i.e. the row was blast_stat.c's blastn_values_2_3
entry {5, 2, 0.625, 0.41, 0.78} (the actual NCBI blastn task
defaults), with K mis-remembered as 0.275. builtin.KA_GAPPED_NUCL now
keys gapped nucleotide rows on (reward, penalty, open, extend).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["sw_islands_batch", "KAEstimate", "estimate_gapped_ka",
           "estimate_ka_nucl", "estimate_ka_blosum62"]


def sw_islands_batch(X: np.ndarray, Y: np.ndarray, sub: np.ndarray,
                     gap_open: int | None, gap_extend: int | None,
                     t_collect: int,
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched affine-gap Smith-Waterman island scan.

    X: (B, m), Y: (B, n) alphabet-index arrays; ``sub`` the integer
    substitution matrix. A gap of length g costs gap_open +
    g*gap_extend (the BLAST convention); gap_open=None runs ungapped.
    Anti-diagonal sweep, fully vectorized over (batch x diagonal);
    each positive cell carries its island origin id, and cells with
    H >= t_collect are collected and reduced to per-island
    (peak, extent_at_peak, pair) triples. Extent is the mean of the
    two sequence spans ((di + dj)/2 + 1) — the per-sequence length
    the length-adjustment formula subtracts.
    """
    B, m = X.shape
    _, n = Y.shape
    NEG = np.int64(-1) << np.int64(40)
    gapped = gap_open is not None
    W = m + 1
    H1 = np.zeros((B, W), dtype=np.int64)
    H2 = np.zeros((B, W), dtype=np.int64)
    O1 = np.full((B, W), -1, dtype=np.int64)
    O2 = np.full((B, W), -1, dtype=np.int64)
    E1 = np.full((B, W), NEG, dtype=np.int64)
    OE1 = np.full((B, W), -1, dtype=np.int64)
    F1 = np.full((B, W), NEG, dtype=np.int64)
    OF1 = np.full((B, W), -1, dtype=np.int64)
    P, O, Hs, Ex = [], [], [], []
    for k in range(2, m + n + 1):
        ilo = max(1, k - n)
        ihi = min(m, k - 1)
        if ilo > ihi:
            continue
        ii = np.arange(ilo, ihi + 1)
        jj = k - ii
        s = sub[X[:, ii - 1], Y[:, jj - 1]]
        Hd = H2[:, ii - 1]
        Od = O2[:, ii - 1]
        fresh = ii * (n + 1) + jj        # origin id when starting here
        diag = Hd + s
        odiag = np.where(Hd > 0, Od, fresh[None, :])
        if gapped:
            # E: gap consuming y, predecessor (i, j-1) on diag k-1 at i
            e_open = H1[:, ii] - gap_open - gap_extend
            e_ext = E1[:, ii] - gap_extend
            E = np.maximum(e_open, e_ext)
            OE = np.where(e_open >= e_ext, O1[:, ii], OE1[:, ii])
            # F: gap consuming x, predecessor (i-1, j) on diag k-1 at i-1
            f_open = H1[:, ii - 1] - gap_open - gap_extend
            f_ext = F1[:, ii - 1] - gap_extend
            Fv = np.maximum(f_open, f_ext)
            OF = np.where(f_open >= f_ext, O1[:, ii - 1], OF1[:, ii - 1])
            best = np.maximum(diag, np.maximum(E, Fv))
            # deterministic predecessor priority: diagonal, then E, then F
            ob = np.where(diag >= best, odiag, np.where(E >= best, OE, OF))
        else:
            best, ob = diag, odiag
        pos = best > 0
        Hk = np.where(pos, best, 0)
        Ok = np.where(pos, ob, -1)
        H2, O2 = H1, O1
        H1 = np.zeros((B, W), dtype=np.int64)
        O1 = np.full((B, W), -1, dtype=np.int64)
        H1[:, ii] = Hk
        O1[:, ii] = Ok
        if gapped:
            E1n = np.full((B, W), NEG, dtype=np.int64)
            OE1n = np.full((B, W), -1, dtype=np.int64)
            F1n = np.full((B, W), NEG, dtype=np.int64)
            OF1n = np.full((B, W), -1, dtype=np.int64)
            E1n[:, ii] = E
            OE1n[:, ii] = OE
            F1n[:, ii] = Fv
            OF1n[:, ii] = OF
            E1, OE1, F1, OF1 = E1n, OE1n, F1n, OF1n
        hit = Hk >= t_collect
        if hit.any():
            b_idx, c_idx = np.nonzero(hit)
            o = Ok[b_idx, c_idx]
            i_cell = ii[c_idx]
            j_cell = k - i_cell
            extent = ((i_cell - o // (n + 1))
                      + (j_cell - o % (n + 1))) / 2.0 + 1.0
            P.append(b_idx)
            O.append(o)
            Hs.append(Hk[b_idx, c_idx])
            Ex.append(extent)
    if not P:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.float64), z
    p = np.concatenate(P)
    o = np.concatenate(O)
    h = np.concatenate(Hs)
    e = np.concatenate(Ex)
    # reduce to island peaks: first row per (pair, origin) after
    # sorting by (key, -score) — carries the extent at the peak cell
    key = p * np.int64((m + 1) * (n + 2)) + o
    order = np.lexsort((-h, key))
    key_s = key[order]
    first = np.ones(len(key_s), dtype=bool)
    first[1:] = key_s[1:] != key_s[:-1]
    sel = order[first]
    return h[sel], e[sel], p[sel]


@dataclass(frozen=True)
class KAEstimate:
    """An estimated Karlin-Altschul row with its evidence."""
    lam: float
    k: float
    h: float | None
    n_islands: int          # islands at the collection threshold
    t_collect: int
    area: float             # summed (m*n) over all simulated pairs

    @property
    def triple(self) -> tuple[float, float, float]:
        """(lambda, K, H) ready for BlastConfig(ka_gapped=...)."""
        if self.h is None:
            raise ValueError(
                "H could not be estimated (too few island score "
                "levels); raise n_batches or supply H explicitly")
        return (self.lam, self.k, self.h)


def _fit(peaks: np.ndarray, extents: np.ndarray, area: float,
         t_collect: int, period: int) -> KAEstimate:
    peaks = peaks.astype(np.int64)
    # lambda: WLS of ln c(t) on t where c(t) = #islands >= t. The
    # t grid steps by ``period``: on a reward-r match/mismatch lattice
    # odd-vs-even thresholds alternate systematically (odd scores need
    # a mismatch/gap), and a grid that mixes parities folds that
    # zigzag into the slope.
    step = max(1, period)
    ts, counts = [], []
    t = t_collect
    while True:
        c = int((peaks >= t).sum())
        if c < 100:
            break
        ts.append(t)
        counts.append(c)
        t += step
    if len(ts) < 3:
        raise ValueError(
            f"only {len(ts)} usable thresholds above t={t_collect} "
            f"({len(peaks)} islands) — raise n_batches/L or lower "
            f"t_collect")
    ts_a = np.array(ts, dtype=np.float64)
    c_a = np.array(counts, dtype=np.float64)
    w = np.sqrt(c_a)
    lam = -float(np.polyfit(ts_a, np.log(c_a), 1, w=w)[0])
    # K: geometric mean of c(t) e^{lam t} / area over the fitted range
    k = float(np.exp(np.average(np.log(c_a) + lam * ts_a, weights=w))
              / area)
    # H: extent-vs-score slope within residue classes mod period
    slopes, weights = [], []
    for cls in range(max(1, period)):
        xs, ys, ws = [], [], []
        for u in np.unique(peaks):
            if int(u) % max(1, period) != cls:
                continue
            sel = peaks == u
            if sel.sum() >= 100:
                xs.append(float(u))
                ys.append(float(extents[sel].mean()))
                ws.append(int(sel.sum()))
        if len(xs) >= 3:
            slopes.append(float(np.polyfit(
                np.array(xs), np.array(ys), 1,
                w=np.sqrt(np.array(ws, dtype=np.float64)))[0]))
            weights.append(sum(ws))
    h = (lam / float(np.average(slopes, weights=weights))
         if slopes else None)
    return KAEstimate(lam=lam, k=k, h=h, n_islands=len(peaks),
                      t_collect=t_collect, area=area)


def estimate_gapped_ka(sub: np.ndarray, probs: np.ndarray,
                       gap_open: int | None, gap_extend: int | None,
                       t_collect: int, *, period: int = 1,
                       length: int = 512, batch: int = 32,
                       n_batches: int = 30, seed: int = 11,
                       ) -> KAEstimate:
    """Estimate (lambda, K, H) for ``sub`` under background ``probs``
    with affine costs open + g*extend (None = ungapped). t_collect
    sets the island threshold: small enough for tens of thousands of
    islands, large enough to be past the pre-asymptotic regime —
    ~8/lambda_ungapped is a good start (the analytic kernel/ka.py
    solver gives lambda_ungapped exactly)."""
    rng = np.random.default_rng(seed)
    n_sym = len(probs)
    pk, ex = [], []
    for _ in range(n_batches):
        X = rng.choice(n_sym, size=(batch, length), p=probs)
        Y = rng.choice(n_sym, size=(batch, length), p=probs)
        peaks, extents, _ = sw_islands_batch(
            X, Y, sub, gap_open, gap_extend, t_collect)
        pk.append(peaks)
        ex.append(extents)
    return _fit(np.concatenate(pk), np.concatenate(ex),
                float(n_batches) * batch * length * length,
                t_collect, period)


def estimate_ka_nucl(reward: int, penalty: int,
                     gap_open: int | None = None,
                     gap_extend: int | None = None,
                     t_collect: int | None = None,
                     **kw) -> KAEstimate:
    """Nucleotide match/mismatch scheme under uniform base
    composition (the assumption NCBI's blastn tables use)."""
    from mr_mpi_blast_spark.kernel.ka import ka_ungapped_nucl
    sub = np.full((4, 4), penalty, dtype=np.int64)
    np.fill_diagonal(sub, reward)
    if t_collect is None:
        lam_u = ka_ungapped_nucl(reward, penalty)[0]
        t_collect = max(6, round(8.0 / lam_u))
    return estimate_gapped_ka(sub, np.full(4, 0.25), gap_open,
                              gap_extend, t_collect,
                              period=reward, **kw)


def estimate_ka_blosum62(gap_open: int | None = None,
                         gap_extend: int | None = None,
                         t_collect: int = 20, **kw) -> KAEstimate:
    """BLOSUM62 under Robinson-Robinson composition — the scheme the
    published blosum62_values gapped tables describe."""
    from mr_mpi_blast_spark.kernel.builtin import _B62_ALPHA, _B62_ROWS
    from mr_mpi_blast_spark.kernel.ka import ROBINSON_FREQS
    aas = [a for a in _B62_ALPHA if a in ROBINSON_FREQS]
    idx = [_B62_ALPHA.index(a) for a in aas]
    sub = np.array(_B62_ROWS, dtype=np.int64)[np.ix_(idx, idx)]
    probs = np.array([ROBINSON_FREQS[a] for a in aas])
    probs = probs / probs.sum()
    return estimate_gapped_ka(sub, probs, gap_open, gap_extend,
                              t_collect, period=1, **kw)
