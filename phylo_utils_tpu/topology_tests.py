"""Topology significance tests: KH and SH via RELL bootstrap.

Given per-site log-likelihoods for a set of candidate topologies (one
device program via ``TopologySetEngine.sitewise_loglikelihoods``), the
RELL (resampling estimated log-likelihood) bootstrap resamples SITES with
replacement — which is just a resampled weighted sum of the per-site logL
matrix, no re-optimization — and asks whether each tree's deficit to the
best tree is explainable by sampling noise.

- Kishino-Hasegawa (KH): pairwise test of tree i vs the ML tree; valid
  when the two trees were specified a priori.
- Shimodaira-Hasegawa (SH): simultaneous test over the whole candidate
  set with centering, controlling selection bias of picking the ML tree.
- Approximately Unbiased (AU, Shimodaira 2002): multiscale RELL
  bootstrap — BP curves across resample sizes r*n extrapolated through
  psi(r) = d*sqrt(r) + c/sqrt(r), p_AU = 1 - Phi(d - c). Less biased
  than KH, less conservative than SH; the standard tree-set test
  (CONSEL / IQ-TREE report it).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["rell_logliks", "kh_test", "sh_test", "au_test"]


def rell_logliks(
    sitewise: np.ndarray,           # (n_trees, n_sites)
    n_boot: int = 1000,
    seed: int = 0,
) -> np.ndarray:
    """(n_boot, n_trees) total logLs under RELL site resampling."""
    sitewise = np.asarray(sitewise, np.float64)
    n_trees, n_sites = sitewise.shape
    rng = np.random.default_rng(seed)
    counts = rng.multinomial(
        n_sites, np.full(n_sites, 1.0 / n_sites), size=n_boot
    )                                # (n_boot, n_sites)
    return counts @ sitewise.T       # (n_boot, n_trees)


def kh_test(
    sitewise: np.ndarray,
    n_boot: int = 1000,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Kishino-Hasegawa test of each tree against the ML tree.

    Returns {"delta": observed logL deficits, "pvalue": per-tree p-values,
    "best": ML tree index}. The ML tree's p-value is 1 by construction.
    """
    sitewise = np.asarray(sitewise, np.float64)
    totals = sitewise.sum(axis=1)
    best = int(np.argmax(totals))
    delta = totals[best] - totals           # (n_trees,) >= 0
    # bootstrap distribution of the CENTERED pairwise difference
    diff_site = sitewise[best][None, :] - sitewise       # (n_trees, n_sites)
    centered = diff_site - diff_site.mean(axis=1, keepdims=True)
    boot = rell_logliks(centered, n_boot=n_boot, seed=seed)  # (B, n_trees)
    pvals = (boot >= delta[None, :]).mean(axis=0)
    pvals[best] = 1.0
    return {"delta": delta, "pvalue": pvals, "best": best}


def sh_test(
    sitewise: np.ndarray,
    n_boot: int = 1000,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Shimodaira-Hasegawa test over the full candidate set.

    For each bootstrap replicate, every tree's resampled logL is centered
    by its own expectation; the null distribution of each tree's deficit is
    max_j(centered_j) - centered_i. Conservative for all trees
    simultaneously. Returns {"delta", "pvalue", "best"}.
    """
    sitewise = np.asarray(sitewise, np.float64)
    totals = sitewise.sum(axis=1)
    best = int(np.argmax(totals))
    delta = totals[best] - totals
    boot = rell_logliks(sitewise, n_boot=n_boot, seed=seed)  # (B, T)
    centered = boot - boot.mean(axis=0, keepdims=True)
    null_delta = centered.max(axis=1, keepdims=True) - centered  # (B, T)
    pvals = (null_delta >= delta[None, :]).mean(axis=0)
    return {"delta": delta, "pvalue": pvals, "best": best}


_AU_SCALES = (0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.3, 1.4)


def au_test(
    sitewise: np.ndarray,
    n_boot: int = 2000,
    seed: int = 0,
    scales: Sequence[float] = _AU_SCALES,
) -> Dict[str, np.ndarray]:
    """Approximately Unbiased test (Shimodaira 2002, Syst. Biol. 51:492).

    Multiscale RELL bootstrap: at each scale ``r`` the replicate draws
    ``round(r * n_sites)`` sites; ``BP_i(r)`` is the fraction of
    replicates in which tree i has the top resampled logL. The normal
    quantiles ``psi_i(r) = Phi^-1(1 - BP_i(r))`` are regressed (weighted
    least squares, binomial delta-method weights) on the model
    ``psi = d*sqrt(r) + c/sqrt(r)`` — ``d`` estimates the signed distance
    to the selection-region boundary and ``c`` its curvature — giving
    ``p_AU(i) = 1 - Phi(d - c)``.

    Returns {"pvalue", "bp" (BP at r=1), "delta", "best", "d", "c"}.
    Trees whose BP is identically 0 (or 1) at every scale get p = 0
    (or 1) directly — the regression is undefined there.
    """
    from scipy.special import ndtr, ndtri

    sitewise = np.asarray(sitewise, np.float64)
    n_trees, n_sites = sitewise.shape
    totals = sitewise.sum(axis=1)
    best = int(np.argmax(totals))
    delta = totals[best] - totals
    rng = np.random.default_rng(seed)

    bp = np.empty((len(scales), n_trees))
    for si, r in enumerate(scales):
        m = max(1, int(round(r * n_sites)))
        counts = rng.multinomial(
            m, np.full(n_sites, 1.0 / n_sites), size=n_boot
        )
        boot = counts @ sitewise.T               # (B, T)
        winner = np.argmax(boot, axis=1)
        bp[si] = np.bincount(winner, minlength=n_trees) / n_boot

    # clip away exact 0/1 so the quantile transform is finite; track the
    # degenerate rows for the direct-assignment fallback
    lo = 0.5 / n_boot
    all_zero = (bp <= 0).all(axis=0)
    all_one = (bp >= 1).all(axis=0)
    bpc = np.clip(bp, lo, 1.0 - lo)
    psi = ndtri(1.0 - bpc)                       # (S, T)

    rs = np.asarray(scales, np.float64)
    x1 = np.sqrt(rs)                             # (S,)
    x2 = 1.0 / np.sqrt(rs)
    # delta-method WLS weights: var(psi) = BP(1-BP) / (B * phi(psi)^2)
    phi = np.exp(-0.5 * psi ** 2) / np.sqrt(2.0 * np.pi)
    wts = n_boot * phi ** 2 / (bpc * (1.0 - bpc))   # (S, T)

    d = np.empty(n_trees)
    c = np.empty(n_trees)
    pvals = np.empty(n_trees)
    for i in range(n_trees):
        if all_zero[i]:
            d[i], c[i], pvals[i] = np.inf, 0.0, 0.0
            continue
        if all_one[i]:
            d[i], c[i], pvals[i] = -np.inf, 0.0, 1.0
            continue
        w = wts[:, i]
        a11 = np.sum(w * x1 * x1)
        a12 = np.sum(w * x1 * x2)
        a22 = np.sum(w * x2 * x2)
        b1 = np.sum(w * x1 * psi[:, i])
        b2 = np.sum(w * x2 * psi[:, i])
        det = a11 * a22 - a12 * a12
        d[i] = (a22 * b1 - a12 * b2) / det
        c[i] = (a11 * b2 - a12 * b1) / det
        pvals[i] = 1.0 - ndtr(d[i] - c[i])
    r1 = int(np.argmin(np.abs(rs - 1.0)))
    return {
        "pvalue": pvals, "bp": bp[r1], "delta": delta, "best": best,
        "d": d, "c": c,
    }
