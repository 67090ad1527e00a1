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
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["rell_logliks", "kh_test", "sh_test"]


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
