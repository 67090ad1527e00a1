"""Model selection: fit a family of models and rank by AIC/AICc/BIC.

Standard companion workflow (jModelTest/ModelFinder-style, scoped to the
models this framework ships). Each candidate is fitted by ``optimize.fit``
(exact gradients through the pruning pass); parameter counts follow the
usual conventions (branch lengths + free model parameters + mixture
parameters).
"""
from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from phylo_utils_tpu import models as _models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.optimize import fit

__all__ = ["count_free_parameters", "compare_models", "ModelFit",
           "likelihood_ratio_test"]


_MODEL_K = {
    # free model parameters (exchangeabilities/freqs conventions)
    "JC69": 0,
    "K80": 1,            # kappa
    "F81": 3,            # freqs (simplex)
    "F84": 4,            # kappa + freqs
    "HKY85": 4,          # kappa + freqs
    "TN93": 5,           # alpha1, alpha2 (beta fixed by scaling) + freqs
    "GTR": 8,            # 5 free exchangeabilities + 3 freqs
    "UNREST": 11,        # 12 rates - 1 scale
    "LG": 0,
    "WAG": 0,
    "GY94": 2 + 60,      # kappa, omega + 60 codon freqs
}


def count_free_parameters(engine: LikelihoodEngine) -> int:
    k = _MODEL_K.get(engine.model.name, 0)
    k += engine.tree.n_nodes - 1          # branch lengths (root has no edge)
    if engine.ncat > 1:
        if getattr(engine, "rate_model", "gamma") == "free":
            k += 2 * engine.ncat - 2      # rates + weights, both normalized
        else:
            k += 1                        # alpha
    if engine.invariant_sites:
        k += 1                            # pinv
    return k


class ModelFit:
    def __init__(self, name, loglik, k, n, aic, aicc, bic, params):
        self.name = name
        self.loglik = loglik
        self.k = k
        self.n = n
        self.aic = aic
        self.aicc = aicc
        self.bic = bic
        self.params = params

    def as_dict(self) -> Dict:
        return {
            "model": self.name, "loglik": self.loglik, "k": self.k,
            "aic": self.aic, "aicc": self.aicc, "bic": self.bic,
        }


def compare_models(
    tree,
    alignment,
    candidates: Optional[Sequence[Union[str, Tuple]]] = None,
    criterion: str = "bic",
    max_steps: int = 200,
    **fit_kwargs,
) -> List[ModelFit]:
    """Fit each candidate and return ModelFits sorted by ``criterion``.

    ``candidates`` entries are model names ("GTR"), optionally with mixture
    suffixes "+G" (gamma-4) and "+I" ("GTR+G+I"). Default: the standard DNA
    ladder JC69 → GTR+G+I.
    """
    if candidates is None:
        candidates = [
            "JC69", "K80", "HKY85", "GTR",
            "JC69+G", "K80+G", "HKY85+G", "GTR+G", "GTR+G+I",
        ]
    results: List[ModelFit] = []
    for spec in candidates:
        parts = spec.split("+")
        name, flags = parts[0], {p.upper() for p in parts[1:]}
        model = getattr(_models, name.upper())
        ncat = 4 if "G" in flags else 1
        inv = "I" in flags
        engine = LikelihoodEngine(tree, alignment, model, ncat=ncat,
                                  invariant_sites=inv)
        res = fit(engine, max_steps=max_steps, **fit_kwargs)
        k = count_free_parameters(engine)
        n = float(np.asarray(engine._compressed.weights).sum())
        aic = 2 * k - 2 * res.loglik
        aicc = aic + (2 * k * (k + 1)) / max(n - k - 1, 1.0)
        bic = k * np.log(n) - 2 * res.loglik
        results.append(ModelFit(spec, res.loglik, k, n, aic, aicc, bic,
                                res.params))
    return sorted(results, key=lambda r: getattr(r, criterion))


def likelihood_ratio_test(
    loglik_null: float, loglik_alt: float, df: int
) -> Dict[str, float]:
    """LRT for nested models: 2*(lnL1 - lnL0) ~ chi2(df) under H0.

    Returns {"statistic", "df", "pvalue"}. Use e.g. to test rate
    heterogeneity (GTR vs GTR+G, df=1) or positive selection
    (M3 2-class vs GY94 single-omega, df=2).
    """
    from scipy.stats import chi2

    stat = 2.0 * (loglik_alt - loglik_null)
    return {
        "statistic": float(stat),
        "df": int(df),
        "pvalue": float(chi2.sf(max(stat, 0.0), df)),
    }
