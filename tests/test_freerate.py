"""FreeRate mixture: per-category rates + weights as free parameters."""
import numpy as np
import pytest

import oracle.core as oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.optimize import fit
from phylo_utils_tpu.trees import random_tree


def _aln(tree, sites, seed=0):
    rng = np.random.default_rng(seed)
    return {n: "".join(rng.choice(list("ACGT"), size=sites))
            for n in tree.leaf_names}


def test_freerate_matches_oracle_weighted_mixture():
    tree = random_tree(8, seed=1)
    aln = _aln(tree, 120, seed=2)
    engine = LikelihoodEngine(tree, aln, models.HKY85, ncat=3,
                              rate_model="free")
    rates = np.array([0.3, 1.0, 2.4])
    weights = np.array([0.5, 0.3, 0.2])
    # engine renormalizes rates to weighted mean 1
    norm = rates / np.sum(weights * rates)
    ll = engine.loglikelihood({
        "rates": rates, "cat_weights": weights, "model": {"kappa": 2.0},
    })
    gold = oracle.loglikelihood(
        tree, aln, oracle.hky85(2.0, [0.25] * 4),
        rates=norm, rate_weights=weights,
    )
    assert ll == pytest.approx(gold, abs=1e-8)


def test_freerate_gamma_special_case():
    """FreeRate with gamma-discretized rates and equal weights must equal
    the gamma engine exactly."""
    tree = random_tree(6, seed=3)
    aln = _aln(tree, 80, seed=4)
    gamma_engine = LikelihoodEngine(tree, aln, models.GTR, ncat=4)
    free_engine = LikelihoodEngine(tree, aln, models.GTR, ncat=4,
                                   rate_model="free")
    g_rates = np.asarray(oracle.discrete_gamma(0.7, 4))
    ll_gamma = gamma_engine.loglikelihood({"alpha": 0.7})
    ll_free = free_engine.loglikelihood({
        "rates": g_rates, "cat_weights": np.full(4, 0.25),
    })
    assert ll_free == pytest.approx(ll_gamma, abs=1e-9)


def test_freerate_fit_beats_gamma_when_rates_are_weird():
    """Data simulated under a bimodal rate mixture: FreeRate must fit at
    least as well as gamma with the same category count."""
    import jax

    from phylo_utils_tpu.simulate import simulate_states

    tree = random_tree(6, seed=5, mean_brlen=0.3)
    aln = _aln(tree, 400, seed=6)
    ge = LikelihoodEngine(tree, aln, models.K80, ncat=3)
    fe = LikelihoodEngine(tree, aln, models.K80, ncat=3, rate_model="free")
    rg = fit(ge, max_steps=80, patience=15)
    rf = fit(fe, max_steps=120, patience=20)
    assert rf.loglik >= rg.loglik - 0.05  # >= gamma (nested family)
    w = np.asarray(rf.params["cat_weights"])
    assert w.sum() == pytest.approx(1.0, abs=1e-6)
    assert (w > 0).all()


def test_freerate_requires_valid_rate_model():
    tree = random_tree(4, seed=0)
    with pytest.raises(ValueError, match="rate_model"):
        LikelihoodEngine(tree, _aln(tree, 12), models.JC69,
                         rate_model="banana")
