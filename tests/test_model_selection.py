"""Model selection: AIC/BIC ranking identifies the generating model class."""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.model_selection import (
    compare_models,
    count_free_parameters,
)
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.trees import random_tree


def test_count_free_parameters():
    tree = random_tree(5, seed=0)
    aln = simulate_alignment(jax.random.key(0), tree, models.JC69, 30)
    e = LikelihoodEngine(tree, aln, models.GTR, ncat=4, invariant_sites=True)
    # 8 model + (2*5-2)=8 branches + alpha + pinv
    assert count_free_parameters(e) == 8 + 8 + 1 + 1
    e2 = LikelihoodEngine(tree, aln, models.JC69)
    assert count_free_parameters(e2) == 8


def test_compare_models_prefers_richer_model_for_k80_data():
    """Data simulated under K80 with strong kappa: JC69 must lose to
    kappa-aware models under BIC; logL must be monotone in nesting."""
    tree = random_tree(6, seed=1, mean_brlen=0.2)
    aln = simulate_alignment(
        jax.random.key(1), tree, models.K80, 800, params={"kappa": 8.0}
    )
    fits = compare_models(
        tree, aln, candidates=["JC69", "K80", "GTR"], max_steps=80,
        patience=15,
    )
    by_name = {f.name: f for f in fits}
    # nested families: more parameters can't fit worse
    assert by_name["K80"].loglik >= by_name["JC69"].loglik - 1e-3
    assert by_name["GTR"].loglik >= by_name["K80"].loglik - 0.3
    # kappa=8 data: JC69 must rank last under BIC
    assert fits[-1].name == "JC69"
    assert fits[0].name in ("K80", "GTR")
    d = fits[0].as_dict()
    assert {"model", "loglik", "k", "aic", "aicc", "bic"} <= set(d)


def test_likelihood_ratio_test():
    from phylo_utils_tpu.model_selection import likelihood_ratio_test

    out = likelihood_ratio_test(-1010.0, -1000.0, df=1)
    assert out["statistic"] == pytest.approx(20.0)
    assert out["pvalue"] < 1e-4
    flat = likelihood_ratio_test(-1000.0, -1000.0, df=2)
    assert flat["pvalue"] == pytest.approx(1.0)


def test_goldman_cox_adequacy():
    """Goldman-Cox parametric-bootstrap adequacy: the generating model
    is not rejected; a badly misspecified one (ignoring strong rate
    heterogeneity) is."""
    import jax

    from phylo_utils_tpu.model_selection import (
        goldman_cox_test,
        unconstrained_loglikelihood,
    )
    from phylo_utils_tpu.optimize import fit
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import random_tree

    tree = random_tree(6, seed=3, mean_brlen=0.2)
    aln = simulate_alignment(jax.random.key(2), tree, models.HKY85, 400,
                             params={"kappa": 3.0})
    eng = LikelihoodEngine(tree, aln, models.HKY85)
    mle = fit(eng, max_steps=200)
    res = goldman_cox_test(eng, mle.params, n_replicates=10, refit=True,
                           max_steps=120, seed=1)
    assert res["unconstrained"] >= res["loglik"]
    assert res["pvalue"] > 0.1            # generating family: adequate

    aln2 = simulate_alignment(jax.random.key(4), tree, models.HKY85, 800,
                              params={"kappa": 3.0, "alpha": 0.2}, ncat=4)
    eng2 = LikelihoodEngine(tree, aln2, models.JC69)
    mle2 = fit(eng2, max_steps=150)
    res2 = goldman_cox_test(eng2, mle2.params, n_replicates=10,
                            refit=False, seed=1)
    assert res2["pvalue"] <= 0.1          # misspecified: rejected
    assert res2["delta"] > res["delta"]
