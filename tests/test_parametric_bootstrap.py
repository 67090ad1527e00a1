"""Parametric bootstrap (seq-gen + refit) — cross-validated against the
asymptotic Hessian standard errors."""
import jax
import numpy as np

from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.optimize import (
    fit,
    parametric_bootstrap,
    standard_errors,
)
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.trees import random_tree


def test_parametric_bootstrap_consistent_with_hessian_se():
    tree = random_tree(6, seed=1)
    aln = simulate_alignment(
        jax.random.key(5), tree, models.K80, 300, params={"kappa": 3.0}
    )
    eng = LikelihoodEngine(tree, aln, models.K80)
    mle = fit(eng, max_steps=200)
    pb = parametric_bootstrap(eng, mle.params, n_replicates=6, seed=0,
                              max_steps=120)
    reps = pb["replicates"]["model"]["kappa"]
    assert reps.shape == (6,)
    # replicates scatter around the generating MLE
    kappa_hat = float(np.asarray(mle.params["model"]["kappa"]))
    assert abs(pb["mean"]["model"]["kappa"] - kappa_hat) < 1.5
    # finite-sample SE agrees with the observed-information SE within a
    # loose factor (6 replicates -> noisy, but the order must match)
    se_h = float(standard_errors(eng, mle.params)["model"]["kappa"])
    se_b = float(pb["se"]["model"]["kappa"])
    assert 0.25 * se_h < se_b < 4.0 * se_h
    # per-replicate logLs are finite and the branch-length pytree stacked
    assert np.isfinite(pb["loglik"]).all()
    assert pb["replicates"]["branch_lengths"].shape[0] == 6
