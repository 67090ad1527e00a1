"""Gradient correctness: exact JAX gradients vs central finite differences,
and the differentiable discrete-gamma machinery vs scipy.

These cover BASELINE config 5's requirement of exact gradients through the
pruning pass (branch lengths, model parameters, alpha, pinv), replacing the
reference's hand-coded sitewise derivative kernels (SURVEY.md §3.3).
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaincinv

import oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.ops.gamma import discrete_gamma, gamma_quantile
from phylo_utils_tpu.trees import random_tree


def test_gamma_quantile_vs_scipy():
    alphas = np.array([0.05, 0.2, 0.5, 1.0, 2.7, 10.0, 80.0])
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    for a in alphas:
        got = np.asarray(gamma_quantile(jnp.float64(a), jnp.asarray(qs)))
        want = gammaincinv(a, qs)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_discrete_gamma_matches_oracle():
    for alpha in [0.1, 0.5, 1.0, 3.3]:
        for ncat in [2, 4, 8]:
            got = np.asarray(discrete_gamma(jnp.float64(alpha), ncat))
            want = oracle.discrete_gamma(alpha, ncat)
            np.testing.assert_allclose(got, want, rtol=1e-9)
    got = np.asarray(discrete_gamma(jnp.float64(0.7), 4, median=True))
    want = oracle.discrete_gamma(0.7, 4, median=True)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_discrete_gamma_alpha_gradient():
    for alpha in [0.3, 0.8, 2.0]:
        f = lambda a: discrete_gamma(a, 4)
        jac = jax.jacfwd(f)(jnp.float64(alpha))
        h = 1e-6
        fd = (oracle.discrete_gamma(alpha + h, 4)
              - oracle.discrete_gamma(alpha - h, 4)) / (2 * h)
        np.testing.assert_allclose(np.asarray(jac), fd, rtol=1e-4)


def _fd_grad(fn, x, h=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp, xm = x.copy().ravel(), x.copy().ravel()
        xp[i] += h
        xm[i] -= h
        g.ravel()[i] = (fn(xp.reshape(x.shape)) - fn(xm.reshape(x.shape))) / (2 * h)
    return g


def test_branch_length_gradient_vs_fd():
    tree = random_tree(10, seed=3, mean_brlen=0.12)
    rng = np.random.default_rng(0)
    aln = {n: "".join(rng.choice(list("ACGT"), size=80)) for n in tree.leaf_names}
    engine = LikelihoodEngine(tree, aln, models.HKY85, ncat=4)
    p0 = engine.default_params()
    p0["alpha"] = jnp.float64(0.6)

    grad = engine.gradient(p0)["branch_lengths"]

    def fn(bl):
        return engine.loglikelihood({**p0, "branch_lengths": bl})

    fd = _fd_grad(fn, np.asarray(p0["branch_lengths"]))
    # root has no edge: gradient should be ~0 there, FD too
    np.testing.assert_allclose(np.asarray(grad), fd, rtol=2e-5, atol=1e-7)


def test_model_parameter_gradients_vs_fd():
    tree = random_tree(8, seed=5, mean_brlen=0.1)
    rng = np.random.default_rng(1)
    aln = {n: "".join(rng.choice(list("ACGT"), size=60)) for n in tree.leaf_names}
    engine = LikelihoodEngine(tree, aln, models.GTR, ncat=4,
                              invariant_sites=True)
    p0 = engine.default_params()
    p0["alpha"] = jnp.float64(0.8)
    p0["pinv"] = jnp.float64(0.1)
    p0["model"] = {
        "rates": jnp.asarray([1.5, 4.0, 0.8, 1.2, 5.0, 1.0]),
        "freqs": jnp.asarray([0.35, 0.2, 0.18, 0.27]),
    }
    g = engine.gradient(p0)

    fd_rates = _fd_grad(
        lambda r: engine.loglikelihood(
            {**p0, "model": {**p0["model"], "rates": r}}),
        np.asarray(p0["model"]["rates"]),
    )
    np.testing.assert_allclose(np.asarray(g["model"]["rates"]), fd_rates,
                               rtol=2e-5, atol=1e-7)

    fd_freqs = _fd_grad(
        lambda f: engine.loglikelihood(
            {**p0, "model": {**p0["model"], "freqs": f}}),
        np.asarray(p0["model"]["freqs"]),
    )
    np.testing.assert_allclose(np.asarray(g["model"]["freqs"]), fd_freqs,
                               rtol=2e-5, atol=1e-6)

    fd_alpha = _fd_grad(
        lambda a: engine.loglikelihood({**p0, "alpha": a[()]}),
        np.asarray(p0["alpha"]),
    )
    np.testing.assert_allclose(np.asarray(g["alpha"]), fd_alpha, rtol=1e-4)

    fd_pinv = _fd_grad(
        lambda x: engine.loglikelihood({**p0, "pinv": x[()]}),
        np.asarray(p0["pinv"]),
    )
    np.testing.assert_allclose(np.asarray(g["pinv"]), fd_pinv, rtol=1e-4)


def test_kappa_gradient_vs_fd():
    tree = random_tree(6, seed=9, mean_brlen=0.15)
    rng = np.random.default_rng(2)
    aln = {n: "".join(rng.choice(list("ACGT"), size=50)) for n in tree.leaf_names}
    engine = LikelihoodEngine(tree, aln, models.K80)
    p0 = engine.default_params()
    p0["model"] = {"kappa": jnp.float64(2.5)}
    g = engine.gradient(p0)["model"]["kappa"]
    fd = _fd_grad(
        lambda k: engine.loglikelihood({"model": {"kappa": k[()]}}),
        np.asarray(2.5),
    )
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-6)
