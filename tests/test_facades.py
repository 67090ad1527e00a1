"""Reference-API facades: markov.TransitionMatrix and GammaMixture."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle.core as oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.io import parse_newick
from phylo_utils_tpu.likelihood import GammaMixture
from phylo_utils_tpu.markov import TransitionMatrix


def test_transition_matrix_properties():
    tm = TransitionMatrix(models.HKY85, {"kappa": 3.0})
    p = tm.get_p_matrix(0.2)
    np.testing.assert_allclose(np.asarray(p).sum(axis=-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(tm.get_p_matrix(0.0)), np.eye(4), atol=1e-12
    )
    # dP/dt and d2P/dt2 vs finite differences
    h = 1e-6
    dp_fd = (np.asarray(tm.get_p_matrix(0.2 + h)) -
             np.asarray(tm.get_p_matrix(0.2 - h))) / (2 * h)
    np.testing.assert_allclose(np.asarray(tm.get_dp_matrix(0.2)), dp_fd,
                               rtol=1e-5, atol=1e-7)
    d2p_fd = (np.asarray(tm.get_p_matrix(0.2 + h)) -
              2 * np.asarray(tm.get_p_matrix(0.2)) +
              np.asarray(tm.get_p_matrix(0.2 - h))) / h**2
    np.testing.assert_allclose(np.asarray(tm.get_d2p_matrix(0.2)), d2p_fd,
                               rtol=1e-3, atol=1e-4)
    # batched t
    assert tm.get_p_matrix(jnp.asarray([0.1, 0.2, 0.3])).shape == (3, 4, 4)
    # matches oracle expm
    om = oracle.hky85(3.0, [0.25] * 4)
    np.testing.assert_allclose(
        np.asarray(tm.get_p_matrix(0.37)), oracle.pmat(om, 0.37), atol=1e-10
    )


def test_transition_matrix_sampling_distribution():
    tm = TransitionMatrix(models.JC69)
    parents = jnp.zeros(20000, jnp.int32)
    kids = tm.sample_states(jax.random.key(0), parents, 0.5)
    emp = np.bincount(np.asarray(kids), minlength=4) / 20000
    expected = np.asarray(tm.get_p_matrix(0.5))[0]
    np.testing.assert_allclose(emp, expected, atol=0.012)


def test_gamma_mixture_facade_matches_oracle():
    tree = parse_newick("((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);")
    aln = {"a": "ACGTACGTGG", "b": "ACGTTGCAGG",
           "c": "AGGTACGAGT", "d": "ACGAACGTAT"}
    gm = GammaMixture(alpha=0.5, ncat=4, model=models.HKY85)
    gm.set_alignment(aln)
    gm.set_tree(tree)
    gm.update_substitution_model(kappa=2.5)
    ll = gm.get_likelihood()
    gold = oracle.loglikelihood(
        tree, aln, oracle.hky85(2.5, [0.25] * 4),
        rates=oracle.discrete_gamma(0.5, 4),
    )
    assert ll == pytest.approx(gold, abs=1e-8)
    # update_alpha changes the result consistently
    gm.update_alpha(1.2)
    gold2 = oracle.loglikelihood(
        tree, aln, oracle.hky85(2.5, [0.25] * 4),
        rates=oracle.discrete_gamma(1.2, 4),
    )
    assert gm.get_likelihood() == pytest.approx(gold2, abs=1e-8)
    # sitewise expands to n_sites and sums (weighted) to total
    sw = gm.get_sitewise_likelihoods()
    assert sw.shape == (10,)
    assert sw.sum() == pytest.approx(gold2, abs=1e-8)
    # branch-length update
    gm.update_branch_lengths(np.full(7, 0.1))
    tree2 = tree.with_lengths(np.full(7, 0.1))
    gold3 = oracle.loglikelihood(
        tree2, aln, oracle.hky85(2.5, [0.25] * 4),
        rates=oracle.discrete_gamma(1.2, 4),
    )
    assert gm.get_likelihood() == pytest.approx(gold3, abs=1e-8)


def test_gamma_mixture_optimise():
    tree = parse_newick("((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);")
    aln = {"a": "ACGTACGTGGACTGAC", "b": "ACGTTGCAGGACTGAC",
           "c": "AGGTACGAGTTCTGAC", "d": "ACGAACGTATACTGAC"}
    gm = GammaMixture(alpha=0.5, ncat=2, model=models.K80)
    gm.set_alignment(aln).set_tree(tree)
    ll0 = gm.get_likelihood()
    res = gm.optimise(max_steps=60, patience=10)
    assert res.loglik > ll0
    assert gm.get_likelihood() == pytest.approx(res.loglik, abs=1e-6)


def test_gamma_mixture_requires_wiring():
    gm = GammaMixture(alpha=0.5, ncat=4, model=models.JC69)
    with pytest.raises(ValueError):
        gm.get_likelihood()
    with pytest.raises(ValueError):
        gm.set_tree("(a:1,b:1);")


def test_gamma_mixture_model_switch_clears_stale_params():
    """Regression: switching substitution models must drop the previous
    model's parameters."""
    tree = parse_newick("((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);")
    aln = {"a": "ACGTACGTGG", "b": "ACGTTGCAGG",
           "c": "AGGTACGAGT", "d": "ACGAACGTAT"}
    gm = GammaMixture(alpha=0.5, ncat=2, model=models.GTR)
    gm.set_alignment(aln).set_tree(tree)
    gm.update_substitution_model(rates=[1.0, 2.0, 1.0, 1.0, 2.0, 1.0])
    ll_gtr = gm.get_likelihood()
    gm.update_substitution_model(model=models.JC69)
    ll_jc = gm.get_likelihood()  # must not raise TypeError
    assert np.isfinite(ll_jc) and ll_jc != pytest.approx(ll_gtr)
