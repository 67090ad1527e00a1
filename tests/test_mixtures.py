"""Model mixtures (per-category model params) incl. M3-style omega classes."""
import jax
import numpy as np
import pytest

import oracle.core as oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.io import encode_codon_alignment, parse_newick
from phylo_utils_tpu.mixtures import ModelMixtureEngine, omega_posteriors
from phylo_utils_tpu.optimize import fit
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.trees import random_tree


def _mix_gold(tree, aln_partials, weights, omodels, cat_weights):
    """Golden mixture logL: combine per-model sitewise likelihoods."""
    sitewises = []
    for om in omodels:
        _, sw = oracle.loglikelihood(
            tree, {}, om, pattern_weights=np.asarray(weights),
            leaf_partials=np.asarray(aln_partials, np.float64),
            return_sitewise=True,
        )
        sitewises.append(sw)
    sitewises = np.stack(sitewises)        # (K, sites) log-likelihoods
    m = sitewises.max(axis=0)
    mixed = np.log(np.sum(
        np.asarray(cat_weights)[:, None] * np.exp(sitewises - m), axis=0
    )) + m
    return float((np.asarray(weights) * mixed).sum())


def test_kappa_mixture_matches_golden():
    """HKY85 mixture over two kappa classes vs manually mixed oracle."""
    tree = parse_newick("((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);")
    aln = {"a": "ACGTACGTGG", "b": "ACGTTGCAGG",
           "c": "AGGTACGAGT", "d": "ACGAACGTAT"}
    mixture = [{"kappa": 1.0}, {"kappa": 8.0}]
    engine = ModelMixtureEngine(tree, aln, models.HKY85, mixture,
                                compress=False)
    w = [0.3, 0.7]
    ll = engine.loglikelihood({"cat_weights": w})
    gold = _mix_gold(
        tree, engine._compressed.partials, engine._compressed.weights,
        [oracle.hky85(1.0, [0.25] * 4), oracle.hky85(8.0, [0.25] * 4)], w,
    )
    assert ll == pytest.approx(gold, abs=1e-8)


def test_omega_mixture_detects_selection_classes():
    """Simulate half the codon sites under purifying (w=0.1), half under
    positive selection (w=4): the M3 fit's per-site posterior mean omega
    must separate the two halves."""
    tree = random_tree(6, seed=1, mean_brlen=0.2)
    key = jax.random.key(0)
    aln_pur = simulate_alignment(key, tree, models.GY94, 150,
                                 params={"omega": 0.1, "kappa": 2.0})
    aln_pos = simulate_alignment(jax.random.key(1), tree, models.GY94, 150,
                                 params={"omega": 4.0, "kappa": 2.0})
    aln = {n: aln_pur[n] + aln_pos[n] for n in aln_pur}
    ca = encode_codon_alignment(aln)
    engine = ModelMixtureEngine(
        tree, ca, models.GY94,
        mixture=[{"omega": 0.2}, {"omega": 2.0}],
    )
    res = fit(engine, free=("branch_lengths", "mixture", "cat_weights"),
              max_steps=60, patience=12)
    mean_omega, gam = omega_posteriors(engine, res.params)
    assert mean_omega.shape == (300,)
    assert gam.shape == (300, 2)
    np.testing.assert_allclose(gam.sum(axis=1), 1.0, atol=1e-5)
    # purifying half must get a lower posterior mean omega
    assert mean_omega[:150].mean() < mean_omega[150:].mean() - 0.2
    # fitted omegas should straddle 1
    omegas = np.sort(np.asarray(res.params["mixture"]["omega"]))
    assert omegas[0] < 1.0 < omegas[-1]


def test_mixture_validation():
    tree = random_tree(4, seed=0)
    aln = {n: "ACGTACGT" for n in tree.leaf_names}
    with pytest.raises(ValueError, match="at least 2"):
        ModelMixtureEngine(tree, aln, models.HKY85, [{"kappa": 2.0}])
    # unspecified per-category params are filled from model defaults
    e = ModelMixtureEngine(tree, aln, models.HKY85,
                           [{"kappa": 2.0}, {"freqs": [0.1, 0.2, 0.3, 0.4]}])
    assert np.isfinite(e.loglikelihood())
