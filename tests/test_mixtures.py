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


def test_m7_matches_explicit_mixture():
    """M7 logL must equal a ModelMixtureEngine built from the same
    discretized-beta omega classes (exact same math, different params)."""
    from phylo_utils_tpu.mixtures import M7Engine
    from phylo_utils_tpu.ops.beta import discrete_beta

    tree = random_tree(5, seed=3, mean_brlen=0.15)
    aln = simulate_alignment(jax.random.key(2), tree, models.GY94, 60,
                             params={"omega": 0.5, "kappa": 2.0})
    ca = encode_codon_alignment(aln)
    p, q, K = 0.7, 1.9, 4
    m7 = M7Engine(tree, ca, ncat=K)
    ll7 = m7.loglikelihood({"beta_p": p, "beta_q": q})
    omegas = np.asarray(discrete_beta(p, q, K))
    explicit = ModelMixtureEngine(
        tree, ca, models.GY94, mixture=[{"omega": w} for w in omegas],
    )
    lle = explicit.loglikelihood()
    assert ll7 == pytest.approx(lle, abs=1e-8)
    # gradients must flow into the beta shape parameters
    g = m7.gradient({"beta_p": p, "beta_q": q})
    assert abs(float(g["beta_p"])) > 0
    assert abs(float(g["beta_q"])) > 0


def test_m8_positive_selection_recovery():
    """M8 on data with an omega=4 class: the extra class picks it up and
    the M7-vs-M8 LRT rejects the beta-only null."""
    from phylo_utils_tpu.mixtures import (
        M7Engine,
        M8Engine,
        positive_selection_test,
    )

    tree = random_tree(6, seed=1, mean_brlen=0.2)
    aln_pur = simulate_alignment(jax.random.key(0), tree, models.GY94, 150,
                                 params={"omega": 0.1, "kappa": 2.0})
    aln_pos = simulate_alignment(jax.random.key(1), tree, models.GY94, 150,
                                 params={"omega": 4.0, "kappa": 2.0})
    aln = {n: aln_pur[n] + aln_pos[n] for n in aln_pur}
    ca = encode_codon_alignment(aln)
    free7 = ("branch_lengths", "shared", "beta_p", "beta_q")
    m7 = M7Engine(tree, ca, ncat=4)
    res7 = fit(m7, free=free7, max_steps=60, patience=12)
    m8 = M8Engine(tree, ca, ncat=4)
    res8 = fit(m8, free=free7 + ("p0", "omega_delta"),
               max_steps=80, patience=15)
    assert res8.loglik > res7.loglik - 1e-6
    lrt = positive_selection_test(res7.loglik, res8.loglik)
    assert lrt["pvalue"] < 0.01
    # the positive class: omega > 1 with a nontrivial weight
    omega_pos = 1.0 + float(np.asarray(res8.params["omega_delta"]))
    p0 = float(np.asarray(res8.params["p0"]))
    assert omega_pos > 1.5
    assert 0.2 < p0 < 0.95
    # per-site scan: positive half gets higher last-class posteriors
    mean_omega, gam = omega_posteriors(m8, res8.params)
    assert gam.shape == (300, 5)
    assert gam[150:, -1].mean() > gam[:150, -1].mean() + 0.2


def test_m1a_matches_explicit_mixture():
    """M1a logL must equal a ModelMixtureEngine with the same two omega
    classes and weights (same math, hyperparameterized)."""
    from phylo_utils_tpu.mixtures import M1aEngine

    tree = random_tree(5, seed=4, mean_brlen=0.15)
    aln = simulate_alignment(jax.random.key(5), tree, models.GY94, 60,
                             params={"omega": 0.4, "kappa": 2.0})
    ca = encode_codon_alignment(aln)
    m1a = M1aEngine(tree, ca)
    ll = m1a.loglikelihood({"proportions": [0.8, 0.2], "omega0": 0.15})
    explicit = ModelMixtureEngine(
        tree, ca, models.GY94,
        mixture=[{"omega": 0.15}, {"omega": 1.0}],
    )
    lle = explicit.loglikelihood({"cat_weights": [0.8, 0.2]})
    assert ll == pytest.approx(lle, abs=1e-8)
    # gradients flow into the hyperparameters
    g = m1a.gradient({"proportions": [0.8, 0.2], "omega0": 0.15})
    assert abs(float(g["omega0"])) > 0
    assert np.any(np.abs(np.asarray(g["proportions"])) > 0)


def test_m2a_positive_selection_recovery():
    """M2a on half-purifying / half-positive data: the omega>1 class is
    recovered, the M1a-vs-M2a LRT rejects, and the NEB site scan
    separates the halves."""
    from phylo_utils_tpu.mixtures import M1aEngine, M2aEngine, m1a_m2a_test

    tree = random_tree(6, seed=1, mean_brlen=0.2)
    aln_pur = simulate_alignment(jax.random.key(0), tree, models.GY94, 150,
                                 params={"omega": 0.1, "kappa": 2.0})
    aln_pos = simulate_alignment(jax.random.key(1), tree, models.GY94, 150,
                                 params={"omega": 4.0, "kappa": 2.0})
    aln = {n: aln_pur[n] + aln_pos[n] for n in aln_pur}
    ca = encode_codon_alignment(aln)
    free = ("branch_lengths", "shared", "proportions", "omega0")
    m1a = M1aEngine(tree, ca)
    res1 = fit(m1a, free=free, max_steps=60, patience=12)
    m2a = M2aEngine(tree, ca)
    res2 = fit(m2a, free=free + ("omega2_delta",),
               max_steps=80, patience=15)
    assert res2.loglik > res1.loglik - 1e-6
    lrt = m1a_m2a_test(res1.loglik, res2.loglik)
    assert lrt["pvalue"] < 0.01
    omega2 = 1.0 + float(np.asarray(res2.params["omega2_delta"]))
    assert omega2 > 1.5
    # NEB positively-selected-site scan: positive half ranks higher
    mean_omega, gam = omega_posteriors(m2a, res2.params)
    assert gam.shape == (300, 3)
    assert gam[150:, -1].mean() > gam[:150, -1].mean() + 0.2


def test_beb_m2a_site_scan():
    """BEB (Yang-Wong-Nielsen 2005) on half-purifying/half-positive data:
    flags the positive half, agrees directionally with NEB, and collapses
    to the proper range."""
    from phylo_utils_tpu.mixtures import M2aEngine, beb_site_posteriors

    tree = random_tree(6, seed=1, mean_brlen=0.2)
    aln_pur = simulate_alignment(jax.random.key(0), tree, models.GY94, 120,
                                 params={"omega": 0.1, "kappa": 2.0})
    aln_pos = simulate_alignment(jax.random.key(1), tree, models.GY94, 120,
                                 params={"omega": 4.0, "kappa": 2.0})
    aln = {n: aln_pur[n] + aln_pos[n] for n in aln_pur}
    ca = encode_codon_alignment(aln)
    m2a = M2aEngine(tree, ca)
    res = fit(m2a, free=("branch_lengths", "shared", "proportions",
                         "omega0", "omega2_delta"),
              max_steps=60, patience=12)
    p_pos, mean_w = beb_site_posteriors(m2a, res.params, d=6)
    assert p_pos.shape == (240,) and mean_w.shape == (240,)
    assert np.all((p_pos >= 0) & (p_pos <= 1))
    assert np.all(mean_w > 0)
    # positive half must rank higher under BEB
    assert p_pos[120:].mean() > p_pos[:120].mean() + 0.2
    assert mean_w[120:].mean() > mean_w[:120].mean() + 0.5
    # BEB and NEB agree directionally on informative data
    _, gam = omega_posteriors(m2a, res.params)
    neb_pos = gam[:, -1]
    assert np.corrcoef(p_pos, neb_pos)[0, 1] > 0.7


def test_beb_m8_site_scan():
    """M8 BEB on half-purifying/half-positive data flags the right half."""
    from phylo_utils_tpu.mixtures import M8Engine, beb_site_posteriors_m8

    tree = random_tree(6, seed=1, mean_brlen=0.2)
    aln_pur = simulate_alignment(jax.random.key(0), tree, models.GY94, 120,
                                 params={"omega": 0.1, "kappa": 2.0})
    aln_pos = simulate_alignment(jax.random.key(1), tree, models.GY94, 120,
                                 params={"omega": 4.0, "kappa": 2.0})
    aln = {n: aln_pur[n] + aln_pos[n] for n in aln_pur}
    ca = encode_codon_alignment(aln)
    m8 = M8Engine(tree, ca, ncat=4)
    res = fit(m8, free=("branch_lengths", "shared", "beta_p", "beta_q",
                        "p0", "omega_delta"),
              max_steps=60, patience=12)
    p_pos, mean_w = beb_site_posteriors_m8(m8, res.params, d=6, n_fine=12)
    assert p_pos.shape == (240,)
    assert np.all((p_pos >= 0) & (p_pos <= 1.0 + 1e-9))
    assert p_pos[120:].mean() > p_pos[:120].mean() + 0.2
    assert mean_w[120:].mean() > mean_w[:120].mean() + 0.5


def test_m8a_nests_in_m8_and_boundary_test():
    """M8a == M8 with the extra class's omega pinned at 1; the
    M8-vs-M8a LRT uses the boundary mixture null (p = 0.5*chi2_1 tail)."""
    from phylo_utils_tpu.mixtures import M8aEngine, M8Engine, m8_m8a_test

    tree = random_tree(5, seed=4)
    aln = simulate_alignment(
        jax.random.key(9), tree, models.GY94, 60, params={"omega": 0.3}
    )
    m8a = M8aEngine(tree, aln, ncat=4)
    full = m8a._full_params(None)
    om, w = m8a._class_omegas_weights(full)
    assert float(om[-1]) == 1.0
    assert "omega_delta" not in full
    np.testing.assert_allclose(float(np.sum(np.asarray(w))), 1.0,
                               atol=1e-12)
    ll_a = m8a.loglikelihood()
    m8 = M8Engine(tree, aln, ncat=4)
    ll_8 = m8.loglikelihood({"omega_delta": 1e-8})
    assert abs(ll_a - ll_8) < 1e-6          # exact nesting at the boundary
    t = m8_m8a_test(ll_a, ll_a + 3.0)
    from scipy.stats import chi2

    assert t["pvalue"] == pytest.approx(0.5 * chi2.sf(6.0, 1))
    assert m8_m8a_test(ll_a, ll_a)["pvalue"] == 1.0


def test_dn_ds_by_branch_invariants():
    """Goldman-Yang dN/dS accounting: dN/dS == omega by construction,
    S + N == 3 sites per codon, and expected syn+nonsyn subs == t."""
    from phylo_utils_tpu.models.codon import dn_ds_by_branch, make_gy94

    m = make_gy94()
    res = dn_ds_by_branch(m, {"omega": 0.4, "kappa": 3.0},
                          branch_lengths=[0.1, 0.5])
    np.testing.assert_allclose(res["dN"] / res["dS"], 0.4, rtol=1e-10)
    assert res["S"] + res["N"] == pytest.approx(3.0, abs=1e-12)
    np.testing.assert_allclose(
        res["expected_nonsyn_subs"] + res["expected_syn_subs"], res["t"]
    )
    # neutral model: dN == dS
    neutral = dn_ds_by_branch(m, {"omega": 1.0}, branch_lengths=[0.3])
    assert neutral["dN"][0] == pytest.approx(neutral["dS"][0], rel=1e-10)
    # alternative genetic code resolves its masks from the model alphabet
    m2 = make_gy94("vertebrate_mito")
    r2 = dn_ds_by_branch(m2, {"omega": 2.0}, branch_lengths=[0.2])
    np.testing.assert_allclose(r2["dN"] / r2["dS"], 2.0, rtol=1e-10)
