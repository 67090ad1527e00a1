"""Branch models (per-edge classes) and branch-site Model A.

Golden source: the independent float64 oracle extended with per-edge
models (``oracle.core.loglikelihood_branch_models`` — serial numpy/scipy,
no JAX). Identity checks: a branch model whose classes coincide must equal
the plain engine bit-for-bit in f64.
"""
import numpy as np
import pytest

import jax

from phylo_utils_tpu import (
    BranchModelEngine,
    BranchSiteAEngine,
    LikelihoodEngine,
    free_ratio_classes,
    mark_branches,
    mark_clade,
    models,
)
from phylo_utils_tpu.io import encode_codon_alignment, parse_newick
from phylo_utils_tpu.mixtures import ModelMixtureEngine
from phylo_utils_tpu.optimize import fit, transform_params, untransform_params
from phylo_utils_tpu.trees import random_tree

from oracle import core as oracle


@pytest.fixture(scope="module")
def dna_case():
    tree = random_tree(8, seed=3)
    rng = np.random.default_rng(4)
    aln = {
        n: "".join(rng.choice(list("ACGT"), size=150))
        for n in tree.leaf_names
    }
    return tree, aln


@pytest.fixture(scope="module")
def codon_case():
    from phylo_utils_tpu.io import encode_codon_alignment
    from phylo_utils_tpu.simulate import simulate_alignment

    tree = random_tree(6, seed=9)
    aln = simulate_alignment(jax.random.key(10), tree, models.GY94, 60)
    ca = encode_codon_alignment(aln)
    return tree, aln, ca


def test_identical_classes_equal_plain_engine(dna_case):
    tree, aln = dna_case
    plain = LikelihoodEngine(tree, aln, models.HKY85, ncat=4)
    be = BranchModelEngine(
        tree, aln, models.HKY85,
        branch_classes=np.zeros(tree.n_nodes, np.int32),
        class_params=[{"kappa": 2.0}, {"kappa": 2.0}],
        ncat=4,
    )
    assert be.loglikelihood() == pytest.approx(
        plain.loglikelihood(), abs=1e-9
    )


def test_free_ratio_identity_matches_plain(dna_case):
    tree, aln = dna_case
    plain = LikelihoodEngine(tree, aln, models.HKY85, ncat=4)
    fr = BranchModelEngine(
        tree, aln, models.HKY85,
        branch_classes=free_ratio_classes(tree),
        class_params=[{"kappa": 2.0}] * tree.n_nodes,
        ncat=4,
    )
    assert fr._paired                      # the linear-cost path is active
    assert fr.loglikelihood() == pytest.approx(
        plain.loglikelihood(), abs=1e-9
    )


def test_two_class_kappa_matches_oracle(dna_case):
    tree, aln = dna_case
    cls = mark_clade(tree, tree.leaf_names[:3])
    kappas = (2.0, 8.0)
    rates = np.asarray(oracle.discrete_gamma(0.5, 4))
    be = BranchModelEngine(
        tree, aln, models.HKY85, branch_classes=cls,
        class_params=[{"kappa": k} for k in kappas], ncat=4,
    )
    freqs = np.full(4, 0.25)
    node_models = [
        oracle.hky85(kappas[int(c)], freqs) for c in np.asarray(cls)
    ]
    expected = oracle.loglikelihood_branch_models(
        tree, aln, node_models, rates=rates
    )
    assert be.loglikelihood() == pytest.approx(expected, abs=1e-8)


def test_two_ratio_codon_matches_oracle(codon_case):
    tree, aln, ca = codon_case
    cls = mark_branches(tree, tree.leaf_names[:2])
    omegas = (0.3, 2.5)
    be = BranchModelEngine(
        tree, aln, models.GY94, branch_classes=cls,
        class_params=[{"omega": w} for w in omegas],
    )
    node_models = [
        oracle.gy94(2.0, omegas[int(c)]) for c in np.asarray(cls)
    ]
    expected = oracle.loglikelihood_branch_models(
        tree, aln, node_models,
        pattern_weights=np.asarray(ca.weights),
        leaf_partials=np.asarray(ca.partials, np.float64),
    )
    assert be.loglikelihood() == pytest.approx(expected, abs=1e-7)


def test_mark_clade_marks_stem_and_inside(dna_case):
    tree, _ = dna_case
    # pick a REAL clade: the leaf set under some non-root internal node
    internal = tree.n_leaves          # first internal node (never the root)
    below, stack = [], [internal]
    while stack:
        x = stack.pop()
        if not tree.children[x]:
            below.append(x)
        stack.extend(tree.children[x])
    clade = [tree.names[i] for i in below]
    with_stem = mark_clade(tree, clade, include_stem=True)
    without = mark_clade(tree, clade, include_stem=False)
    # stem difference is exactly one edge (the MRCA's parent edge)
    assert with_stem.sum() == without.sum() + 1
    assert with_stem[internal] == 1 and without[internal] == 0
    # marked leaves are exactly the clade
    leaf_ids = [tree.leaf_index()[n] for n in clade]
    marked_leaves = [i for i in range(tree.n_leaves) if with_stem[i]]
    assert sorted(marked_leaves) == sorted(leaf_ids)


def test_gradient_matches_finite_differences(dna_case):
    tree, aln = dna_case
    cls = mark_clade(tree, tree.leaf_names[:3])
    be = BranchModelEngine(
        tree, aln, models.HKY85, branch_classes=cls,
        class_params=[{"kappa": 2.0}, {"kappa": 6.0}],
    )
    full = be._full_params(None)
    g = be.gradient()
    kg = np.asarray(g["classes"]["kappa"])
    eps = 1e-5
    for i in range(2):
        kp = np.asarray(full["classes"]["kappa"]).copy()
        km = kp.copy()
        kp[i] += eps
        km[i] -= eps
        lp = be.loglikelihood({"classes": {"kappa": kp}})
        lm = be.loglikelihood({"classes": {"kappa": km}})
        fd = (lp - lm) / (2 * eps)
        assert kg[i] == pytest.approx(fd, rel=1e-5, abs=1e-7)


def test_branch_site_all_background_equals_site_mixture(codon_case):
    """With no foreground edges, Model A collapses to a 4-class SITE
    mixture with omegas (w0, 1, w0, 1) — cross-check vs ModelMixtureEngine."""
    tree, aln, _ = codon_case
    bs = BranchSiteAEngine(
        tree, aln, foreground=np.zeros(tree.n_nodes, np.int32),
    )
    full = bs._full_params(None)
    w0 = float(full["omega0"])
    prop = np.asarray(full["proportions"], np.float64)
    prop = prop / prop.sum()
    p0, p1, p2 = prop
    w = np.array([p0, p1, p2 * p0 / (p0 + p1), p2 * p1 / (p0 + p1)])
    mm = ModelMixtureEngine(
        tree, aln, models.GY94,
        mixture=[{"omega": w0}, {"omega": 1.0},
                 {"omega": w0}, {"omega": 1.0}],
    )
    expected = mm.loglikelihood({"cat_weights": w})
    assert bs.loglikelihood() == pytest.approx(expected, abs=1e-8)


def test_branch_site_matches_oracle_mixture(codon_case):
    """Model A with a real foreground clade vs. the oracle: mix the four
    site classes' per-edge-model sitewise likelihoods in numpy."""
    tree, aln, ca = codon_case
    cls = np.asarray(mark_clade(tree, tree.leaf_names[:2]))
    bs = BranchSiteAEngine(tree, aln, foreground=cls)
    full = bs._full_params(None)
    w0 = float(full["omega0"])
    w2 = 1.0 + float(full["omega2_delta"])
    prop = np.asarray(full["proportions"], np.float64)
    prop = prop / prop.sum()
    p0, p1, p2 = prop
    weights = [p0, p1, p2 * p0 / (p0 + p1), p2 * p1 / (p0 + p1)]
    # (background omega, foreground omega) per site class
    table = [(w0, w0), (1.0, 1.0), (w0, w2), (1.0, w2)]
    sitewise = []
    for bg, fg in table:
        node_models = [
            oracle.gy94(2.0, fg if cls[i] else bg)
            for i in range(tree.n_nodes)
        ]
        _, sw = oracle.loglikelihood_branch_models(
            tree, aln, node_models, return_sitewise=True,
            leaf_partials=np.asarray(ca.partials, np.float64),
        )
        sitewise.append(sw)
    sitewise = np.stack(sitewise)                      # (4, patterns)
    m = sitewise.max(axis=0)
    mixed = np.log(np.sum(
        np.asarray(weights)[:, None] * np.exp(sitewise - m[None, :]), axis=0
    )) + m
    expected = float((np.asarray(ca.weights) * mixed).sum())
    assert bs.loglikelihood() == pytest.approx(expected, abs=1e-7)


def test_branch_model_fit_recovers_class_difference(dna_case):
    """A short fit on the two-ratio model moves the class kappas toward
    their per-class optima and improves logL."""
    tree, aln = dna_case
    cls = mark_clade(tree, tree.leaf_names[:3])
    be = BranchModelEngine(
        tree, aln, models.HKY85, branch_classes=cls,
        class_params=[{"kappa": 2.0}, {"kappa": 2.0}],
    )
    start = be.loglikelihood()
    res = fit(be, free=("classes",), max_steps=30)
    assert res.loglik > start
    # reparameterization round-trips the nested classes PyTree
    raw = transform_params(be._full_params(res.params))
    back = untransform_params(raw)
    np.testing.assert_allclose(
        np.asarray(back["classes"]["kappa"]),
        np.asarray(be._full_params(res.params)["classes"]["kappa"]),
        rtol=1e-6,
    )


def test_branch_site_transform_keys():
    """omega0 stays in (0,1) and proportions on the simplex under the
    fit reparameterization."""
    params = {
        "omega0": np.asarray(0.3),
        "proportions": np.asarray([0.7, 0.2, 0.1]),
        "omega2_delta": np.asarray(1.5),
    }
    raw = transform_params(params)
    back = untransform_params(raw)
    assert 0.0 < float(back["omega0"]) < 1.0
    assert float(back["omega0"]) == pytest.approx(0.3, rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["proportions"]), [0.7, 0.2, 0.1], rtol=1e-6
    )
    assert float(back["omega2_delta"]) == pytest.approx(1.5, rel=1e-6)


def test_ancestral_posteriors_flow_through_hook(dna_case):
    from phylo_utils_tpu.ancestral import ancestral_posteriors

    tree, aln = dna_case
    cls = mark_clade(tree, tree.leaf_names[:3])
    be = BranchModelEngine(
        tree, aln, models.HKY85, branch_classes=cls,
        class_params=[{"kappa": 2.0}, {"kappa": 8.0}], ncat=2,
    )
    post = ancestral_posteriors(be)
    n_internal = tree.n_nodes - tree.n_leaves
    n_sites = len(next(iter(aln.values())))
    assert post.shape == (n_internal, n_sites, 4)
    np.testing.assert_allclose(post.sum(axis=-1), 1.0, atol=1e-8)


def test_simulate_branch_alignment_two_ratio_recovery():
    """Data simulated with fg omega=3 / bg omega=0.15: the two-ratio
    BranchModelEngine recovers both sides of 1."""
    from phylo_utils_tpu.simulate import simulate_branch_alignment

    tree = parse_newick(
        "(((a:0.15,b:0.15):0.1,(c:0.15,d:0.15):0.1):0.08,"
        "(e:0.25,f:0.25):0.08);"
    )
    fg = mark_clade(tree, ["e", "f"])
    aln = simulate_branch_alignment(
        jax.random.key(0), tree, models.GY94, fg,
        class_params=[{"omega": 0.15}, {"omega": 3.0}],
        shared={"kappa": 2.5}, n_sites=400,
    )
    ca = encode_codon_alignment(aln)
    be = BranchModelEngine(tree, ca, models.GY94, fg,
                           class_params=[{"omega": 0.5}, {"omega": 1.0}])
    res = fit(be, free=("branch_lengths", "classes", "shared"),
              max_steps=120, patience=15)
    om = np.asarray(res.params["classes"]["omega"])
    assert om[0] < 0.5 and om[1] > 1.5


def test_branch_site_test_power():
    """Branch-site Model A rejects on data with foreground-only positive
    selection (site x branch interaction the site/branch models alone
    cannot express)."""
    from phylo_utils_tpu.branch_models import branch_site_test
    from phylo_utils_tpu.simulate import (
        simulate_alignment,
        simulate_branch_alignment,
    )

    tree = parse_newick(
        "(((a:0.15,b:0.15):0.1,(c:0.15,d:0.15):0.1):0.08,"
        "(e:0.4,f:0.4):0.15);"
    )
    fg = mark_clade(tree, ["e", "f"])
    neutral = simulate_alignment(jax.random.key(1), tree, models.GY94, 200,
                                 params={"omega": 0.05, "kappa": 2.5})
    pos_fg = simulate_branch_alignment(
        jax.random.key(2), tree, models.GY94, fg,
        class_params=[{"omega": 0.05}, {"omega": 10.0}],
        shared={"kappa": 2.5}, n_sites=300,
    )
    ca = encode_codon_alignment({n: neutral[n] + pos_fg[n] for n in neutral})
    out = branch_site_test(tree, ca, fg, max_steps=200)
    assert out["lrt"]["pvalue"] < 1e-3
    assert 1.0 + float(out["alt"].params["omega2_delta"]) > 2.0


def test_beb_branch_site_flags_selected_sites():
    """Branch-site BEB (Yang-Wong-Nielsen 2005 grid on Model A): sites
    simulated with omega >> 1 on the FOREGROUND clade only must get
    higher BEB positive-selection posteriors than sites purifying
    everywhere."""
    from phylo_utils_tpu.branch_models import beb_branch_site
    from phylo_utils_tpu.simulate import simulate_branch_alignment

    tree = random_tree(6, seed=13, mean_brlen=0.35)
    cls = np.asarray(mark_clade(tree, tree.leaf_names[:2]))
    n_pur, n_sel = 80, 40
    aln_pur = simulate_branch_alignment(
        jax.random.key(0), tree, models.GY94, cls,
        [{"omega": 0.05}, {"omega": 0.05}], n_pur, shared={"kappa": 2.0},
    )
    aln_sel = simulate_branch_alignment(
        jax.random.key(1), tree, models.GY94, cls,
        [{"omega": 0.05}, {"omega": 6.0}], n_sel, shared={"kappa": 2.0},
    )
    aln = {n: aln_pur[n] + aln_sel[n] for n in aln_pur}
    eng = BranchSiteAEngine(tree, aln, foreground=cls)
    res = fit(eng, max_steps=150, free=(
        "branch_lengths", "proportions", "omega0", "omega2_delta",
    ))
    p_pos, mean_w = beb_branch_site(eng, res.params, d=4)
    assert p_pos.shape == (n_pur + n_sel,)       # one entry per codon site
    assert np.all((p_pos >= 0) & (p_pos <= 1))
    assert p_pos[-n_sel:].mean() > p_pos[:n_pur].mean() + 0.1
    assert mean_w[-n_sel:].mean() > mean_w[:n_pur].mean()
