"""Ancestral machinery on model-mixture engines (per-category
frequencies) and +I engines — validated against exhaustive enumeration."""
import itertools

import jax
import numpy as np
import pytest
import scipy.linalg

import oracle.core as oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.ancestral import (
    ancestral_posteriors,
    joint_ancestral_states,
)
from phylo_utils_tpu.io import parse_newick
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.mixtures import ModelMixtureEngine

NWK = "((a:0.12,b:0.34):0.08,(c:0.21,d:0.05):0.15);"
ALN = {
    "a": "ACGTAAGTGGAATTCC",
    "b": "ACGTAGCAGGAATCCC",
    "c": "AGGTAAGAGTATTTCC",
    "d": "ACGAAAGTATAATTGC",
}
CHARMAP = {"A": 0, "C": 1, "G": 2, "T": 3}


def _enum_marginal(tree, aln, cat_q_freqs_weights, pinv=0.0):
    """Exhaustive marginal internal-state posteriors over (component,
    assignment). cat_q_freqs_weights: list of (Q, freqs, weight,
    rate_multiplier)."""
    obs = np.array([[CHARMAP[c] for c in aln[n]] for n in tree.leaf_names])
    n_nodes = len(tree.parent)
    n_leaves = tree.n_leaves
    internals = list(range(n_leaves, n_nodes))
    root = n_nodes - 1
    n_sites = obs.shape[1]
    tot = np.zeros(n_sites)
    acc = np.zeros((len(internals), n_sites, 4))
    fbar = np.zeros(4)
    wsum = 0.0
    for q, freqs, w, r in cat_q_freqs_weights:
        fbar += w * np.asarray(freqs)
        wsum += w
        p_edge = [scipy.linalg.expm(q * tree.lengths[v] * r)
                  for v in range(n_nodes)]
        for assign in itertools.product(range(4), repeat=len(internals)):
            st = dict(zip(internals, assign))
            pr = np.full(n_sites, (1 - pinv) * w * freqs[st[root]])
            for v in range(n_nodes):
                if v == root:
                    continue
                par = st[tree.parent[v]]
                pr = pr * (p_edge[v][par, obs[v]] if v < n_leaves
                           else p_edge[v][par, st[v]])
            tot += pr
            for i, v in enumerate(internals):
                acc[i, np.arange(n_sites), st[v]] += pr
    if pinv > 0:
        fbar = fbar / wsum
        for x in range(4):
            ok = (obs == x).all(axis=0)
            pr = np.where(ok, pinv * fbar[x], 0.0)
            tot += pr
            for i in range(len(internals)):
                acc[i, np.arange(n_sites), x] += pr
    return acc / tot[None, :, None]


def test_model_mixture_marginal_posteriors_match_enumeration():
    """ModelMixtureEngine with per-category kappa AND freqs: ancestral
    posteriors must match the exhaustive sum over assignments."""
    tree = parse_newick(NWK)
    f1 = np.array([0.25, 0.25, 0.25, 0.25])
    f2 = np.array([0.4, 0.1, 0.2, 0.3])
    mixture = [
        {"kappa": 2.0, "freqs": f1},
        {"kappa": 6.0, "freqs": f2},
    ]
    eng = ModelMixtureEngine(tree, ALN, models.HKY85, mixture,
                             dtype="float64")
    post = ancestral_posteriors(eng)

    cats = [
        (oracle.hky85(2.0, f1).q, f1, 0.5, 1.0),
        (oracle.hky85(6.0, f2).q, f2, 0.5, 1.0),
    ]
    gold = _enum_marginal(tree, ALN, cats)
    np.testing.assert_allclose(post, gold, atol=1e-8)


def test_invariant_sites_marginal_posteriors_match_enumeration():
    """+I engines: the invariant component must participate in the
    marginal state posteriors (it forces every node to the constant
    state on compatible sites)."""
    tree = parse_newick(NWK)
    ncat, pinv, alpha, kappa = 2, 0.3, 0.7, 2.5
    eng = LikelihoodEngine(tree, ALN, models.HKY85, ncat=ncat,
                           invariant_sites=True, dtype="float64")
    params = {"model": {"kappa": kappa}, "alpha": alpha, "pinv": pinv}
    post = ancestral_posteriors(eng, params)

    m = oracle.hky85(kappa, [0.25] * 4)
    rates = oracle.discrete_gamma(alpha, ncat)
    cats = [(m.q, m.freqs, 1.0 / ncat, r) for r in rates]
    gold = _enum_marginal(tree, ALN, cats, pinv=pinv)
    np.testing.assert_allclose(post, gold, atol=1e-8)
    # constant columns: the posterior mass concentrates harder on the
    # observed state than without +I
    post_no_i = ancestral_posteriors(
        LikelihoodEngine(tree, ALN, models.HKY85, ncat=ncat,
                         dtype="float64"),
        {"model": {"kappa": kappa}, "alpha": alpha},
    )
    const_col = 4                       # column of all 'A'
    assert (post[:, const_col, 0] >= post_no_i[:, const_col, 0] - 1e-12).all()


def test_model_mixture_joint_matches_enumeration():
    """Joint reconstruction on a model mixture (per-category freqs)."""
    tree = parse_newick(NWK)
    f1 = np.array([0.25, 0.25, 0.25, 0.25])
    f2 = np.array([0.4, 0.1, 0.2, 0.3])
    mixture = [
        {"kappa": 2.0, "freqs": f1},
        {"kappa": 6.0, "freqs": f2},
    ]
    eng = ModelMixtureEngine(tree, ALN, models.HKY85, mixture,
                             dtype="float64")
    res = joint_ancestral_states(eng)

    obs = np.array([[CHARMAP[c] for c in ALN[n]]
                    for n in tree.leaf_names])
    n_nodes = len(tree.parent)
    n_leaves = tree.n_leaves
    internals = list(range(n_leaves, n_nodes))
    root = n_nodes - 1
    n_sites = obs.shape[1]
    best_lp = np.full(n_sites, -np.inf)
    best_states = np.zeros((len(internals), n_sites), int)
    for k, (kap, fr) in enumerate([(2.0, f1), (6.0, f2)]):
        q = oracle.hky85(kap, fr).q
        p_edge = [scipy.linalg.expm(q * tree.lengths[v])
                  for v in range(n_nodes)]
        for assign in itertools.product(range(4), repeat=len(internals)):
            st = dict(zip(internals, assign))
            lp = np.full(n_sites, np.log(0.5) + np.log(fr[st[root]]))
            for v in range(n_nodes):
                if v == root:
                    continue
                par = st[tree.parent[v]]
                lp += np.log(p_edge[v][par, obs[v]] if v < n_leaves
                             else p_edge[v][par, st[v]])
            b = lp > best_lp
            best_lp = np.where(b, lp, best_lp)
            for i, v in enumerate(internals):
                best_states[i] = np.where(b, st[v], best_states[i])
    np.testing.assert_allclose(res["log_prob"], best_lp, rtol=1e-8)
    np.testing.assert_array_equal(res["states"], best_states)


def test_partitioned_engine_raises_cleanly():
    import jax as _jax

    from phylo_utils_tpu.partition import Partition, PartitionedEngine

    tree = parse_newick(NWK)
    eng = PartitionedEngine(
        tree,
        [Partition("p1", ALN, models.JC69),
         Partition("p2", ALN, models.K80)],
    )
    with pytest.raises(NotImplementedError):
        ancestral_posteriors(eng)
    with pytest.raises(NotImplementedError):
        joint_ancestral_states(eng)


def test_simulation_setup_rejects_non_base_engines():
    """parametric_bootstrap / goldman_cox_test must refuse engines whose
    parameterization simulate_alignment can't generate under (review
    r3b: they used to silently simulate with factory defaults)."""
    import jax as _jax

    from phylo_utils_tpu.clock import ClockEngine
    from phylo_utils_tpu.mixtures import M1aEngine
    from phylo_utils_tpu.model_selection import goldman_cox_test
    from phylo_utils_tpu.optimize import parametric_bootstrap
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import random_tree

    tree = random_tree(5, seed=1)
    caln = simulate_alignment(_jax.random.key(1), tree, models.GY94, 30,
                              params={"omega": 0.3})
    daln = simulate_alignment(_jax.random.key(2), tree, models.K80, 60)
    for eng in (M1aEngine(tree, caln, ncat=1),
                ClockEngine(tree, daln, models.K80)):
        with pytest.raises(ValueError, match="base LikelihoodEngine"):
            parametric_bootstrap(eng, n_replicates=1)
        with pytest.raises(ValueError, match="base LikelihoodEngine"):
            goldman_cox_test(eng, n_replicates=1)


def test_subclass_full_params_typo_guard():
    """Every engine family rejects misspelled parameter keys (review
    r3b: only the base engine validated)."""
    import jax as _jax

    from phylo_utils_tpu.clock import ClockEngine
    from phylo_utils_tpu.mixtures import M1aEngine
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import random_tree

    tree = random_tree(5, seed=1)
    caln = simulate_alignment(_jax.random.key(1), tree, models.GY94, 30,
                              params={"omega": 0.3})
    daln = simulate_alignment(_jax.random.key(2), tree, models.K80, 60)
    m1a = M1aEngine(tree, caln, ncat=1)
    ce = ClockEngine(tree, daln, models.K80)
    with pytest.raises(ValueError, match="unknown parameter"):
        m1a._full_params({"hieght": 1.0})
    with pytest.raises(ValueError, match="unknown parameter"):
        ce._full_params({"root_hieght": 1.0})
    with pytest.raises(ValueError, match="unknown 'shared'"):
        m1a._full_params({"shared": {"kapa": 2.0}})
