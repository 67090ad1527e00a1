"""Joint ML ancestral reconstruction (Pupko 2000 max-product DP) vs
exhaustive enumeration of all internal-state assignments."""
import itertools

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

NWK = "((a:0.12,b:0.34):0.08,(c:0.21,d:0.05):0.15);"
ALN = {
    "a": "ACGTACGTGGAATTCCGGTA",
    "b": "ACGTTGCAGGAATCCCGGTA",
    "c": "AGGTACGAGTATTTCCGCTA",
    "d": "ACGAACGTATAATTGCGGTA",
}


def _brute_force_joint(tree, aln, q, pi, rates, weights):
    """Enumerate every internal-state assignment x category; return the
    max log joint prob and argmax states per site."""
    n_leaves = tree.n_leaves
    n_nodes = len(tree.parent)
    internals = list(range(n_leaves, n_nodes))
    leaf_names = tree.leaf_names
    charmap = {"A": 0, "C": 1, "G": 2, "T": 3}
    obs = np.array(
        [[charmap[ch] for ch in aln[nm]] for nm in leaf_names]
    )  # (L, sites)
    n_sites = obs.shape[1]
    root = n_nodes - 1

    best_lp = np.full(n_sites, -np.inf)
    best_states = np.zeros((len(internals), n_sites), int)
    for k, r in enumerate(rates):
        p_edge = [
            scipy.linalg.expm(q * tree.lengths[v] * r)
            for v in range(n_nodes)
        ]
        for assign in itertools.product(range(4), repeat=len(internals)):
            st = dict(zip(internals, assign))
            lp = np.full(n_sites, np.log(weights[k]) + np.log(pi[st[root]]))
            for v in range(n_nodes):
                if v == root:
                    continue
                par = st[tree.parent[v]]
                if v < n_leaves:
                    lp += np.log(p_edge[v][par, obs[v]])
                else:
                    lp += np.log(p_edge[v][par, st[v]])
            better = lp > best_lp
            best_lp = np.where(better, lp, best_lp)
            for i, v in enumerate(internals):
                best_states[i] = np.where(better, st[v], best_states[i])
    return best_lp, best_states


@pytest.mark.parametrize("ncat", [1, 2])
def test_joint_matches_brute_force(ncat):
    tree = parse_newick(NWK)
    engine = LikelihoodEngine(
        tree, ALN, models.HKY85, ncat=ncat, dtype="float64"
    )
    params = {"model": {"kappa": 2.5}}
    if ncat > 1:
        params["alpha"] = 0.7
    res = joint_ancestral_states(engine, params)

    m = oracle.hky85(2.5, [0.25] * 4)
    rates = (
        oracle.discrete_gamma(0.7, ncat) if ncat > 1 else np.ones(1)
    )
    gold_lp, gold_states = _brute_force_joint(
        tree, ALN, m.q, m.freqs, rates, np.full(ncat, 1.0 / ncat)
    )
    np.testing.assert_allclose(res["log_prob"], gold_lp, rtol=1e-8)
    # ties between assignments are broken arbitrarily; compare log prob
    # of the RETURNED assignment instead of the argmax indices where the
    # optimum is unique, states must match
    np.testing.assert_array_equal(res["states"], gold_states)


def test_joint_log_prob_bounded_by_marginal_likelihood():
    """The joint max log P(states, data) can never exceed the per-site
    log P(data) (which sums over all assignments)."""
    tree = parse_newick(NWK)
    engine = LikelihoodEngine(tree, ALN, models.GTR, ncat=3,
                              dtype="float64")
    res = joint_ancestral_states(engine)
    sw = engine.sitewise_loglikelihoods()
    assert (res["log_prob"] <= sw + 1e-9).all()
    # and the joint states should usually agree with the marginal MAP on
    # strongly-determined sites (sanity, not an identity)
    post = ancestral_posteriors(engine)
    strong = post.max(axis=2).min(axis=0) > 0.95
    if strong.any():
        agree = (post.argmax(axis=2) == res["states"])[:, strong]
        assert agree.mean() > 0.9


def test_joint_with_invariant_sites_matches_brute_force():
    """+I engines: the invariant component (identity P, weight pinv)
    competes in the joint maximization; gamma categories carry weight
    (1-pinv)*w_k. Category == ncat flags +I wins. Checked against
    exhaustive enumeration over (component, assignment)."""
    tree = parse_newick(NWK)
    aln = {  # several constant-'A' columns so +I actually wins some
        "a": "ACGTAAGTGGAATTCCGGTA",
        "b": "ACGTAGCAGGAATCCCGGTA",
        "c": "AGGTAAGAGTATTTCCGCTA",
        "d": "ACGAAAGTATAATTGCGGTA",
    }
    ncat, pinv = 2, 0.3
    engine = LikelihoodEngine(tree, aln, models.HKY85, ncat=ncat,
                              invariant_sites=True, dtype="float64")
    params = {"model": {"kappa": 2.5}, "alpha": 0.7, "pinv": pinv}
    res = joint_ancestral_states(engine, params)

    m = oracle.hky85(2.5, [0.25] * 4)
    rates = oracle.discrete_gamma(0.7, ncat)
    charmap = {"A": 0, "C": 1, "G": 2, "T": 3}
    obs = np.array([[charmap[c] for c in aln[n]] for n in tree.leaf_names])
    n_nodes = len(tree.parent)
    n_leaves = tree.n_leaves
    internals = list(range(n_leaves, n_nodes))
    root = n_nodes - 1
    n_sites = obs.shape[1]
    best_lp = np.full(n_sites, -np.inf)
    best_states = np.zeros((len(internals), n_sites), int)
    best_cat = np.zeros(n_sites, int)
    for k, r in enumerate(rates):
        p_edge = [scipy.linalg.expm(m.q * tree.lengths[v] * r)
                  for v in range(n_nodes)]
        for assign in itertools.product(range(4), repeat=len(internals)):
            st = dict(zip(internals, assign))
            lp = np.full(
                n_sites,
                np.log((1 - pinv) / ncat) + np.log(m.freqs[st[root]]),
            )
            for v in range(n_nodes):
                if v == root:
                    continue
                par = st[tree.parent[v]]
                lp += np.log(p_edge[v][par, obs[v]] if v < n_leaves
                             else p_edge[v][par, st[v]])
            b = lp > best_lp
            best_lp = np.where(b, lp, best_lp)
            best_cat = np.where(b, k, best_cat)
            for i, v in enumerate(internals):
                best_states[i] = np.where(b, st[v], best_states[i])
    for x in range(4):
        ok = (obs == x).all(axis=0)
        lp = np.where(ok, np.log(pinv) + np.log(m.freqs[x]), -np.inf)
        b = lp > best_lp
        best_lp = np.where(b, lp, best_lp)
        best_cat = np.where(b, ncat, best_cat)
        for i in range(len(internals)):
            best_states[i] = np.where(b, x, best_states[i])

    np.testing.assert_allclose(res["log_prob"], best_lp, rtol=1e-8)
    np.testing.assert_array_equal(res["states"], best_states)
    np.testing.assert_array_equal(res["category"], best_cat)
    assert (res["category"] == ncat).any()        # +I actually won sites
    sw = engine.sitewise_loglikelihoods(params)
    assert (res["log_prob"] <= sw + 1e-9).all()


def test_site_rates_orders_conserved_vs_variable():
    """Posterior-mean rates: a constant column must get a lower rate
    estimate than a maximally-variable column."""
    from phylo_utils_tpu.ancestral import site_rates

    tree = parse_newick(NWK)
    aln = {
        "a": "AAAA" + "ACGT",
        "b": "AAAA" + "CGTA",
        "c": "AAAA" + "GTAC",
        "d": "AAAA" + "TACG",
    }
    engine = LikelihoodEngine(tree, aln, models.JC69, ncat=4,
                              dtype="float64")
    r = site_rates(engine)
    assert r.shape == (8,)
    assert r[:4].max() < r[4:].min()
    # posterior-mean rates average to ~1 under the prior-normalized mixture
    assert 0.1 < r.mean() < 3.0


def test_joint_category_field_shape():
    tree = parse_newick(NWK)
    engine = LikelihoodEngine(tree, ALN, models.JC69, ncat=4,
                              dtype="float64")
    res = joint_ancestral_states(engine)
    n_sites = len(ALN["a"])
    assert res["states"].shape == (3, n_sites)
    assert res["log_prob"].shape == (n_sites,)
    assert res["category"].shape == (n_sites,)
    assert res["category"].min() >= 0 and res["category"].max() < 4
