"""Ancestral reconstruction vs brute-force enumeration over internal states."""
import numpy as np
import pytest

import oracle.core as oracle
from phylo_utils_tpu import models
from phylo_utils_tpu.ancestral import ancestral_posteriors, site_rate_posteriors
from phylo_utils_tpu.io import parse_newick
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.alphabets import seq_to_partials


def _brute_force_posteriors(tree, aln, omodel, rates, cat_weights):
    """Exact marginal posteriors by enumerating all internal-state
    assignments and rate categories (small trees only)."""
    n_states = omodel.q.shape[0]
    leaves = {tree.leaf_index()[n]: np.asarray(seq_to_partials(s, "dna"))
              for n, s in aln.items()}
    n_sites = next(iter(leaves.values())).shape[0]
    internal = list(range(tree.n_leaves, tree.n_nodes))
    n_int = len(internal)
    post = np.zeros((n_int, n_sites, n_states))
    norm = np.zeros(n_sites)
    import itertools

    for c, rate in enumerate(rates):
        pmats = {v: oracle.pmat(omodel, tree.lengths[v] * rate)
                 for v in range(tree.n_nodes) if v != tree.root}
        for assign in itertools.product(range(n_states), repeat=n_int):
            states = dict(zip(internal, assign))
            prob = np.full(n_sites, cat_weights[c] * omodel.freqs[states[tree.root]])
            for v in range(tree.n_nodes):
                if v == tree.root:
                    continue
                pu = states[tree.parent[v]]
                if v < tree.n_leaves:
                    prob = prob * (pmats[v][pu] @ leaves[v].T)
                else:
                    prob = prob * pmats[v][pu, states[v]]
            norm += prob
            for i, v in enumerate(internal):
                post[i, :, states[v]] += prob
    return post / norm[None, :, None]


@pytest.mark.parametrize("ncat,alpha", [(1, None), (3, 0.6)])
def test_ancestral_matches_brute_force(ncat, alpha):
    tree = parse_newick("((a:0.15,b:0.3):0.1,(c:0.25,d:0.1):0.2);")
    aln = {"a": "ACGTAN", "b": "ACGTTC", "c": "AGGTAC", "d": "ACG-AC"}
    engine = LikelihoodEngine(tree, aln, models.HKY85, ncat=ncat,
                              compress=False)
    params = {"model": {"kappa": 2.5}}
    if alpha is not None:
        params["alpha"] = alpha
        rates = np.asarray(oracle.discrete_gamma(alpha, ncat))
    else:
        rates = np.array([1.0])
    post = ancestral_posteriors(engine, params)
    om = oracle.hky85(2.5, [0.25] * 4)
    brute = _brute_force_posteriors(
        tree, aln, om, rates, np.full(len(rates), 1.0 / len(rates))
    )
    assert post.shape == brute.shape
    np.testing.assert_allclose(post, brute, atol=5e-7)
    np.testing.assert_allclose(post.sum(axis=2), 1.0, atol=1e-6)


def test_site_rate_posteriors_bias():
    """Constant sites should prefer slow categories; a hyper-variable site
    should prefer fast ones."""
    tree = parse_newick("((a:0.3,b:0.3):0.2,(c:0.3,d:0.3):0.2);")
    aln = {"a": "AAAAC", "b": "AAAAG", "c": "AAAAT", "d": "AAAAA"}
    engine = LikelihoodEngine(tree, aln, models.JC69, ncat=4, compress=False)
    gam = site_rate_posteriors(engine, {"alpha": 0.5})
    assert gam.shape == (5, 4)
    np.testing.assert_allclose(gam.sum(axis=1), 1.0, atol=1e-6)
    const_rate = gam[0] @ np.asarray(oracle.discrete_gamma(0.5, 4))
    var_rate = gam[4] @ np.asarray(oracle.discrete_gamma(0.5, 4))
    assert var_rate > const_rate


def test_ancestral_map_states_are_sensible():
    """On a star-ish tree with unanimous leaves, the root posterior must
    concentrate on the observed state."""
    tree = parse_newick("((a:0.05,b:0.05):0.05,(c:0.05,d:0.05):0.05);")
    aln = {"a": "AC", "b": "AC", "c": "AC", "d": "AC"}
    engine = LikelihoodEngine(tree, aln, models.JC69, compress=False)
    post = ancestral_posteriors(engine)
    root_post = post[-1]
    assert root_post[0].argmax() == 0  # A
    assert root_post[1].argmax() == 1  # C
    assert root_post[0, 0] > 0.95
