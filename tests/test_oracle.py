"""Validate the numpy oracle itself against closed forms and first principles.

The oracle is the golden source for the JAX engine (reference mount empty,
SURVEY.md §0), so it must itself be verified independently: closed-form JC69
transition probabilities, Markov/reversibility properties, and discrete-gamma
rates against direct numerical integration of the gamma density.
"""
import numpy as np
import pytest
from scipy import integrate
from scipy.stats import gamma as gamma_dist

import oracle
from phylo_utils_tpu.io import parse_newick


def test_jc69_pmatrix_closed_form():
    m = oracle.jc69()
    for t in [0.0, 0.01, 0.1, 0.5, 2.0]:
        p = oracle.pmat(m, t)
        same = 0.25 + 0.75 * np.exp(-4.0 * t / 3.0)
        diff = 0.25 - 0.25 * np.exp(-4.0 * t / 3.0)
        expected = np.full((4, 4), diff)
        np.fill_diagonal(expected, same)
        np.testing.assert_allclose(p, expected, atol=1e-12)


def test_k80_pmatrix_closed_form():
    # Kimura 1980 closed form with Q normalized to mean rate 1:
    # transition prob uses exp(-t(a+b)') terms; derive via alpha/beta rates.
    kappa = 4.0
    m = oracle.k80(kappa)
    # normalized: beta = 1/(kappa+2)? With freqs 1/4: mean rate
    # = sum_i pi_i * (kappa+2)*beta_unnorm ... easier: read off Q.
    beta = -m.q[0, 1]  # wait: q[0,1] is positive off-diagonal
    beta = m.q[0, 1]
    alpha = m.q[0, 2]
    t = 0.37
    p = oracle.pmat(m, t)
    e1 = np.exp(-4 * beta * t)
    e2 = np.exp(-2 * (alpha + beta) * t)
    p_same = 0.25 + 0.25 * e1 + 0.5 * e2
    p_transition = 0.25 + 0.25 * e1 - 0.5 * e2
    p_transversion = 0.25 - 0.25 * e1
    np.testing.assert_allclose(p[0, 0], p_same, atol=1e-12)
    np.testing.assert_allclose(p[0, 2], p_transition, atol=1e-12)
    np.testing.assert_allclose(p[0, 1], p_transversion, atol=1e-12)


@pytest.mark.parametrize(
    "model",
    [
        oracle.jc69(),
        oracle.k80(3.0),
        oracle.f81([0.3, 0.2, 0.3, 0.2]),
        oracle.hky85(2.5, [0.35, 0.15, 0.25, 0.25]),
        oracle.f84(1.5, [0.3, 0.25, 0.2, 0.25]),
        oracle.tn93(2.0, 3.0, 1.0, [0.1, 0.4, 0.2, 0.3]),
        oracle.gtr([1.5, 4.0, 0.8, 1.2, 5.0, 1.0], [0.35, 0.2, 0.18, 0.27]),
        oracle.lg(),
        oracle.wag(),
    ],
    ids=lambda m: m.name,
)
def test_markov_properties(model):
    q, pi = model.q, model.freqs
    # rows of Q sum to zero; mean rate normalized to 1
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(-(pi * np.diag(q)).sum(), 1.0, atol=1e-10)
    # detailed balance (reversibility): pi_i q_ij == pi_j q_ji
    np.testing.assert_allclose(pi[:, None] * q, (pi[:, None] * q).T, atol=1e-12)
    # P(t) stochastic; P(0)=I; Chapman-Kolmogorov; stationarity
    p1 = oracle.pmat(model, 0.13)
    p2 = oracle.pmat(model, 0.29)
    np.testing.assert_allclose(p1.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(oracle.pmat(model, 0.0), np.eye(len(pi)), atol=1e-12)
    np.testing.assert_allclose(p1 @ p2, oracle.pmat(model, 0.42), atol=1e-10)
    np.testing.assert_allclose(pi @ p1, pi, atol=1e-12)


def test_unrest_stationary():
    m = oracle.unrest([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    np.testing.assert_allclose(m.q.sum(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(m.freqs @ m.q, 0.0, atol=1e-12)
    np.testing.assert_allclose(m.freqs.sum(), 1.0, atol=1e-12)


def test_two_taxon_jc69_closed_form_likelihood():
    t1, t2 = 0.12, 0.34
    d = t1 + t2
    tree = parse_newick(f"(a:{t1},b:{t2});")
    aln = {"a": "ACGTAC", "b": "ACGTTG"}
    got = oracle.loglikelihood(tree, aln, oracle.jc69())
    same = 0.25 * (0.25 + 0.75 * np.exp(-4 * d / 3))
    diff = 0.25 * (0.25 - 0.25 * np.exp(-4 * d / 3))
    expected = 4 * np.log(same) + 2 * np.log(diff)
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_pruning_invariant_to_root_placement():
    # Reversible models: logL identical for any rooting of the same unrooted tree.
    aln = {"a": "ACGTACGTGG", "b": "ACGTTGCAGG", "c": "AGGTACGAGT", "d": "ACGAACGTAT"}
    m = oracle.gtr([1.5, 4.0, 0.8, 1.2, 5.0, 1.0], [0.35, 0.2, 0.18, 0.27])
    t_rooted = parse_newick("((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);")
    # same unrooted tree, trifurcating root at the internal node:
    t_unrooted = parse_newick("(a:0.1,b:0.2,(c:0.3,d:0.15):0.12);")
    l1 = oracle.loglikelihood(t_rooted, aln, m)
    l2 = oracle.loglikelihood(t_unrooted, aln, m)
    np.testing.assert_allclose(l1, l2, rtol=1e-10)


def test_scaling_no_op():
    # Very long branches force heavy scaling; compare against a no-scaling
    # direct computation on a small alignment (values stay representable).
    aln = {"a": "ACGT", "b": "ACGA", "c": "GCGT", "d": "ACTT"}
    tree = parse_newick("((a:0.01,b:0.02):0.01,(c:0.03,d:0.01):0.02);")
    m = oracle.hky85(2.0, [0.3, 0.2, 0.25, 0.25])
    logl, sitewise = oracle.loglikelihood(tree, aln, m, return_sitewise=True)
    # brute-force: enumerate internal states
    import itertools

    leaves = {n: oracle.seq_to_partials(s) for n, s in aln.items()}
    # tree structure: ((a,b)x,(c,d)y)root
    la, lb = 0.01, 0.02
    lc, ld = 0.03, 0.01
    lx, ly = 0.01, 0.02
    pa, pb = oracle.pmat(m, la), oracle.pmat(m, lb)
    pc, pd = oracle.pmat(m, lc), oracle.pmat(m, ld)
    px, py = oracle.pmat(m, lx), oracle.pmat(m, ly)
    total = 0.0
    for s in range(4):
        li = 0.0
        for r in range(4):  # root state
            for x in range(4):
                for y in range(4):
                    term = (
                        m.freqs[r]
                        * px[r, x]
                        * py[r, y]
                        * (pa[x] @ leaves["a"][s])
                        * (pb[x] @ leaves["b"][s])
                        * (pc[y] @ leaves["c"][s])
                        * (pd[y] @ leaves["d"][s])
                    )
                    li += term
        total += np.log(li)
        np.testing.assert_allclose(sitewise[s], np.log(li), rtol=1e-10)
    np.testing.assert_allclose(logl, total, rtol=1e-10)


def test_discrete_gamma_against_numeric_integration():
    for alpha in [0.2, 0.5, 1.0, 2.7]:
        ncat = 4
        rates = oracle.discrete_gamma(alpha, ncat)
        assert rates.shape == (ncat,)
        np.testing.assert_allclose(rates.mean(), 1.0, rtol=1e-8)
        assert np.all(np.diff(rates) > 0)
        # independent check: integrate x * pdf over each quantile bin
        dist = gamma_dist(a=alpha, scale=1.0 / alpha)
        cuts = dist.ppf(np.arange(1, ncat) / ncat)
        edges = np.concatenate([[0.0], cuts, [np.inf]])
        for k in range(ncat):
            val, _ = integrate.quad(lambda x: x * dist.pdf(x), edges[k], edges[k + 1])
            np.testing.assert_allclose(rates[k], ncat * val, rtol=1e-6)


def test_discrete_gamma_median():
    rates = oracle.discrete_gamma(0.7, 4, median=True)
    np.testing.assert_allclose(rates.mean(), 1.0, rtol=1e-12)
    assert np.all(np.diff(rates) > 0)


def test_invariant_sites_mixture():
    aln = {"a": "AAGT", "b": "AAGA", "c": "AAGT", "d": "AATT"}
    tree = parse_newick("((a:0.1,b:0.2):0.1,(c:0.3,d:0.1):0.2);")
    m = oracle.jc69()
    pinv = 0.25
    logl, sitewise = oracle.loglikelihood(
        tree, aln, m, pinv=pinv, return_sitewise=True
    )
    # site 0 is constant 'A': L = pinv*0.25 + (1-pinv)*L_var
    _, sw_novar = oracle.loglikelihood(tree, aln, m, return_sitewise=True)
    l_var = np.exp(sw_novar)
    inv_indicator = np.array([0.25, 0.25, 0.25, 0.0])  # site 3 varies (T/A/T/T? no)
    # recompute indicator properly: product over leaves of partials
    leaves = [oracle.seq_to_partials(s) for s in aln.values()]
    prod = np.ones((4, 4))
    for lf in leaves:
        prod *= lf
    inv_indicator = prod @ m.freqs
    expected = np.log(pinv * inv_indicator + (1 - pinv) * l_var)
    np.testing.assert_allclose(sitewise, expected, rtol=1e-10)
    np.testing.assert_allclose(logl, expected.sum(), rtol=1e-10)


def test_newick_roundtrip_random_trees():
    """write_newick -> parse_newick preserves topology, names, lengths."""
    import numpy as np

    from phylo_utils_tpu.io import parse_newick, write_newick
    from phylo_utils_tpu.trees import random_tree, robinson_foulds

    for seed in range(20):
        t = random_tree(3 + seed % 17, seed=seed)
        t2 = parse_newick(write_newick(t))
        assert t2.leaf_names == t.leaf_names
        assert t2.n_nodes == t.n_nodes
        np.testing.assert_allclose(t2.lengths, t.lengths, rtol=1e-9)
        if t.n_leaves >= 4:
            assert robinson_foulds(t, t2) == 0.0


def test_newick_quoted_labels_and_comments():
    from phylo_utils_tpu.io import parse_newick

    t = parse_newick("('taxon A':0.1,[comment here](b:0.2,'it''s c':0.3):0.4);")
    assert "taxon A" in t.leaf_names and "it's c" in t.leaf_names
