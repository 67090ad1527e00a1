"""Simulation subsystem: statistical correctness and reproducibility
(reference simulation.py parity; SURVEY.md §3.5).
"""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.io import parse_newick
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.optimize import fit
from phylo_utils_tpu.simulate import (
    SequenceSimulator,
    simulate_alignment,
    simulate_states,
)
from phylo_utils_tpu.trees import random_tree


def test_reproducible_and_shapes():
    tree = random_tree(6, seed=0)
    key = jax.random.key(42)
    a1 = simulate_alignment(key, tree, models.HKY85, 50, ncat=4)
    a2 = simulate_alignment(key, tree, models.HKY85, 50, ncat=4)
    assert a1 == a2
    assert set(a1) == set(tree.leaf_names)
    assert all(len(s) == 50 for s in a1.values())
    assert set("".join(a1.values())) <= set("ACGT")


def test_root_states_follow_equilibrium():
    tree = parse_newick("(a:0.1,b:0.1);")
    freqs = [0.4, 0.3, 0.2, 0.1]
    states, _ = simulate_states(
        jax.random.key(0), tree, models.F81, 20000,
        params={"freqs": freqs},
    )
    root = np.asarray(states[tree.root])
    emp = np.bincount(root, minlength=4) / root.size
    np.testing.assert_allclose(emp, freqs, atol=0.015)


def test_substitution_fraction_matches_jc69_expectation():
    """Leaf-vs-root mismatch fraction on one branch ~ 1 - P_ii(t)."""
    t = 0.3
    tree = parse_newick(f"(a:{t},b:{t});")
    states, _ = simulate_states(jax.random.key(1), tree, models.JC69, 40000)
    st = np.asarray(states)
    p_same = 0.25 + 0.75 * np.exp(-4.0 * t / 3.0)
    for leaf in range(2):
        frac_same = np.mean(st[leaf] == st[tree.root])
        assert frac_same == pytest.approx(p_same, abs=0.01)


def test_invariant_sites_are_invariant():
    tree = random_tree(8, seed=2, mean_brlen=0.5)
    states, site_rates = simulate_states(
        jax.random.key(3), tree, models.GTR, 2000, ncat=4, pinv=0.3
    )
    st = np.asarray(states)
    inv = np.asarray(site_rates) == 0.0
    assert 0.2 < inv.mean() < 0.4
    # every invariant site has identical states across all nodes
    assert (st[:, inv] == st[tree.root, inv][None, :]).all()
    # variable-rate sites do vary somewhere
    assert (st[:, ~inv] != st[tree.root, ~inv][None, :]).any()


def test_fit_recovers_simulated_kappa():
    """End-to-end loop: simulate under K80 kappa=4, fit recovers it."""
    tree = random_tree(8, seed=4, mean_brlen=0.15)
    aln = simulate_alignment(
        jax.random.key(5), tree, models.K80, 3000, params={"kappa": 4.0}
    )
    engine = LikelihoodEngine(tree, aln, models.K80)
    res = fit(engine, max_steps=100, patience=15)
    assert float(res.params["model"]["kappa"]) == pytest.approx(4.0, rel=0.15)


def test_oo_facade():
    sim = SequenceSimulator("(a:0.1,(b:0.2,c:0.05):0.1);", models.LG, seed=7)
    aln = sim.simulate(30)
    assert set(aln) == {"a", "b", "c"}
    aln2 = sim.simulate(30)
    assert aln != aln2  # key advances between calls


def test_simulate_with_explicit_alpha():
    """Regression: params={'alpha': ...} with ncat>1 must not crash the
    model builder, and alpha must actually change site-rate dispersion."""
    tree = random_tree(6, seed=20, mean_brlen=0.3)
    _, r_small = simulate_states(
        jax.random.key(5), tree, models.JC69, 4000,
        params={"alpha": 0.05}, ncat=8,
    )
    _, r_big = simulate_states(
        jax.random.key(5), tree, models.JC69, 4000,
        params={"alpha": 50.0}, ncat=8,
    )
    assert float(np.std(np.asarray(r_small))) > float(np.std(np.asarray(r_big)))


def test_simulate_mixture_alignment():
    """Mixture simulator: correct shapes, classes recoverable by the M3
    posterior scan."""
    import numpy as np

    from phylo_utils_tpu.io import encode_codon_alignment
    from phylo_utils_tpu.mixtures import ModelMixtureEngine, omega_posteriors
    from phylo_utils_tpu.optimize import fit
    from phylo_utils_tpu.simulate import simulate_mixture_alignment
    from phylo_utils_tpu.trees import random_tree

    tree = random_tree(6, seed=3, mean_brlen=0.25)
    aln, cls = simulate_mixture_alignment(
        jax.random.key(4), tree, models.GY94, 200,
        mixture=[{"omega": 0.1}, {"omega": 4.0}],
        weights=[0.6, 0.4], shared={"kappa": 2.0},
    )
    assert cls.shape == (200,)
    assert all(len(s) == 600 for s in aln.values())  # codons -> 3 chars
    frac1 = float((cls == 1).mean())
    assert 0.2 < frac1 < 0.6
    ca = encode_codon_alignment(aln)
    eng = ModelMixtureEngine(tree, ca, models.GY94,
                             mixture=[{"omega": 0.2}, {"omega": 2.0}])
    res = fit(eng, free=("branch_lengths", "mixture", "cat_weights"),
              max_steps=50, patience=10)
    mean_w, _ = omega_posteriors(eng, res.params)
    # sites simulated under omega=4 must get higher posterior mean omega
    assert mean_w[cls == 1].mean() > mean_w[cls == 0].mean() + 0.3
