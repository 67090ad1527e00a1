"""Fixed-width regrouped pruning schedules (VERDICT r4 item 6).

``trees.regroup_schedule`` re-packs the height-level grid into Hu-
scheduled fixed-width groups; ``choose_regroup_width`` picks the padded-
area-minimizing width per candidate set (0 keeps levels). Must be
logL/grad-exact and actually cut the padding on the shapes APPBENCH
measured at 14–22% fill.
"""
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.batched import (
    TopologySetEngine,
    choose_regroup_width,
    optimize_branch_lengths,
)
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.trees import (
    compile_schedule,
    nni_neighbors,
    random_tree,
    regroup_schedule,
    schedule_fill,
)


def test_regroup_schedule_is_valid_and_complete():
    for n_taxa in (8, 33, 64):
        sched = compile_schedule(random_tree(n_taxa, seed=1))
        for u in (2, 4, 7):
            rg = regroup_schedule(sched, u)
            assert rg.width == u
            assert rg.n_nodes == sched.n_nodes
            assert rg.root == sched.root
            # every internal combine appears exactly once
            real = rg.level_nodes[rg.level_nodes < rg.n_nodes]
            real0 = sched.level_nodes[sched.level_nodes < sched.n_nodes]
            assert sorted(real.tolist()) == sorted(real0.tolist())
            # dependency: every child is a leaf or scheduled earlier
            seen = set()
            for g in range(rg.n_levels):
                row = set()
                for w in range(u):
                    node = int(rg.level_nodes[g, w])
                    if node >= rg.n_nodes:
                        continue
                    for c in range(rg.n_children_max):
                        if rg.level_childmask[g, w, c] > 0:
                            ch = int(rg.level_children[g, w, c])
                            if ch in real0.tolist():
                                assert ch in seen, (g, node, ch)
                    row.add(node)
                seen |= row


def test_fill_factor_improves_on_nni_sets():
    tree = random_tree(64, seed=0)
    scheds = [compile_schedule(t) for t in [tree] + nni_neighbors(tree)]
    fill0 = schedule_fill(scheds)
    u, rg = choose_regroup_width(scheds)
    fill1 = schedule_fill(rg)
    assert fill0 < 0.35                     # the r4 problem
    assert u > 0
    assert fill1 >= 0.4, (u, fill0, fill1)  # the r5 'done' gate
    assert fill1 > fill0 * 1.5


def test_caterpillar_keeps_level_grid():
    """Pectinate tree: the critical path IS the walk — grouping can only
    add padding, so auto must keep the level grid."""
    nwk = "(a:1,b:1)"
    for i in range(9):
        nwk = f"({nwk}:1,t{i}:1)"
    nwk += ";"
    from phylo_utils_tpu.io import parse_newick

    sched = compile_schedule(parse_newick(nwk))
    u, _ = choose_regroup_width([sched])
    assert u == 0


@pytest.fixture(scope="module")
def setup():
    import jax

    tree = random_tree(12, seed=5)
    aln = simulate_alignment(jax.random.PRNGKey(2), tree, models.HKY85,
                             n_sites=250)
    return tree, aln


def test_tse_regrouped_matches_level_grid(setup):
    tree, aln = setup
    cands = [tree] + nni_neighbors(tree)[:6]
    level = TopologySetEngine(cands, aln, models.HKY85, ncat=2, regroup=0)
    auto = TopologySetEngine(cands, aln, models.HKY85, ncat=2,
                             regroup="auto")
    assert auto._regroup_u > 0       # these shapes should regroup
    np.testing.assert_allclose(level.loglikelihoods(),
                               auto.loglikelihoods(), rtol=1e-10)
    import jax

    for a, b in zip(jax.tree.leaves(level.gradients()),
                    jax.tree.leaves(auto.gradients())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
    ll_l, bl_l = optimize_branch_lengths(level, steps=10)
    ll_a, bl_a = optimize_branch_lengths(auto, steps=10)
    np.testing.assert_allclose(ll_l, ll_a, rtol=1e-9)
    np.testing.assert_allclose(bl_l, bl_a, rtol=1e-6, atol=1e-9)
