"""Majority-rule consensus and branch-score (Kuhner-Felsenstein) distance."""
import numpy as np
import pytest

from phylo_utils_tpu.io import parse_newick, write_newick
from phylo_utils_tpu.trees import (
    _splits,
    branch_score_distance,
    majority_rule_consensus,
    midpoint_root,
    random_tree,
    reroot,
    robinson_foulds,
)

T1 = "((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07,e:0.4);"
T2 = "((a:0.1,b:0.2):0.06,(c:0.3,e:0.15):0.07,d:0.4);"  # cd -> ce swap


def test_bsd_zero_on_self_and_reroot():
    t = random_tree(10, seed=3)
    assert branch_score_distance(t, t) == 0.0
    rr = reroot(t, 4, fraction=0.3)
    assert branch_score_distance(t, rr) == pytest.approx(0.0, abs=1e-12)
    mr = midpoint_root(t)
    assert branch_score_distance(t, mr) == pytest.approx(0.0, abs=1e-12)


def test_bsd_hand_value():
    a = parse_newick("((a:0.1,b:0.2):0.05,(c:0.3,d:0.15):0.07);")
    b = parse_newick("((a:0.1,b:0.2):0.05,(c:0.3,d:0.25):0.07);")
    # only d's leaf edge differs: |0.15-0.25| = 0.1
    assert branch_score_distance(a, b) == pytest.approx(0.1)
    # a topology difference moves whole branches between splits
    c = parse_newick("((a:0.1,c:0.3):0.05,(b:0.2,d:0.15):0.07);")
    d_ab = 0.05 + 0.07  # ab|cd split present in `a` (root edge sums)
    d_ac = 0.05 + 0.07  # ac|bd split present in `c`
    assert branch_score_distance(a, c) == pytest.approx(
        np.sqrt(d_ab ** 2 + d_ac ** 2)
    )


def test_bsd_requires_same_taxa():
    a = parse_newick("((a:1,b:1):1,c:1);")
    b = parse_newick("((a:1,b:1):1,d:1);")
    with pytest.raises(ValueError):
        branch_score_distance(a, b)


def test_consensus_of_identical_trees_is_identity():
    t = random_tree(8, seed=5)
    cons = majority_rule_consensus([t, t, t])
    assert robinson_foulds(t, cons) == 0.0
    # supports are 100 on every internal node below the root
    labels = [
        cons.names[i]
        for i in range(cons.n_leaves, cons.n_nodes - 1)
        if cons.names[i]
    ]
    assert labels and all(lb == "100" for lb in labels)
    # mean branch lengths of identical trees = the original lengths
    assert branch_score_distance(t, cons) == pytest.approx(0.0, abs=1e-12)


def test_consensus_majority_and_minority_splits():
    t1 = parse_newick(T1)
    t2 = parse_newick(T2)
    cons = majority_rule_consensus([t1, t1, t2])
    splits = _splits(cons)
    # ab|cde appears in 3/3 trees -> kept
    assert frozenset({"c", "d", "e"}) in splits or \
        frozenset({"a", "b"}) in splits
    # cd|abe appears only in 2/3 of trees? (t1 twice) -> kept (2/3 > 0.5)
    # but ce|abd (t2 only, 1/3) must be dropped
    all_sets = {frozenset(s) for s in splits}
    assert frozenset({"c", "e"}) not in all_sets
    # round-trips through newick with support labels intact
    nwk = write_newick(cons)
    back = parse_newick(nwk)
    assert robinson_foulds(cons, back) == 0.0


def test_consensus_polytomy_when_no_majority():
    # three rotations of a 4-taxon tree: every internal split appears in
    # exactly 1/3 of trees -> consensus is the star tree
    ts = [
        parse_newick("((a:1,b:1):1,(c:1,d:1):1);"),
        parse_newick("((a:1,c:1):1,(b:1,d:1):1);"),
        parse_newick("((a:1,d:1):1,(b:1,c:1):1);"),
    ]
    cons = majority_rule_consensus(ts)
    assert len(_splits(cons)) == 0          # star: no non-trivial splits
    assert cons.n_leaves == 4


def test_bootstrap_tree_support_consensus_integration():
    """bootstrap_tree_support(consensus=True) returns a consensus Tree
    over the replicate NJ trees, sharing the taxon set."""
    import jax

    from phylo_utils_tpu import models
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.supports import bootstrap_tree_support

    tree = random_tree(6, seed=2, mean_brlen=0.3)
    aln = simulate_alignment(jax.random.key(11), tree, models.JC69, 800)
    out = bootstrap_tree_support(tree, aln, models.JC69, n_reps=20,
                                 consensus=True)
    cons = out["consensus"]
    assert set(cons.leaf_names) == set(tree.leaf_names)
    # with 800 sites the generating splits should mostly be recovered
    assert out["support"].mean() > 0.5
    assert len(_splits(cons)) >= 1


def test_consensus_rejects_low_min_freq():
    t = random_tree(5, seed=1)
    with pytest.raises(ValueError):
        majority_rule_consensus([t], min_freq=0.3)
