"""Transfer Bootstrap Expectation (Lemoine et al. 2018) properties."""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.io import parse_newick
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.supports import (
    bootstrap_tree_support,
    transfer_bootstrap_supports,
)
from phylo_utils_tpu.trees import nni_neighbors, random_tree


def test_tbe_identical_replicates_give_full_support():
    t = random_tree(10, seed=4)
    out = transfer_bootstrap_supports(t, [t, t, t])
    assert out["n_reps"] == 3
    np.testing.assert_allclose(out["support"], 1.0)


def test_tbe_at_least_fbp_and_cherry_equality():
    """TBE >= Felsenstein bootstrap proportion edge-wise; equal on
    cherries (p = 2, where transfer distance is 0/1)."""
    t = random_tree(12, seed=7)
    reps = [t] * 3 + nni_neighbors(t)[:5]
    out = transfer_bootstrap_supports(t, reps)
    # FBP per edge: fraction of replicates containing the exact split
    from phylo_utils_tpu.trees import _splits

    leafset = set(t.leaf_names)
    # recompute exact-match proportions over the SAME edges
    import phylo_utils_tpu.supports as sup

    leaf_index = {n: i for i, n in enumerate(sorted(t.leaf_names))}
    ind, edge_ids = sup._edge_indicators(t, leaf_index)
    rk = t.children[t.root]
    if len(rk) == 2:
        keep = [i for i, e in enumerate(edge_ids) if e != max(rk)]
        ind, edge_ids = ind[keep], [edge_ids[i] for i in keep]
    rep_splitsets = [_splits(r) for r in reps]
    anchor = min(leafset)

    def canon(vec):
        names = {nm for nm, i in leaf_index.items() if vec[i]}
        return frozenset(names if anchor not in names
                         else leafset - names)

    fbp = np.array([
        np.mean([canon(ind[i]) in rs for rs in rep_splitsets])
        for i in range(len(edge_ids))
    ])
    assert list(out["edges"]) == edge_ids
    assert (out["support"] >= fbp - 1e-12).all()
    sizes = ind.sum(axis=1)
    p = np.minimum(sizes, len(leafset) - sizes)
    cherry = p == 2
    if cherry.any():
        np.testing.assert_allclose(out["support"][cherry], fbp[cherry])


def test_tbe_star_replicates_low_support():
    """Replicates that contradict every split drive TBE to its floor
    (0 <= TBE < 1)."""
    t = parse_newick("(((a:1,b:1):1,(c:1,d:1):1):1,((e:1,f:1):1,(g:1,h:1):1):1);")
    t2 = parse_newick("(((a:1,h:1):1,(c:1,f:1):1):1,((e:1,d:1):1,(g:1,b:1):1):1);")
    out = transfer_bootstrap_supports(t, [t2])
    assert (out["support"] < 1.0).all()
    assert (out["support"] >= 0.0).all()


def test_bootstrap_tree_support_tbe_integration():
    tree = random_tree(8, seed=3, mean_brlen=0.3)
    aln = simulate_alignment(jax.random.key(2), tree, models.JC69, 600)
    out = bootstrap_tree_support(tree, aln, models.JC69, n_reps=15,
                                 tbe=True)
    assert out["tbe"].shape == out["support"].shape
    assert (out["tbe"] >= out["support"] - 1e-12).all()


def test_tbe_rejects_taxon_mismatch():
    a = random_tree(6, seed=1)
    b = random_tree(7, seed=1)
    with pytest.raises(ValueError):
        transfer_bootstrap_supports(a, [b])
