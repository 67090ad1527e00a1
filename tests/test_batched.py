"""Topology-set batching: one program scoring many candidate trees."""
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.batched import TopologySetEngine, pad_schedules
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.trees import compile_schedule, random_tree


def _aln(names, sites, seed=0):
    rng = np.random.default_rng(seed)
    return {n: "".join(rng.choice(list("ACGT"), size=sites)) for n in names}


@pytest.fixture(scope="module")
def tree_set():
    # distinct random topologies over the SAME taxa
    trees = [random_tree(8, seed=s) for s in range(6)]
    names = trees[0].leaf_names
    # random_tree names leaves t0..t7 in all of them, but leaf-id order
    # differs per topology — exactly what the permutation handles.
    aln = _aln(names, 120, seed=9)
    return trees, aln


def test_batched_matches_per_tree_engines(tree_set):
    trees, aln = tree_set
    tse = TopologySetEngine(trees, aln, models.GTR, ncat=4)
    batched = tse.loglikelihoods()
    singles = np.asarray([
        LikelihoodEngine(t, aln, models.GTR, ncat=4).loglikelihood()
        for t in trees
    ])
    np.testing.assert_allclose(batched, singles, rtol=1e-10, atol=1e-8)
    assert tse.best() == int(np.argmax(singles))


def test_batched_gradients_match_single(tree_set):
    trees, aln = tree_set
    tse = TopologySetEngine(trees, aln, models.HKY85, ncat=2)
    g = tse.gradients()
    assert g["branch_lengths"].shape == (len(trees), trees[0].n_nodes)
    for b in (0, 3):
        single = LikelihoodEngine(trees[b], aln, models.HKY85, ncat=2)
        gs = single.gradient()["branch_lengths"]
        np.testing.assert_allclose(
            np.asarray(g["branch_lengths"][b]), np.asarray(gs),
            rtol=1e-8, atol=1e-10,
        )


def test_batched_param_override(tree_set):
    trees, aln = tree_set
    tse = TopologySetEngine(trees, aln, models.K80)
    base = tse.loglikelihoods()
    scaled = tse.loglikelihoods({
        "branch_lengths": tse.default_params()["branch_lengths"] * 2.0,
        "model": {"kappa": 4.0},
    })
    assert not np.allclose(base, scaled)


def test_pad_schedules_rejects_mixed_taxa():
    with pytest.raises(ValueError):
        pad_schedules([
            compile_schedule(random_tree(4, seed=0)),
            compile_schedule(random_tree(5, seed=0)),
        ])
