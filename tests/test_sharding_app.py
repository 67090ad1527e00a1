"""Site sharding composed with the APPLICATION layer (VERDICT r4 item 2).

Round 4's gap: ``parallel.SiteSharding`` reached only the base
``LikelihoodEngine`` — partitioned fits, topology-set scoring, the chunked
branch-length optimizer and the NNI searcher were single-device programs.
These tests assert each of those surfaces, run on the 8-virtual-CPU-device
mesh, matches its single-device result (logL, gradients, optimized branch
lengths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.batched import (
    TopologySetEngine,
    chunked_brlen_optimize,
    nni_hill_climb,
    optimize_branch_lengths,
)
from phylo_utils_tpu.parallel import SiteSharding, make_mesh
from phylo_utils_tpu.partition import Partition, PartitionedEngine
from phylo_utils_tpu.trees import nni_neighbors, random_tree


def _aln(tree, sites, seed=0):
    rng = np.random.default_rng(seed)
    return {
        n: "".join(rng.choice(list("ACGT"), size=sites))
        for n in tree.leaf_names
    }


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests must run on the 8-device CPU mesh"
    return make_mesh()


@pytest.fixture(scope="module")
def tree():
    return random_tree(10, seed=1)


def test_partitioned_sharded_logl_and_grad(mesh, tree):
    parts = [
        Partition("locus1", _aln(tree, 83, seed=2), models.GTR, ncat=2),
        Partition("locus2", _aln(tree, 61, seed=3), models.HKY85),
    ]
    single = PartitionedEngine(tree, parts)
    sharded = PartitionedEngine(tree, parts, sharding=SiteSharding(mesh))
    assert single.loglikelihood() == pytest.approx(
        sharded.loglikelihood(), rel=1e-12, abs=1e-9
    )
    per_s = single.partition_loglikelihoods()
    per_d = sharded.partition_loglikelihoods()
    for k in per_s:
        assert per_s[k] == pytest.approx(per_d[k], rel=1e-10)
    g_s, g_d = single.gradient(), sharded.gradient()
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_partitioned_sharded_fit_runs(mesh, tree):
    from phylo_utils_tpu.optimize import fit

    parts = [
        Partition("a", _aln(tree, 40, seed=4), models.JC69),
        Partition("b", _aln(tree, 56, seed=5), models.K80),
    ]
    sharded = PartitionedEngine(tree, parts, sharding=SiteSharding(mesh))
    single = PartitionedEngine(tree, parts)
    res_d = fit(sharded, max_steps=4, steps_per_call=2)
    res_s = fit(single, max_steps=4, steps_per_call=2)
    assert np.isfinite(res_d.loglik)
    assert res_d.loglik == pytest.approx(res_s.loglik, rel=1e-6)


def test_topology_set_sharded_matches(mesh, tree):
    aln = _aln(tree, 75, seed=6)     # 75 patterns-ish: forces padding
    cands = [tree] + nni_neighbors(tree)[:5]
    single = TopologySetEngine(cands, aln, models.HKY85, ncat=2)
    sharded = TopologySetEngine(cands, aln, models.HKY85, ncat=2,
                                sharding=SiteSharding(mesh))
    np.testing.assert_allclose(
        single.loglikelihoods(), sharded.loglikelihoods(),
        rtol=1e-10, atol=1e-9,
    )
    np.testing.assert_allclose(
        single.sitewise_loglikelihoods(), sharded.sitewise_loglikelihoods(),
        rtol=1e-8, atol=1e-10,
    )
    g_s, g_d = single.gradients(), sharded.gradients()
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


def test_sharded_brlen_optimize_matches(mesh, tree):
    aln = _aln(tree, 52, seed=7)
    cands = [tree] + nni_neighbors(tree)[:3]
    single = TopologySetEngine(cands, aln, models.K80)
    sharded = TopologySetEngine(cands, aln, models.K80,
                                sharding=SiteSharding(mesh))
    lls_s, bls_s = optimize_branch_lengths(single, steps=10)
    lls_d, bls_d = optimize_branch_lengths(sharded, steps=10)
    np.testing.assert_allclose(lls_s, lls_d, rtol=1e-9)
    np.testing.assert_allclose(bls_s, bls_d, rtol=1e-6, atol=1e-9)


def test_sharded_chunked_and_search(mesh, tree):
    aln = _aln(tree, 44, seed=8)
    cands = [tree] + nni_neighbors(tree)[:4]
    lls_s, _, sw_s, _ = chunked_brlen_optimize(
        cands, aln, models.JC69, steps=8, batch_chunk=2,
    )
    lls_d, _, sw_d, _ = chunked_brlen_optimize(
        cands, aln, models.JC69, steps=8, batch_chunk=2,
        sharding=SiteSharding(mesh),
    )
    np.testing.assert_allclose(lls_s, lls_d, rtol=1e-9)
    np.testing.assert_allclose(sw_s, sw_d, rtol=1e-7, atol=1e-10)

    t_s, ll_s, r_s = nni_hill_climb(
        nni_neighbors(tree)[0], aln, models.JC69, brlen_steps=8,
        max_rounds=2,
    )
    t_d, ll_d, r_d = nni_hill_climb(
        nni_neighbors(tree)[0], aln, models.JC69, brlen_steps=8,
        max_rounds=2, sharding=SiteSharding(mesh),
    )
    assert r_s == r_d
    assert ll_s == pytest.approx(ll_d, rel=1e-8)
