"""KH/SH/AU topology tests on RELL resampling."""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.batched import TopologySetEngine
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.topology_tests import (
    au_test,
    kh_test,
    rell_logliks,
    sh_test,
)
from phylo_utils_tpu.trees import nni_neighbors, random_tree


@pytest.fixture(scope="module")
def sitewise_matrix():
    true_tree = random_tree(7, seed=3, mean_brlen=0.25)
    aln = simulate_alignment(jax.random.key(9), true_tree, models.K80, 2000,
                             params={"kappa": 3.0})
    candidates = [true_tree] + nni_neighbors(true_tree)[:7]
    tse = TopologySetEngine(candidates, aln, models.K80)
    return tse.sitewise_loglikelihoods({"model": {"kappa": 3.0}})


def test_sitewise_shapes_and_consistency(sitewise_matrix):
    sw = sitewise_matrix
    assert sw.shape[1] == 2000
    # per-tree sums equal total logLs ordering: tree 0 (truth) is best
    totals = sw.sum(axis=1)
    assert int(np.argmax(totals)) == 0


def test_rell_distribution(sitewise_matrix):
    boot = rell_logliks(sitewise_matrix, n_boot=200, seed=1)
    assert boot.shape == (200, sitewise_matrix.shape[0])
    totals = sitewise_matrix.sum(axis=1)
    # bootstrap means approximate observed totals
    np.testing.assert_allclose(boot.mean(axis=0), totals,
                               rtol=0, atol=3 * np.abs(totals).max() ** 0.5)


def test_kh_and_sh_reject_bad_trees_keep_truth(sitewise_matrix):
    kh = kh_test(sitewise_matrix, n_boot=500, seed=2)
    sh = sh_test(sitewise_matrix, n_boot=500, seed=2)
    assert kh["best"] == sh["best"] == 0
    assert kh["pvalue"][0] == 1.0
    assert sh["pvalue"][0] > 0.5
    # with 2000 sites and clearly worse topologies, some should be rejected
    assert (kh["pvalue"][1:] < 0.05).any()
    # SH is more conservative than KH (>= p-values up to MC noise)
    assert (sh["pvalue"] >= kh["pvalue"] - 0.1).all()
    assert (kh["delta"] >= 0).all() and kh["delta"][0] == 0


def test_au_test_supports_truth_rejects_bad(sitewise_matrix):
    au = au_test(sitewise_matrix, n_boot=600, seed=4)
    assert au["best"] == 0
    assert np.all((au["pvalue"] >= 0) & (au["pvalue"] <= 1))
    # the generating tree is not rejected; its BP mass dominates
    assert au["pvalue"][0] > 0.5
    assert au["bp"][0] > 0.5
    # clearly worse topologies are rejected at 5%
    assert (au["pvalue"][1:] < 0.05).any()
    # BP at r=1 sums to ~1 over the candidate set
    assert au["bp"].sum() == pytest.approx(1.0, abs=1e-9)


def test_au_test_near_tied_rows():
    """Two statistically indistinguishable rows split the BP mass;
    neither is rejected, and a strictly dominated third tree gets
    p ~ 0. (EXACT ties break deterministically to the lower index in
    argmax, so the tie is jittered at the per-site noise floor.)"""
    rng = np.random.default_rng(0)
    row = rng.normal(-3.0, 1.0, size=400)
    sw = np.stack([row, row + rng.normal(0, 0.05, size=400),
                   row - 0.5])
    au = au_test(sw, n_boot=400, seed=1)
    assert au["pvalue"][0] > 0.2 and au["pvalue"][1] > 0.2
    assert au["pvalue"][2] < 0.01
    assert au["bp"][2] == 0.0


def test_likelihood_mapping_clean_vs_noise():
    from phylo_utils_tpu.topology_tests import likelihood_mapping

    tree = random_tree(10, seed=5, mean_brlen=0.15)
    aln = simulate_alignment(jax.random.key(3), tree, models.K80, 800,
                             params={"kappa": 3.0})
    out = likelihood_mapping(aln, models.K80, params={"kappa": 3.0},
                             n_quartets=30, seed=1, steps=50)
    assert out["points"].shape == (30, 3)
    np.testing.assert_allclose(out["points"].sum(axis=1), 1.0, atol=1e-6)
    assert out["basins"].sum() == pytest.approx(1.0)
    assert out["resolved"] > 0.5          # tree-like signal

    rng = np.random.default_rng(0)
    noise = {n: "".join(rng.choice(list("ACGT"), size=800))
             for n in tree.leaf_names}
    out2 = likelihood_mapping(noise, models.K80, n_quartets=30, seed=1,
                              steps=50)
    assert out2["resolved"] < out["resolved"] - 0.3
