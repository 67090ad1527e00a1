"""Chunk-boundary branches of the batched application layer (VERDICT r4).

Production APPBENCH runs exercise multi-chunk + padded-tail code paths
(``chunked_brlen_optimize`` with more candidates than ``batch_chunk``,
``bootstrap_tree_support``'s ``rep_chunk`` padding) that small test trees
never hit — ``chunk = min(batch_chunk, n) = n`` and ``pad_n = 0``. These
tests force tiny chunks so the padded-tail trim and the cross-chunk
concatenation are covered by the suite, asserting equality with the
unchunked path.
"""
import jax
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.batched import chunked_brlen_optimize, nni_hill_climb
from phylo_utils_tpu.simulate import simulate_alignment
from phylo_utils_tpu.supports import alrt_supports, bootstrap_tree_support
from phylo_utils_tpu.trees import (
    nni_neighbors,
    random_tree,
    robinson_foulds,
)


@pytest.fixture(scope="module")
def setup():
    tree = random_tree(8, seed=7)
    aln = simulate_alignment(jax.random.PRNGKey(3), tree, models.HKY85,
                             n_sites=300)
    return tree, aln


def test_chunked_brlen_matches_unchunked(setup):
    tree, aln = setup
    cands = [tree] + nni_neighbors(tree)[:4]      # 5 candidates
    assert len(cands) == 5
    # chunk=2 -> chunks of [2, 2, 1+1 pad]: multi-chunk AND padded tail
    lls_c, bls_c, sw_c, _ = chunked_brlen_optimize(
        cands, aln, models.HKY85, ncat=2, steps=12, batch_chunk=2,
    )
    lls_u, bls_u, sw_u, _ = chunked_brlen_optimize(
        cands, aln, models.HKY85, ncat=2, steps=12, batch_chunk=None,
    )
    assert lls_c.shape == (5,) and lls_u.shape == (5,)
    np.testing.assert_allclose(lls_c, lls_u, rtol=1e-10)
    np.testing.assert_allclose(bls_c, bls_u, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(sw_c, sw_u, rtol=1e-10)


def test_chunked_engine_reuse_is_exact(setup):
    """Second call reusing the engine (swapped schedules, same compiled
    program) must match a fresh engine bit-for-bit."""
    tree, aln = setup
    nbrs = nni_neighbors(tree)
    set_a = [tree] + nbrs[:3]
    set_b = [nbrs[4]] + nbrs[5:8]
    lls_a, _, _, eng = chunked_brlen_optimize(
        set_a, aln, models.HKY85, steps=10, batch_chunk=4,
    )
    lls_b_reused, _, _, _ = chunked_brlen_optimize(
        set_b, aln, models.HKY85, steps=10, batch_chunk=4, engine=eng,
    )
    lls_b_fresh, _, _, _ = chunked_brlen_optimize(
        set_b, aln, models.HKY85, steps=10, batch_chunk=4,
    )
    np.testing.assert_array_equal(lls_b_reused, lls_b_fresh)
    # and the reused engine didn't corrupt set-A scoring
    lls_a2, _, _, _ = chunked_brlen_optimize(
        set_a, aln, models.HKY85, steps=10, batch_chunk=4, engine=eng,
    )
    np.testing.assert_array_equal(lls_a, lls_a2)


def test_alrt_chunked_matches_unchunked(setup):
    tree, aln = setup
    kw = dict(ncat=1, brlen_steps=15, n_boot=60, seed=11)
    small = alrt_supports(tree, aln, models.HKY85, batch_topologies=2, **kw)
    full = alrt_supports(tree, aln, models.HKY85, batch_topologies=None,
                         **kw)
    assert small["edges"] == full["edges"]
    np.testing.assert_allclose(small["stat"], full["stat"],
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(small["alrt"], full["alrt"],
                               rtol=1e-8, atol=1e-10)


def test_nni_hill_climb_chunked_matches_unchunked(setup):
    tree, aln = setup
    start = nni_neighbors(tree)[0]
    t_c, ll_c, r_c = nni_hill_climb(
        start, aln, models.HKY85, brlen_steps=15, max_rounds=3,
        batch_topologies=3,
    )
    t_u, ll_u, r_u = nni_hill_climb(
        start, aln, models.HKY85, brlen_steps=15, max_rounds=3,
        batch_topologies=None,
    )
    assert r_c == r_u
    assert abs(ll_c - ll_u) < 1e-8
    assert robinson_foulds(t_c, t_u) == 0.0


def test_bootstrap_rep_chunk_padding(setup):
    """Non-dividing n_reps (7 reps, chunk 3 -> pad 2 in the tail chunk):
    supports must be identical to the single-chunk run."""
    tree, aln = setup
    kw = dict(n_reps=7, seed=5)
    chunked = bootstrap_tree_support(tree, aln, models.JC69, rep_chunk=3,
                                     **kw)
    whole = bootstrap_tree_support(tree, aln, models.JC69, rep_chunk=7,
                                   **kw)
    assert chunked["n_reps"] == whole["n_reps"] == 7
    assert chunked["edges"] == whole["edges"]
    np.testing.assert_array_equal(chunked["support"], whole["support"])
