"""Pallas fused pruning kernel vs the XLA einsum path (SURVEY.md §4.4).

Runs in interpreter mode on the CPU test backend; the same kernel compiles
via Mosaic on TPU. Tolerances are f32-rounding-level because both paths do
the same math in the same order up to fusion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_utils_tpu import models
from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.ops.pallas_pruning import make_pallas_prune_fn
from phylo_utils_tpu.ops.pmatrix import p_matrices_reversible
from phylo_utils_tpu.ops.pruning import make_prune_fn
from phylo_utils_tpu.trees import compile_schedule, random_tree


def _setup(n_taxa, sites, n_states=4, seed=0, ncat=4):
    tree = random_tree(n_taxa, seed=seed)
    sched = compile_schedule(tree)
    rng = np.random.default_rng(seed)
    lp = (rng.random((n_taxa, sites, n_states)) > 0.5).astype(np.float32)
    lp = np.maximum(lp, 1e-3)
    if n_states == 4:
        sym, freqs = models.GTR.build_parts(dtype=jnp.float32)
    else:
        sym, freqs = models.LG.build_parts(dtype=jnp.float32)
    rates = jnp.linspace(0.2, 2.0, ncat, dtype=jnp.float32)
    t = jnp.asarray(tree.lengths, jnp.float32)[:, None] * rates[None, :]
    p = p_matrices_reversible(sym, freqs, t)
    return sched, p, jnp.asarray(lp)


@pytest.mark.parametrize(
    "n_taxa,sites,n_states",
    [(4, 10, 4), (8, 100, 4), (64, 300, 4), (16, 130, 20)],
)
def test_pallas_matches_xla(n_taxa, sites, n_states):
    """Parity across site counts that do and don't divide the 128 tile,
    DNA (4-state) and protein (20-state)."""
    sched, p, lp = _setup(n_taxa, sites, n_states)
    r_xla, s_xla = make_prune_fn(sched)(p, lp)
    r_pal, s_pal = make_pallas_prune_fn(sched)(p, lp)
    assert r_pal.shape == r_xla.shape
    assert s_pal.shape == s_xla.shape
    np.testing.assert_allclose(r_pal, r_xla, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(s_pal, s_xla, rtol=2e-5, atol=2e-4)


def test_pallas_gradients_match_xla():
    sched, p, lp = _setup(8, 64)
    f_xla = make_prune_fn(sched)
    f_pal = make_pallas_prune_fn(sched)

    def loss(fn, p):
        r, s = fn(p, lp)
        return jnp.sum(jnp.log(jnp.sum(r, -1)) + s)

    g_xla = jax.grad(lambda p: loss(f_xla, p))(p)
    g_pal = jax.grad(lambda p: loss(f_pal, p))(p)
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-4, atol=1e-4)


def test_engine_pallas_pruner_logl_matches_xla():
    tree = random_tree(12, seed=7)
    rng = np.random.default_rng(1)
    aln = {
        name: "".join(rng.choice(list("ACGT"), size=83))
        for name in tree.leaf_names
    }
    e_xla = LikelihoodEngine(tree, aln, models.GTR, ncat=4, dtype=jnp.float32)
    e_pal = LikelihoodEngine(
        tree, aln, models.GTR, ncat=4, dtype=jnp.float32, pruner="pallas"
    )
    ll_x = e_xla.loglikelihood()
    ll_p = e_pal.loglikelihood()
    assert abs(ll_x - ll_p) / abs(ll_x) < 1e-6


@pytest.mark.parametrize("static_max", [0, 10**6])
def test_both_schedule_lowerings_match_xla(monkeypatch, static_max):
    """Cover the scalar-prefetch fori_loop lowering (default, static_max=0)
    AND the fully-unrolled static lowering against the XLA path."""
    import phylo_utils_tpu.ops.pallas_pruning as pp

    monkeypatch.setattr(pp, "STATIC_UNROLL_MAX", static_max)
    sched, p, lp = _setup(16, 150)
    r_xla, s_xla = make_prune_fn(sched)(p, lp)
    r_dyn, s_dyn = pp.make_pallas_prune_fn(sched)(p, lp)
    np.testing.assert_allclose(r_dyn, r_xla, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(s_dyn, s_xla, rtol=2e-5, atol=2e-4)
