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


def test_fused_loglik_value_and_grad_match_xla():
    """The fused site_cat_ll path (Pallas forward + Pallas BACKWARD kernel)
    must agree with the XLA engine on value, every gradient leaf, and
    sitewise output — including +I and gamma (r2: real backward pass)."""
    tree = random_tree(12, seed=11)
    rng = np.random.default_rng(3)
    aln = {
        n: "".join(rng.choice(list("ACGT-N"), size=97))
        for n in tree.leaf_names
    }
    kw = dict(ncat=4, invariant_sites=True, dtype="float32")
    e_xla = LikelihoodEngine(tree, aln, models.GTR, **kw)
    e_pal = LikelihoodEngine(tree, aln, models.GTR, pruner="pallas", **kw)
    assert e_pal._pallas_ll is not None  # fused path active
    p = e_xla.default_params()
    p["branch_lengths"] = np.abs(rng.normal(0.15, 0.1, tree.n_nodes)) + 1e-3
    lx, gx = e_xla.value_and_grad(p)
    lp, gp = e_pal.value_and_grad(p)
    assert abs(float(lx) - float(lp)) < 1e-4 * abs(float(lx))
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    for (path, a), (_, b) in zip(flat_x, flat_p):
        scale = np.max(np.abs(np.asarray(a))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=5e-4 * scale,
            err_msg=str(path),
        )
    np.testing.assert_allclose(
        e_pal.sitewise_loglikelihoods(p), e_xla.sitewise_loglikelihoods(p),
        atol=5e-5,
    )


def test_vmem_fallback_big_tree(recwarn):
    """Trees whose working set exceeds the VMEM budget must fall back to
    the XLA pruner with a warning instead of failing inside Mosaic."""
    import warnings

    from phylo_utils_tpu.ops import pallas_pruning as pp

    tree = random_tree(40, seed=5)
    rng = np.random.default_rng(5)
    aln = {n: "".join(rng.choice(list("ACGT"), size=64))
           for n in tree.leaf_names}
    old = pp.VMEM_BUDGET
    # absurdly small: nothing fits — not even the HBM-streaming kernel,
    # whose scratch is O(n_slots * tile) (~50 KiB here)
    pp.VMEM_BUDGET = 8 * 1024
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            eng = LikelihoodEngine(
                tree, aln, models.GTR, ncat=2, dtype="float32",
                pruner="pallas",
            )
        assert any("VMEM" in str(x.message) for x in w)
        assert eng._pallas_ll is None
        ref = LikelihoodEngine(tree, aln, models.GTR, ncat=2,
                               dtype="float32")
        assert abs(eng.loglikelihood() - ref.loglikelihood()) < 1e-6
    finally:
        pp.VMEM_BUDGET = old


def test_segmented_gradients_when_saveall_overflows():
    """When the whole-tree saveall/backward working set doesn't fit, the
    engine gets the SEGMENTED fused gradient path (post-order walk split
    into VMEM-sized chunks chained through boundary tensors) and its
    value/gradients still match the XLA engine."""
    from phylo_utils_tpu.ops import pallas_pruning as pp

    tree = random_tree(10, seed=9)
    rng = np.random.default_rng(9)
    aln = {n: "".join(rng.choice(list("ACGT"), size=50))
           for n in tree.leaf_names}
    sched = compile_schedule(tree)
    fwd_b = pp._working_bytes(pp.LANE, sched.n_nodes, sched.n_leaves,
                              8, "fwd")
    save_b = pp._working_bytes(pp.LANE, sched.n_nodes, sched.n_leaves,
                               8, "save")
    assert save_b > fwd_b
    segs = pp._segment_schedules(sched, 8, (fwd_b + save_b) // 2)
    assert len(segs) > 1                       # genuinely multi-segment
    old = pp.VMEM_BUDGET
    pp.VMEM_BUDGET = (fwd_b + save_b) // 2
    try:
        eng = LikelihoodEngine(tree, aln, models.GTR, ncat=2,
                               dtype="float32", pruner="pallas")
        assert eng._pallas_ll is not None      # segmented path engaged
        ref = LikelihoodEngine(tree, aln, models.GTR, ncat=2,
                               dtype="float32")
        lx, gx = ref.value_and_grad()
        lp, gp = eng.value_and_grad()
        assert abs(float(lx) - float(lp)) < 1e-4 * abs(float(lx))
        np.testing.assert_allclose(
            np.asarray(gp["branch_lengths"]),
            np.asarray(gx["branch_lengths"]), rtol=5e-3, atol=1e-3,
        )
        for key in ("rates", "freqs"):
            np.testing.assert_allclose(
                np.asarray(gp["model"][key]),
                np.asarray(gx["model"][key]), rtol=5e-3, atol=1e-3,
            )
    finally:
        pp.VMEM_BUDGET = old


def test_segmented_gradients_many_segments():
    """Deeper tree forced into many segments: the chained boundary
    cotangents (partials AND logscale routing) must reproduce XLA grads."""
    from phylo_utils_tpu.ops import pallas_pruning as pp

    tree = random_tree(40, seed=11)
    rng = np.random.default_rng(11)
    aln = {n: "".join(rng.choice(list("ACGT"), size=70))
           for n in tree.leaf_names}
    sched = compile_schedule(tree)
    budget = pp._working_bytes(pp.LANE, 14, 8, 8, "save") + 4096
    segs = pp._segment_schedules(sched, 8, budget)
    assert len(segs) >= 5
    # every internal node appears in exactly one segment
    allints = np.concatenate([s.int_nodes for s in segs])
    assert sorted(allints.tolist()) == sorted(
        range(sched.n_leaves, sched.n_nodes))
    old = pp.VMEM_BUDGET
    pp.VMEM_BUDGET = budget
    try:
        eng = LikelihoodEngine(tree, aln, models.HKY85, ncat=3,
                               dtype="float32", pruner="pallas")
        ref = LikelihoodEngine(tree, aln, models.HKY85, ncat=3,
                               dtype="float32")
        lx, gx = ref.value_and_grad()
        lp, gp = eng.value_and_grad()
        assert abs(float(lx) - float(lp)) < 1e-4 * abs(float(lx))
        np.testing.assert_allclose(
            np.asarray(gp["branch_lengths"]),
            np.asarray(gx["branch_lengths"]), rtol=5e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            float(gp["alpha"]), float(gx["alpha"]), rtol=5e-3, atol=1e-4,
        )
    finally:
        pp.VMEM_BUDGET = old


def test_slot_kernel_matches_classic_and_xla():
    """The O(depth) slot-reuse forward (big-tree path) must agree exactly
    with the classic whole-tree kernel and the XLA path."""
    from phylo_utils_tpu.ops import pallas_pruning as pp

    sched, p, lp = _setup(20, 200, 4, seed=13)
    r_xla, s_xla = make_prune_fn(sched)(p, lp)
    r_classic, s_classic = make_pallas_prune_fn(sched)(p, lp)
    old = pp.VMEM_BUDGET
    # force the slot path: classic working set must exceed the budget but
    # the slot working set (fewer scratch rows) must fit
    fwd_b = pp._working_bytes(pp.LANE, sched.n_nodes, sched.n_leaves,
                              8, "fwd")
    n_slots = pp._slot_count(sched)
    slot_b = pp._working_bytes(pp.LANE, sched.n_nodes, sched.n_leaves,
                               8, "slot", n_slots)
    assert slot_b < fwd_b
    pp.VMEM_BUDGET = (slot_b + fwd_b) // 2
    try:
        assert n_slots < sched.n_nodes - sched.n_leaves + 1
        r_slot, s_slot = make_pallas_prune_fn(sched)(p, lp)
    finally:
        pp.VMEM_BUDGET = old
    np.testing.assert_allclose(r_slot, r_xla, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(s_slot, s_xla, rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(r_slot), np.asarray(r_classic))
    np.testing.assert_array_equal(np.asarray(s_slot), np.asarray(s_classic))


def test_engine_stream_path_matches_xla():
    """At a budget where only the streaming kernel fits, the engine must
    keep pruner='pallas' (no fallback warning) and match the XLA engine."""
    import warnings

    from phylo_utils_tpu.ops import pallas_pruning as pp

    tree = random_tree(40, seed=5)
    rng = np.random.default_rng(5)
    aln = {n: "".join(rng.choice(list("ACGT"), size=64))
           for n in tree.leaf_names}
    old = pp.VMEM_BUDGET
    pp.VMEM_BUDGET = 128 * 1024  # stream fits; classic/slot do not
    try:
        sched = compile_schedule(tree)
        assert not pp._working_bytes(
            pp.LANE, sched.n_nodes, sched.n_leaves, 8, "slot",
            pp._slot_count(sched)) <= pp.VMEM_BUDGET
        assert pp.pallas_supported(sched, 4, "fwd")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            eng = LikelihoodEngine(
                tree, aln, models.GTR, ncat=2, dtype="float32",
                pruner="pallas",
            )
        assert not any("VMEM" in str(x.message) for x in w)
        ref = LikelihoodEngine(tree, aln, models.GTR, ncat=2,
                               dtype="float32")
        assert abs(eng.loglikelihood() - ref.loglikelihood()) < 1e-4
    finally:
        pp.VMEM_BUDGET = old


def test_stream_kernel_matches_slot_and_xla():
    """The HBM-leaf-streaming slot forward (big-tree x wide-state path)
    must agree exactly with the leaf-block slot kernel and, to f32
    rounding, with the XLA path. Forced by a budget window where the
    leaf-block slot working set overflows but the streamed one fits."""
    from phylo_utils_tpu.ops import pallas_pruning as pp

    sched, p, lp = _setup(40, 200, 20, seed=7)
    s_pad = pp._state_pad(20)
    r_xla, s_xla = make_prune_fn(sched)(p, lp)
    n_slots = pp._slot_count(sched)
    slot_b = pp._working_bytes(pp.LANE, sched.n_nodes, sched.n_leaves,
                               s_pad, "slot", n_slots)
    stream_b = pp._working_bytes(pp.LANE, sched.n_nodes, sched.n_leaves,
                                 s_pad, "stream", n_slots)
    assert stream_b < slot_b
    old = pp.VMEM_BUDGET
    pp.VMEM_BUDGET = (stream_b + slot_b) // 2
    try:
        r_stream, s_stream = make_pallas_prune_fn(sched)(p, lp)
    finally:
        pp.VMEM_BUDGET = old
    pp.VMEM_BUDGET = slot_b + 1
    try:
        r_slot, s_slot = make_pallas_prune_fn(sched)(p, lp)
    finally:
        pp.VMEM_BUDGET = old
    np.testing.assert_allclose(r_stream, r_xla, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(s_stream, s_xla, rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(r_stream), np.asarray(r_slot))
    np.testing.assert_array_equal(np.asarray(s_stream), np.asarray(s_slot))


def test_category_fold_selection(monkeypatch):
    """Fold picks the widest block-diagonal stack that fits 128 lanes."""
    from phylo_utils_tpu.ops import pallas_pruning as pp

    monkeypatch.setenv("PHYLO_FOLD_CATEGORIES", "auto")
    assert pp._pick_fold(4, 8) == 1       # DNA: VPU path, no fold
    assert pp._pick_fold(4, 24) == 4      # protein: 4x24=96 <= 128
    assert pp._pick_fold(4, 64) == 2      # codon: 2x64=128 <= 128
    assert pp._pick_fold(3, 24) == 3
    assert pp._pick_fold(1, 24) == 1


def test_category_fold_matches_unfolded(monkeypatch):
    """Folded (block-diagonal MXU) protein forward == unfolded == XLA."""
    sched, p, lp = _setup(16, 130, 20)
    r_xla, s_xla = make_prune_fn(sched)(p, lp)

    monkeypatch.setenv("PHYLO_FOLD_CATEGORIES", "0")
    r_un, s_un = make_pallas_prune_fn(sched)(p, lp)
    monkeypatch.setenv("PHYLO_FOLD_CATEGORIES", "auto")
    r_f, s_f = make_pallas_prune_fn(sched)(p, lp)

    np.testing.assert_allclose(r_f, r_un, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(s_f, s_un, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(r_f, r_xla, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(s_f, s_xla, rtol=2e-5, atol=2e-4)


def test_category_fold_odd_categories(monkeypatch):
    """ncat=3 folds 3x24=72 wide; parity with the XLA path holds."""
    monkeypatch.setenv("PHYLO_FOLD_CATEGORIES", "auto")
    sched, p, lp = _setup(8, 100, 20, ncat=3)
    r_xla, s_xla = make_prune_fn(sched)(p, lp)
    r_f, s_f = make_pallas_prune_fn(sched)(p, lp)
    np.testing.assert_allclose(r_f, r_xla, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(s_f, s_xla, rtol=2e-5, atol=2e-4)


def test_deferred_vjp_kernel_leaf_grads_and_saveall_agreement(monkeypatch):
    """The deferred-edge VJP pair (r4: _dynamic_saveall2_kernel +
    _dynamic_bwd2_kernel) must match the classic saveall+backward pair on
    every cotangent — dp, dleaf, dfreqs — with diff_leaves=True; with
    diff_leaves=False (the engine default: leaves are data) dp/dfreqs
    must be unchanged and dleaf exactly zero."""
    from phylo_utils_tpu.ops import pallas_pruning as pp

    sched, p, lp = _setup(10, 70)
    freqs = jnp.asarray(np.full(4, 0.25), jnp.float64)
    w = jnp.asarray(np.random.default_rng(0).integers(1, 4, 70), jnp.float64)

    def loss(fn, p, lp, freqs):
        ll = fn(p, lp, freqs)
        return jnp.sum(jnp.sum(ll, axis=0) * w)

    monkeypatch.setenv("PHYLO_DEFERRED_VJP", "1")
    f_fused = pp.make_pallas_loglik_fn(sched, n_states=4, diff_leaves=True)
    f_const = pp.make_pallas_loglik_fn(sched, n_states=4, diff_leaves=False)
    monkeypatch.setenv("PHYLO_DEFERRED_VJP", "0")
    f_save = pp.make_pallas_loglik_fn(sched, n_states=4, diff_leaves=True)

    args = (p, lp, freqs)
    v0, g0 = jax.value_and_grad(
        lambda *a: loss(f_save, *a), argnums=(0, 1, 2))(*args)
    v1, g1 = jax.value_and_grad(
        lambda *a: loss(f_fused, *a), argnums=(0, 1, 2))(*args)
    v2, g2 = jax.value_and_grad(
        lambda *a: loss(f_const, *a), argnums=(0, 1, 2))(*args)
    assert abs(float(v0) - float(v1)) < 1e-5 * abs(float(v0))
    for a, b, name in zip(g0, g1, ("dp", "dleaf", "dfreqs")):
        scale = np.max(np.abs(np.asarray(a))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=1e-4 * scale,
            err_msg=name,
        )
    # constant-leaf variant: same dp/dfreqs, zero dleaf
    np.testing.assert_allclose(
        np.asarray(g2[0]), np.asarray(g1[0]), rtol=0,
        atol=1e-6 * (np.max(np.abs(np.asarray(g1[0]))) + 1e-8),
    )
    assert np.all(np.asarray(g2[1]) == 0.0)
    np.testing.assert_allclose(np.asarray(g2[2]), np.asarray(g1[2]),
                               rtol=1e-6)
