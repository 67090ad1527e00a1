"""Fused Felsenstein pruning as a single Pallas TPU kernel.

Reference parity: phylo_utils/likcalc.pyx ``likvec_2desc``/``likvec_1desc`` +
per-node rescaling (SURVEY.md §2 [HIGH]) — the reference's one native
(Cython) component. This is its TPU-native equivalent (SURVEY.md §2
native-component ledger): instead of a C loop per node with partials bouncing
through memory, ONE kernel invocation walks the whole tree for a tile of
sites, keeping the entire partials buffer in VMEM.

Layout/TPU mapping (SURVEY.md §7 hard part 3):
- states go on the *sublane* axis padded to 8 (DNA 4->8, protein 20->24);
  sites go on the *lane* axis in tiles of ``tile`` (default 512). A
  (sites, states) layout would waste 97% of each 128-lane vector on DNA.
- grid = (site_tiles, rate_categories); each program is independent, so the
  grid parallelizes across both and shards trivially over site-sharded
  inputs.
- the child contraction y = P @ x is done as S_pad outer-product
  multiply-adds on the VPU: for S=8 a padded MXU matmul would waste ~256x of
  the systolic array, while the VPU does the whole (8,tile) block in
  lockstep.
- per-node rescaling (divide by per-site max, accumulate log) is fused right
  after the children product — partials never leave VMEM unscaled.

Two schedule lowerings:
- **static** (default, n_internal <= 256): the post-order walk is fully
  unrolled at trace time with node/child ids embedded as Python constants —
  every VMEM access has a static address, no SMEM indirection, no loop
  overhead. This is what a hand-written kernel generator would emit for a
  fixed topology.
- **dynamic** (large trees): node/child ids are scalar-prefetched into SMEM
  and a ``fori_loop`` walks them with dynamic VMEM indexing — O(1) code
  size at the cost of per-node address computation.

The backward pass reuses the XLA path's VJP (identical math, different
lowering), so ``jax.grad`` through an engine with ``pruner="pallas"`` is
exact.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phylo_utils_tpu.ops.pruning import make_prune_fn
from phylo_utils_tpu.trees import PruningSchedule

__all__ = ["make_pallas_prune_fn"]

import os

LANE = 128
SUBLANE = 8
# Internal-node count up to which the fully-unrolled (static) lowering is
# used; beyond it (and by default, at 0, for everything) the scalar-prefetch
# fori_loop lowering runs. Measured clean on TPU v5e (64 taxa, 1024
# patterns): dynamic 27.9M patterns/s vs static 26.1M — the dynamic
# lowering is same-or-faster AND compiles a far smaller Mosaic program
# (O(1) code vs one body per internal node), which matters both for compile
# latency and instruction-cache pressure on big trees. Set the env var
# PHYLO_STATIC_UNROLL_MAX to re-enable static unrolling up to a node count.
STATIC_UNROLL_MAX = int(os.environ.get("PHYLO_STATIC_UNROLL_MAX", "0"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _postorder_arrays(schedule: PruningSchedule):
    """Flatten the level schedule into per-internal-node post-order arrays.

    Levels are already a valid topological order; concatenating the real
    (non-padded) slots of each level in order gives a post-order walk.
    """
    order, children, counts = [], [], []
    cmax = schedule.n_children_max
    for lvl in range(schedule.n_levels):
        for w in range(schedule.width):
            node = int(schedule.level_nodes[lvl, w])
            if node >= schedule.n_nodes:  # padding slot
                continue
            mask = schedule.level_childmask[lvl, w]
            kids = [int(schedule.level_children[lvl, w, c])
                    for c in range(cmax) if mask[c] > 0]
            order.append(node)
            counts.append(len(kids))
            children.append(kids + [0] * (cmax - len(kids)))
    return (
        np.asarray(order, np.int32),
        np.asarray(children, np.int32).reshape(len(order), cmax),
        np.asarray(counts, np.int32),
    )


# State-space width at/above which the child contraction uses the MXU
# (jnp.dot) instead of the VPU outer-product loop. For DNA (S_pad=8) a
# padded 128x128 systolic matmul wastes ~256x of the array and the VPU
# wins decisively; for codon models (S_pad=64) the dot is a real matmul.
# Overridable via env PHYLO_MXU_MIN_SPAD for experiments.
MXU_MIN_SPAD = int(os.environ.get("PHYLO_MXU_MIN_SPAD", "32"))


def _vpu_matmul(p, x, s_pad: int):
    """(S,S) @ (S,T) as outer-product accumulation on the VPU."""
    acc = p[:, 0:1] * x[0:1, :]
    for j in range(1, s_pad):
        acc += p[:, j : j + 1] * x[j : j + 1, :]
    return acc


def _contract(p, x, s_pad: int):
    """Child contraction y = P @ x with a width-dependent unit choice."""
    if s_pad >= MXU_MIN_SPAD:
        # HIGHEST precision: the default MXU path accumulates in bf16
        # passes and was measured to shift a 32-taxon protein logL by ~2
        # units; full-f32 keeps the kernel within the engine's error budget.
        return jnp.dot(
            p, x, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return _vpu_matmul(p, x, s_pad)


def _combine_children(child_data, s_pad, tiny):
    """Product over children of P_c @ x_c, summed scales, fused rescale.

    child_data: list of (p (S,S), x (S,T), sc (1,T)) per child.
    Returns (rescaled partials (S,T), updated logscale (1,T)).
    """
    acc = None
    sc = None
    for p, x, csc in child_data:
        y = _contract(p, x, s_pad)
        acc = y if acc is None else acc * y
        sc = csc if sc is None else sc + csc
    m = jnp.maximum(jnp.max(acc, axis=0, keepdims=True), tiny)  # (1, T)
    return acc / m, sc + jnp.log(m)


def _static_kernel(
    p_ref,        # (1, n_nodes, S_pad, S_pad)
    leaf_ref,     # (n_leaves, S_pad, T)
    root_ref,     # (1, S_pad, T)
    scale_ref,    # (1, 1, T)
    buf,          # scratch (n_nodes, S_pad, T)
    logscale,     # scratch (n_nodes, 1, T)
    *,
    order, children, counts,      # numpy constants
    n_leaves: int,
    s_pad: int,
):
    buf[0:n_leaves] = leaf_ref[:]
    logscale[:] = jnp.zeros_like(logscale)
    tiny = jnp.float32(np.finfo(np.float32).tiny)
    for i in range(order.shape[0]):
        node = int(order[i])
        kids = [int(children[i, c]) for c in range(int(counts[i]))]
        part, sc = _combine_children(
            [(p_ref[0, c], buf[c], logscale[c]) for c in kids], s_pad, tiny
        )
        buf[node] = part
        logscale[node] = sc
    root = int(order[-1])
    root_ref[0] = buf[root]
    scale_ref[0] = logscale[root]


def _dynamic_kernel(
    # scalar prefetch (SMEM)
    order_ref, child_ref, count_ref,
    # tensor inputs (VMEM)
    p_ref,        # (1, n_nodes, S_pad, S_pad)
    leaf_ref,     # (n_leaves, S_pad, T)
    # outputs (VMEM)
    root_ref,     # (1, S_pad, T)
    scale_ref,    # (1, 1, T)
    # scratch
    buf,          # (n_nodes, S_pad, T)
    logscale,     # (n_nodes, 1, T)
    *,
    n_leaves: int,
    n_internal: int,
    cmax: int,
    s_pad: int,
):
    buf[0:n_leaves] = leaf_ref[:]
    logscale[:] = jnp.zeros_like(logscale)
    tiny = jnp.float32(np.finfo(np.float32).tiny)

    def node_step(i, _):
        node = order_ref[i]
        count = count_ref[i]
        acc = None
        sc = None
        for c in range(cmax):
            cid = child_ref[i, c]
            valid = c < count
            y = _contract(p_ref[0, cid], buf[cid], s_pad)
            csc = logscale[cid]            # (1, T)
            if acc is None:
                acc, sc = y, csc           # c == 0 always valid
            else:
                acc = jnp.where(valid, acc * y, acc)
                sc = jnp.where(valid, sc + csc, sc)
        m = jnp.maximum(jnp.max(acc, axis=0, keepdims=True), tiny)
        buf[node] = acc / m
        logscale[node] = sc + jnp.log(m)
        return 0

    jax.lax.fori_loop(0, n_internal, node_step, 0)
    root = order_ref[n_internal - 1]
    root_ref[0] = buf[root]
    scale_ref[0] = logscale[root]


def _pallas_forward(
    p_matrices: jnp.ndarray,     # (n_nodes, K, S, S)
    leaf_partials: jnp.ndarray,  # (n_leaves, sites, S)
    *,
    order: np.ndarray,
    children: np.ndarray,
    counts: np.ndarray,
    n_nodes: int,
    n_leaves: int,
    tile: int,
    interpret: bool,
):
    k = p_matrices.shape[1]
    sites = leaf_partials.shape[1]
    s = leaf_partials.shape[2]
    s_pad = _round_up(s, SUBLANE)
    tile = min(tile, _round_up(sites, LANE))  # don't pad tiny alignments
    # VMEM budget: scratch buf + leaf block scale with tile; shrink the site
    # tile until the working set fits (matters for 61-state codon models on
    # large trees, where s_pad=64 multiplies everything by 8 vs DNA).
    VMEM_BUDGET = 12 * 1024 * 1024
    while tile > LANE:
        working = 4 * tile * (
            n_nodes * s_pad            # partials scratch
            + n_nodes                  # logscale scratch
            + n_leaves * s_pad         # leaf input block (x2 for pipelining)
            * 2
            + 2 * s_pad                # output blocks
        ) + 4 * n_nodes * s_pad * s_pad
        if working <= VMEM_BUDGET:
            break
        tile //= 2
    sites_pad = _round_up(sites, tile)
    n_internal = order.shape[0]
    cmax = children.shape[1]
    dtype = jnp.float32

    # (K, n_nodes, S_pad, S_pad): category-major so each program slices one k.
    p = jnp.transpose(p_matrices.astype(dtype), (1, 0, 2, 3))
    p = jnp.pad(p, ((0, 0), (0, 0), (0, s_pad - s), (0, s_pad - s)))
    # (n_leaves, S_pad, sites_pad), padded slots = 1.0 (harmless: padded
    # states are zeroed by P's zero rows; padded sites are sliced off).
    lp = jnp.transpose(leaf_partials.astype(dtype), (0, 2, 1))
    lp = jnp.pad(
        lp, ((0, 0), (0, s_pad - s), (0, sites_pad - sites)),
        constant_values=1.0,
    )

    n_tiles = sites_pad // tile
    static = n_internal <= STATIC_UNROLL_MAX

    # NOTE: zero offsets are derived from the (i32) grid indices rather than
    # written as literals — under jax_enable_x64 literal 0s trace as i64 and
    # Mosaic refuses the mixed-width index tuple ("failed to legalize
    # 'func.return'").
    tensor_in_specs = [
        pl.BlockSpec(
            (1, n_nodes, s_pad, s_pad),
            lambda t, kk, *_: (kk, kk * 0, kk * 0, kk * 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_leaves, s_pad, tile),
            lambda t, kk, *_: (t * 0, t * 0, t),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, s_pad, tile),
            lambda t, kk, *_: (kk, kk * 0, t),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, tile),
            lambda t, kk, *_: (kk, kk * 0, t),
            memory_space=pltpu.VMEM,
        ),
    ]
    scratch_shapes = [
        pltpu.VMEM((n_nodes, s_pad, tile), dtype),
        pltpu.VMEM((n_nodes, 1, tile), dtype),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((k, s_pad, sites_pad), dtype),
        jax.ShapeDtypeStruct((k, 1, sites_pad), dtype),
    ]

    if static:
        kernel = functools.partial(
            _static_kernel,
            order=order, children=children, counts=counts,
            n_leaves=n_leaves, s_pad=s_pad,
        )
        grid_spec = pl.GridSpec(
            grid=(n_tiles, k),
            in_specs=tensor_in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        root_p, root_sc = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
        )(p, lp)
    else:
        kernel = functools.partial(
            _dynamic_kernel,
            n_leaves=n_leaves, n_internal=n_internal, cmax=cmax, s_pad=s_pad,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles, k),
            in_specs=tensor_in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        root_p, root_sc = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
        )(jnp.asarray(order), jnp.asarray(children), jnp.asarray(counts),
          p, lp)

    root_partials = jnp.transpose(root_p[:, :s, :sites], (0, 2, 1))
    root_logscale = root_sc[:, 0, :sites]
    out_dtype = leaf_partials.dtype
    return root_partials.astype(out_dtype), root_logscale.astype(out_dtype)


def make_pallas_prune_fn(
    schedule: PruningSchedule,
    tile: int = 4 * LANE,
    interpret: bool = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Compile a schedule into a fused-Pallas pruning function.

    Same contract as ``ops.pruning.make_prune_fn``:
    ``prune(p_matrices (n_nodes,K,S,S), leaf_partials (n_leaves,sites,S)) ->
    (root_partials (K,sites,S), root_logscale (K,sites))``.

    ``interpret=None`` auto-enables interpreter mode off-TPU (CPU tests).
    The VJP delegates to the XLA path — same math, exact gradients.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    order, children, counts = _postorder_arrays(schedule)
    xla_prune = make_prune_fn(schedule)
    fwd_impl = functools.partial(
        _pallas_forward,
        order=order,
        children=children,
        counts=counts,
        n_nodes=schedule.n_nodes,
        n_leaves=schedule.n_leaves,
        tile=tile,
        interpret=interpret,
    )

    @jax.custom_vjp
    def prune(p_matrices, leaf_partials):
        return fwd_impl(p_matrices, leaf_partials)

    def prune_fwd(p_matrices, leaf_partials):
        return fwd_impl(p_matrices, leaf_partials), (p_matrices, leaf_partials)

    def prune_bwd(residuals, cotangents):
        p_matrices, leaf_partials = residuals
        _, vjp = jax.vjp(xla_prune, p_matrices, leaf_partials)
        return vjp(cotangents)

    prune.defvjp(prune_fwd, prune_bwd)
    return prune
