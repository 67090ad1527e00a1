"""Fused Felsenstein pruning as a single Pallas TPU kernel.

Reference parity: phylo_utils/likcalc.pyx ``likvec_2desc``/``likvec_1desc`` +
per-node rescaling (SURVEY.md §2 [HIGH]) — the reference's one native
(Cython) component. This is its TPU-native equivalent (SURVEY.md §2
native-component ledger): instead of a C loop per node with partials bouncing
through memory, ONE kernel invocation walks the whole tree for a tile of
sites, keeping the entire partials buffer in VMEM.

Layout/TPU mapping (SURVEY.md §7 hard part 3):
- states go on the *sublane* axis padded to 8 (DNA 4->8, protein 20->24);
  sites go on the *lane* axis in tiles of ``tile`` (default 2048, VMEM-shrunk per kernel mode). A
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

Three schedule lowerings:
- **static** (opt-in via PHYLO_STATIC_UNROLL_MAX): the post-order walk is
  fully unrolled at trace time with node/child ids embedded as Python
  constants — every VMEM access has a static address, no SMEM indirection,
  no loop overhead.
- **dynamic** (default): node/child ids are scalar-prefetched into SMEM
  and a ``fori_loop`` walks them with dynamic VMEM indexing — O(1) code
  size at the cost of per-node address computation. (2-D scalar arrays are
  stored transposed, (cmax, n): SMEM pads the minor dim to the 128-lane
  width, so the long axis must be minor or a 1000-taxon schedule blows the
  1 MiB SMEM budget.)
- **slot** (big trees, automatic): DFS post-order with register-style slot
  reuse — scratch is O(tree depth) instead of O(n_nodes), which is what
  lets 1000+-taxon trees fit the 16 MiB scoped-VMEM limit.
- **stream** (big trees x wide states, automatic): the slot walk with leaf
  partials AND per-node P matrices left in HBM and DMA'd per child with a
  one-node-lookahead double buffer (see _dynamic_slot_stream_kernel) —
  VMEM no longer grows with tree size at all, so there is no fused-kernel
  ceiling (300-taxon codon measured +48% over the XLA fallback it
  replaces; 2026-08-17).

Gradients: ``make_pallas_prune_fn``'s VJP replays the XLA path (exact,
simple); ``make_pallas_loglik_fn`` is the fused differentiable path whose
backward is a second Pallas kernel over the same schedule (see
``_dynamic_bwd_kernel``) — that is what the likelihood engine uses.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phylo_utils_tpu.ops.pruning import (
    LN2,
    exp2_int,
    make_prune_fn,
    pow2_rescale,
)
from phylo_utils_tpu.trees import PruningSchedule

__all__ = ["make_pallas_prune_fn", "make_pallas_loglik_fn"]

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


# Experiment knob: force intermediate state widths up to this value (e.g.
# 32 pads protein 20->32 instead of 20->24; 32 is vreg- and MXU-friendlier
# than the awkward 3-sublane-register 24). 0 = plain SUBLANE rounding.
SPAD_MIN = int(os.environ.get("PHYLO_SPAD_MIN", "0"))


def _state_pad(s: int) -> int:
    sp = _round_up(s, SUBLANE)
    if SPAD_MIN and SUBLANE < sp < SPAD_MIN:
        sp = SPAD_MIN
    return sp


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


# Grouped (level-batched) walk: pack U independent internal-node combines
# into each serial fori_loop iteration (Hu's-algorithm list scheduling over
# the in-tree; see _group_walk_schedule). Both rooflines (PARITY.md DNA
# forward r2, reverse r4) identified the per-node dependency chain as the
# binding constraint; grouping retires U nodes per iteration with all
# loads hoisted before all stores (memory-level parallelism). Measured
# A/B on the flagship (TPU v5e, 64-taxon GTR+G4, 1024 patterns,
# benchmarks/group_ab.py, 2026-08-20): U=4 fwd 0.0543 ms vs serial
# 0.0665 (1.22x), bwd2 0.0886 vs 0.1021 (1.15x), saveall 1.06x; U=8
# neutral, U=16 worse (pad slots + register pressure). The fitted cost
# model (per-group cost = a + b*U with a~87 ns step overhead, b~167 ns
# per-node issue cost) caps the whole lever at ~1.5x — the walk is
# VPU-ISSUE-bound per node at tile 1024, not chain-latency-bound, so
# U=4 captures most of what grouping can give. Default: auto = U=4 for
# VPU-width states (s_pad < MXU_MIN_SPAD; measured) and U=2 for MXU
# widths (32-taxon LG+G4 A/B, 2026-08-20: fwd 0.2218 ms at U=2 vs
# 0.2269 serial / 0.2313 U=4; engine vag 0.4703 vs 0.4845/0.4787 —
# the wider-state combine is contraction-heavy, so only a shallow group
# pays). PHYLO_GROUP_WALK=<int> overrides (0 = serial).
_GROUP_WALK_ENV = os.environ.get("PHYLO_GROUP_WALK", "auto")
GROUP_WALK = None if _GROUP_WALK_ENV == "auto" else int(_GROUP_WALK_ENV)


def _group_size(s_pad: int) -> int:
    """Effective group size U for a given padded state width."""
    if GROUP_WALK is None:
        return 4 if s_pad < MXU_MIN_SPAD else 2
    return GROUP_WALK


# The reverse walk's per-visit live set (gy, P^T gy, both sibling
# products, inv_m, gyc) is ~2.5x the forward's; at U=4 the grouped
# reverse sat 24K-188K over the 16M scoped-vmem limit on the flagship
# engine-grad program (three shave iterations measured 2026-08-20), so
# the reverse runs a narrower group. U=2 measured 0.0929 ms vs 0.1021
# serial / 0.0886 U=4 standalone — most of the win at half the stack.
_GROUP_WALK_BWD_ENV = os.environ.get("PHYLO_GROUP_WALK_BWD", "auto")


def _group_size_bwd(s_pad: int) -> int:
    if _GROUP_WALK_BWD_ENV == "auto":
        return min(2, _group_size(s_pad))
    return int(_GROUP_WALK_BWD_ENV)


def _group_walk_schedule(
    order, children, counts, n_leaves: int, U: int, trash: int
):
    """Hu's-algorithm grouping of the post-order walk.

    Packs the internal nodes into groups of ``U`` such that no node in a
    group is the child of another node in the same group (unit-time
    in-tree scheduling by decreasing distance-to-root — optimal for
    U-machine tree precedence). Returns ``(order_g (G, U), children_g
    (G, U, cmax), counts_g (G, U))`` numpy arrays.

    Padding slots (groups with fewer than U ready nodes) are uniform
    combine slots whose children point at leaf 0 (always in range) and
    whose destination is ``trash`` — a dedicated extra buffer row the
    caller allocates (never read), so pads can't clobber real state.
    """
    n_int = order.shape[0]
    cmax = children.shape[1]
    if n_int < 2:
        raise ValueError("grouping needs >= 2 internal nodes")
    node_row = {int(order[i]): i for i in range(n_int)}
    # distance to root (Hu's priority): parents of each internal node.
    # The schedule may be a FOREST (segment schedules: every boundary
    # output roots its own tree) — any node first seen without a depth
    # is a root at depth 0.
    parent = {}
    for i in range(n_int):
        for c in range(int(counts[i])):
            ch = int(children[i, c])
            if ch >= n_leaves:
                parent[ch] = int(order[i])
    depth = {}
    # order is post-order (per tree): walk top-down in reverse to fill
    for i in range(n_int - 1, -1, -1):
        node = int(order[i])
        if node not in depth:
            depth[node] = 0                  # a (forest) root
        for c in range(int(counts[i])):
            ch = int(children[i, c])
            if ch >= n_leaves:
                depth[ch] = depth[node] + 1
    # pending internal-child count per internal node
    pend = {
        int(order[i]): sum(
            1 for c in range(int(counts[i]))
            if int(children[i, c]) >= n_leaves
        )
        for i in range(n_int)
    }
    ready = [n for n, p in pend.items() if p == 0]
    groups = []
    scheduled = 0
    while scheduled < n_int:
        ready.sort(key=lambda n: -depth[n])
        take = ready[:U]
        ready = ready[U:]
        groups.append(take)
        scheduled += len(take)
        for n in take:
            p = parent.get(n)
            if p is not None:
                pend[p] -= 1
                if pend[p] == 0:
                    ready.append(p)
    G = len(groups)
    order_g = np.full((G, U), trash, np.int32)
    children_g = np.zeros((G, U, cmax), np.int32)   # pads: leaf 0
    # pad counts are 0: the forward treats child 0 as always-valid (writes
    # land in the trash row regardless) while the REVERSE masks every pad
    # write with ``c < count`` — a nonzero pad count would accumulate
    # garbage into leaf 0's cotangent there.
    counts_g = np.zeros((G, U), np.int32)
    for g, grp in enumerate(groups):
        for u, node in enumerate(grp):
            row = node_row[node]
            order_g[g, u] = node
            counts_g[g, u] = counts[row]
            children_g[g, u] = children[row]
    return order_g, children_g, counts_g


def _walk_tree_grouped(
    order_ref, child_ref, count_ref, p_ref, buf, logscale,
    *, n_groups: int, group: int, cmax: int, s_pad: int, n_real: int = None,
    n_blocks: int = 1,
):
    """Grouped post-order combine+rescale (see _group_walk_schedule).

    SMEM layouts (long axis minor): ``order_ref (U, G)``, ``child_ref
    (U*cmax, G)``, ``count_ref (U, G)``. Each fori iteration combines U
    independent nodes; ALL loads precede ALL stores so the U dataflow
    chains can overlap (the serial chain shrinks from n_internal to G).
    """
    tiny = jnp.float32(np.finfo(np.float32).tiny)
    U = group
    s_tot = n_blocks * s_pad
    nr = n_real if n_blocks == 1 else None  # pack/fold: block-diag P

    def group_step(g, _):
        # phase 1: issue EVERY child load (partials, logscale, P rows)
        # before any compute — maximal memory-level parallelism even
        # under in-order vector issue
        loaded = []
        for u in range(U):
            node = order_ref[u, g]
            count = count_ref[u, g]
            kids = []
            for c in range(cmax):
                cid = child_ref[u * cmax + c, g]
                kids.append((p_ref[0, cid], buf[cid], logscale[cid]))
            loaded.append((node, count, kids))
        # phase 2: contract + combine + rescale (independent chains)
        results = []
        for node, count, kids in loaded:
            acc = None
            sc = None
            for c, (pc, xc, lc) in enumerate(kids):
                valid = c < count
                y = _contract(pc, xc, s_tot, nr)
                if acc is None:
                    acc, sc = y, lc        # c == 0 always valid
                else:
                    acc = jnp.where(valid, acc * y, acc)
                    sc = jnp.where(valid, sc + lc, sc)
            part, log_m = _block_rescale(acc, s_pad, n_blocks, tiny)
            results.append((node, part, sc + log_m))
        # phase 3: stores
        for node, part, lsc in results:
            buf[node] = part
            logscale[node] = lsc
        return 0

    jax.lax.fori_loop(0, n_groups, group_step, 0)


# State-space width at/above which the child contraction uses the MXU
# (jnp.dot) instead of the VPU outer-product loop. For DNA (S_pad=8) a
# padded 128x128 systolic matmul wastes ~256x of the array and the VPU
# wins decisively; for protein (S_pad=24) and codon (S_pad=64) the MXU
# wins. Honest-methodology A/B on TPU v5e (32-taxon LG+G4, 1024 patterns,
# 2026-08-17): MXU@24 844k patterns/s vs VPU 794-812k, logL parity
# unchanged (3.5e-7 vs f64). Overridable via env PHYLO_MXU_MIN_SPAD.
MXU_MIN_SPAD = int(os.environ.get("PHYLO_MXU_MIN_SPAD", "24"))


# Category folding (wide-state models): stack `fold` rate categories' P
# matrices into one block-diagonal (fold*S_pad)^2 matrix so the child
# contraction is ONE wide MXU matmul instead of `fold` narrow ones.
# Rescaling stays per category block (see _block_rescale).
#
# MEASURED NEGATIVE RESULT on TPU v5e (honest batched methodology,
# 2026-08-17) — hence DEFAULT OFF: protein 32-taxa LG+G4 folded 4x24=96:
# 646k patterns/s vs 844k unfolded MXU@24; codon folded 2x64=128: 65.0k
# vs 67.4k unfolded. At Precision.HIGHEST (the only Mosaic-lowerable
# full-f32 mode; HIGH fails to lower) the 6-pass cost and the fold^2
# growth of the block-diagonal P's VMEM traffic eat the utilization gain.
# Kept as an env-gated experiment (PHYLO_FOLD_CATEGORIES=auto|<int>) —
# the lowering is exact (per-block rescale == per-category rescale) and
# covered by tests, so future hardware can re-evaluate with one env var.
def _pick_fold(k: int, s_pad: int) -> int:
    env = os.environ.get("PHYLO_FOLD_CATEGORIES", "0")
    if env == "0" or k <= 1:
        return 1
    if env == "auto":
        if s_pad < 16:
            return 1
        f = k
    else:
        f = min(int(env), k)
    while f > 1 and (k % f or f * s_pad > LANE):
        f -= 1
    # folding is an MXU play: only worth it if the folded width hits the
    # MXU path at all
    if f * s_pad < MXU_MIN_SPAD:
        return 1
    return max(f, 1)


def _vpu_matmul(p, x, s_pad: int, n_real: int = None):
    """(S,S) @ (S,T) as outer-product accumulation on the VPU.

    ``n_real``: real (unpadded) state count — P's columns j >= n_real are
    structural zeros (see _pad_inputs), so their outer-product terms are
    skipped entirely. Exact: adding zero is the identity. For DNA
    (4 real states padded to 8) this halves the contraction's VPU ops.
    """
    n = n_real if n_real else s_pad
    acc = p[:, 0:1] * x[0:1, :]
    for j in range(1, n):
        acc += p[:, j : j + 1] * x[j : j + 1, :]
    return acc


def _contract(p, x, s_pad: int, n_real: int = None):
    """Child contraction y = P @ x with a width-dependent unit choice."""
    if s_pad >= MXU_MIN_SPAD:
        # HIGHEST precision: the default MXU path accumulates in bf16
        # passes and was measured to shift a 32-taxon protein logL by ~2
        # units; full-f32 keeps the kernel within the engine's error budget.
        # (Precision.HIGH — 3 bf16 passes — is NOT lowerable by Mosaic:
        # "Unsupported dot precision", measured 2026-08-17.)
        return jnp.dot(
            p, x, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return _vpu_matmul(p, x, s_pad, n_real)


def _combine_children(child_data, s_pad, tiny, n_real=None):
    """Product over children of P_c @ x_c, summed scales, fused rescale.

    child_data: list of (p (S,S), x (S,T), sc (1,T)) per child.
    Returns (rescaled partials (S,T), updated logscale (1,T)).
    """
    acc = None
    sc = None
    for p, x, csc in child_data:
        y = _contract(p, x, s_pad, n_real)
        acc = y if acc is None else acc * y
        sc = csc if sc is None else sc + csc
    m = jnp.maximum(jnp.max(acc, axis=0, keepdims=True), tiny)  # (1, T)
    # exact power-of-2 rescale; logscale carries binary-exponent COUNTS
    # (integer-valued f32) — ln conversion happens once outside the kernel
    # (TPU f32 log is ~1e-4-accurate with a bias: see ops.pruning)
    scale, e = pow2_rescale(m)
    return acc * scale, sc + e


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
    n_real: int = None,
):
    buf[0:n_leaves] = leaf_ref[:]
    logscale[:] = jnp.zeros_like(logscale)
    tiny = jnp.float32(np.finfo(np.float32).tiny)
    for i in range(order.shape[0]):
        node = int(order[i])
        kids = [int(children[i, c]) for c in range(int(counts[i]))]
        part, sc = _combine_children(
            [(p_ref[0, c], buf[c], logscale[c]) for c in kids], s_pad, tiny,
            n_real,
        )
        buf[node] = part
        logscale[node] = sc
    root = int(order[-1])
    root_ref[0] = buf[root]
    scale_ref[0] = logscale[root]


class _NodeView:
    """Index a (possibly block-prefixed) ref by node id.

    Lets the same tree-walk body run on a scratch ref (``buf[node]``) and on
    an output-block ref (``buf_ref[0, node]``) without duplicating the
    kernel code.
    """

    __slots__ = ("ref", "pre")

    def __init__(self, ref, pre=()):
        self.ref, self.pre = ref, pre

    def __getitem__(self, i):
        return self.ref[self.pre + (i,)]

    def __setitem__(self, i, v):
        self.ref[self.pre + (i,)] = v

    def fill_zero(self):
        self.ref[...] = jnp.zeros(self.ref.shape, self.ref.dtype)


def _block_rescale(acc, s_pad: int, n_blocks: int, tiny):
    """Per-category-block rescale of a (n_blocks*s_pad, T) partials tile.

    With categories folded onto the state axis each block needs its own
    max (sharing one max across categories would let the slow category's
    partials drift toward f32 underflow on deep trees). Returns
    ``(rescaled (n_blocks*s_pad, T), log_m (n_blocks, T))``.
    """
    if n_blocks == 1:
        m = jnp.maximum(jnp.max(acc, axis=0, keepdims=True), tiny)
        scale, e = pow2_rescale(m)
        return acc * scale, e
    ms = [
        jnp.maximum(
            jnp.max(acc[b * s_pad:(b + 1) * s_pad], axis=0, keepdims=True),
            tiny,
        )
        for b in range(n_blocks)
    ]
    se = [pow2_rescale(m) for m in ms]
    out = jnp.concatenate(
        [acc[b * s_pad:(b + 1) * s_pad] * se[b][0] for b in range(n_blocks)],
        axis=0,
    )
    return out, jnp.concatenate([e for _, e in se], axis=0)


def _walk_tree(
    order_ref, child_ref, count_ref, p_ref, buf, logscale,
    *, n_internal: int, cmax: int, s_pad: int, n_blocks: int = 1,
    n_real: int = None,
):
    """Post-order combine+rescale over the whole tree (shared kernel body).

    ``buf``/``logscale`` are _NodeViews with leaves already loaded and
    logscale zeroed. ``n_blocks > 1`` means categories are folded onto the
    state axis (block-diagonal P): the contraction spans all blocks at
    once but the rescale stays per block."""
    tiny = jnp.float32(np.finfo(np.float32).tiny)
    s_tot = n_blocks * s_pad
    nr = n_real if n_blocks == 1 else None  # fold: block-diag P, no trim

    def node_step(i, _):
        node = order_ref[i]
        count = count_ref[i]
        acc = None
        sc = None
        for c in range(cmax):
            cid = child_ref[c, i]
            valid = c < count
            y = _contract(p_ref[0, cid], buf[cid], s_tot, nr)
            csc = logscale[cid]            # (n_blocks, T)
            if acc is None:
                acc, sc = y, csc           # c == 0 always valid
            else:
                acc = jnp.where(valid, acc * y, acc)
                sc = jnp.where(valid, sc + csc, sc)
        part, log_m = _block_rescale(acc, s_pad, n_blocks, tiny)
        buf[node] = part
        logscale[node] = sc + log_m
        return 0

    jax.lax.fori_loop(0, n_internal, node_step, 0)


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
    buf,          # (n_nodes, n_blocks*S_pad, T)
    logscale,     # (n_nodes, n_blocks, T)
    *,
    n_leaves: int,
    n_internal: int,
    cmax: int,
    s_pad: int,
    n_blocks: int = 1,
    n_real: int = None,
    group: int = 0,
    n_groups: int = 0,
    root: int = None,
):
    if n_blocks == 1:
        buf[0:n_leaves] = leaf_ref[:]
    else:
        # leaves stream at S_pad width; replicate across category blocks
        # in VMEM (cheap next to the contraction, and it keeps the HBM
        # traffic and the leaf input block fold-independent)
        lv = leaf_ref[:]
        buf[0:n_leaves] = jnp.concatenate([lv] * n_blocks, axis=1)
    logscale[:] = jnp.zeros_like(logscale)
    if group:
        _walk_tree_grouped(
            order_ref, child_ref, count_ref, p_ref,
            _NodeView(buf), _NodeView(logscale),
            n_groups=n_groups, group=group, cmax=cmax, s_pad=s_pad,
            n_real=n_real, n_blocks=n_blocks,
        )
        root_id = np.int32(root)
    else:
        _walk_tree(
            order_ref, child_ref, count_ref, p_ref,
            _NodeView(buf), _NodeView(logscale),
            n_internal=n_internal, cmax=cmax, s_pad=s_pad,
            n_blocks=n_blocks, n_real=n_real,
        )
        root_id = order_ref[n_internal - 1]
    root_ref[0] = buf[root_id]
    scale_ref[0] = logscale[root_id]


def _dfs_slot_schedule(schedule: PruningSchedule):
    """DFS-post-order walk with register-style slot allocation.

    The classic kernel keeps EVERY node's partials in scratch (O(n_nodes)
    VMEM — the big-tree ceiling). In DFS post-order a node's partials are
    dead as soon as its parent is combined, so a free-list assigns each
    internal node a reusable slot; the live set is O(tree depth). Leaves
    never get slots — the walk reads them straight from the streamed leaf
    block.

    Returns ``(nslot, child_node, child_src, child_isleaf, counts,
    n_slots, root_slot)`` where ``child_node`` indexes P and ``child_src``
    is a leaf id or a slot id according to ``child_isleaf``.
    """
    order, children, counts = _postorder_arrays(schedule)
    n_leaves = schedule.n_leaves
    cmax = children.shape[1]
    kids = {
        int(order[i]): [int(children[i, c]) for c in range(int(counts[i]))]
        for i in range(order.shape[0])
    }
    root = int(order[-1])
    post = []
    stack = [(root, False)]
    while stack:
        node, done = stack.pop()
        if node < n_leaves:
            continue
        if done:
            post.append(node)
        else:
            stack.append((node, True))
            for ch in kids[node]:
                stack.append((ch, False))
    slot_of: dict = {}
    free: list = []
    next_slot = 0
    nn = len(post)
    nslot = np.zeros(nn, np.int32)
    child_node = np.zeros((nn, cmax), np.int32)
    child_src = np.zeros((nn, cmax), np.int32)
    child_isleaf = np.zeros((nn, cmax), np.int32)
    counts2 = np.zeros(nn, np.int32)
    for i, node in enumerate(post):
        ks = kids[node]
        counts2[i] = len(ks)
        for c, ch in enumerate(ks):
            child_node[i, c] = ch
            if ch < n_leaves:
                child_src[i, c] = ch
                child_isleaf[i, c] = 1
            else:
                child_src[i, c] = slot_of[ch]
        # children slots die here; the parent may reuse one
        for ch in ks:
            if ch >= n_leaves:
                free.append(slot_of.pop(ch))
        if free:
            s = free.pop()
        else:
            s = next_slot
            next_slot += 1
        slot_of[node] = s
        nslot[i] = s
    return (
        nslot, child_node, child_src, child_isleaf, counts2,
        next_slot, slot_of[root],
    )


def _dynamic_slot_kernel(
    # scalar prefetch (SMEM)
    nslot_ref, cnode_ref, csrc_ref, cleaf_ref, count_ref,
    # tensor inputs (VMEM)
    p_ref,        # (1, n_nodes, S_pad, S_pad)
    leaf_ref,     # (n_leaves, S_pad, T)
    # outputs (VMEM)
    root_ref,     # (1, S_pad, T)
    scale_ref,    # (1, 1, T)
    # scratch — O(depth), not O(n_nodes)
    buf,          # (n_slots, S_pad, T)
    logscale,     # (n_slots, 1, T)
    *,
    n_leaves: int,
    n_slots: int,
    n_internal: int,
    cmax: int,
    s_pad: int,
    root_slot: int,
    n_real: int = None,
):
    logscale[:] = jnp.zeros_like(logscale)
    tiny = jnp.float32(np.finfo(np.float32).tiny)

    def node_step(i, _):
        slot = nslot_ref[i]
        count = count_ref[i]
        acc = None
        sc = None
        for c in range(cmax):
            cn = cnode_ref[c, i]           # child NODE id (indexes P)
            src = csrc_ref[c, i]           # leaf id or slot id
            isleaf = cleaf_ref[c, i]
            valid = c < count
            # load both candidate sources (clamped), select: a VMEM read
            # is cheap next to the contraction, and Mosaic has no
            # data-dependent ref choice
            xl = leaf_ref[jnp.minimum(src, n_leaves - 1)]
            xs = buf[jnp.minimum(src, n_slots - 1)]
            x = jnp.where(isleaf > 0, xl, xs)
            y = _contract(p_ref[0, cn], x, s_pad, n_real)
            csc = jnp.where(
                isleaf > 0,
                jnp.zeros_like(logscale[0]),
                logscale[jnp.minimum(src, n_slots - 1)],
            )
            if acc is None:
                acc, sc = y, csc           # c == 0 always valid
            else:
                acc = jnp.where(valid, acc * y, acc)
                sc = jnp.where(valid, sc + csc, sc)
        m = jnp.maximum(jnp.max(acc, axis=0, keepdims=True), tiny)
        scale, e = pow2_rescale(m)         # exact: see _combine_children
        buf[slot] = acc * scale            # may reuse a child's slot: all
        logscale[slot] = sc + e            # reads happened above
        return 0

    jax.lax.fori_loop(0, n_internal, node_step, 0)
    root_ref[0] = buf[root_slot]
    scale_ref[0] = logscale[root_slot]


def _dynamic_slot_stream_kernel(
    # scalar prefetch (SMEM) — *_nxt are the same arrays shifted by one
    # node (see _pallas_forward): Mosaic cannot do arithmetic on the fori
    # induction var (i32 var + x64-traced literals fails to lower), so the
    # one-node-lookahead prefetch reads "node i+1's schedule" at column i.
    nslot_ref, cnode_ref, csrc_ref, cleaf_ref, count_ref,
    cnode_nxt_ref, csrc_nxt_ref, cleaf_nxt_ref, count_nxt_ref,
    # tensor inputs — BOTH stay in HBM (pl.ANY), DMA'd per child
    p_hbm,        # (K, n_nodes, S_pad, S_pad)
    leaf_hbm,     # (n_leaves, S_pad, sites_pad)
    # outputs (VMEM)
    root_ref,     # (1, S_pad, T)
    scale_ref,    # (1, 1, T)
    # scratch
    buf,          # (n_slots, S_pad, T)
    logscale,     # (n_slots, 1, T)
    lbuf,         # (2, cmax, S_pad, T) — double-buffered leaf DMA landing
    pbuf,         # (2, cmax, S_pad, LANE) — double-buffered P landing (P's
                  # minor dim is padded to the 128 lane width: Mosaic DMA
                  # slices must be lane-aligned)
    lsem,         # DMA semaphores (2, cmax) for leaves
    psem,         # DMA semaphores (2, cmax) for P
    *,
    n_leaves: int,
    n_slots: int,
    n_internal: int,
    cmax: int,
    s_pad: int,
    tile: int,
    root_slot: int,
    n_real: int = None,
):
    """Slot kernel with HBM-streamed leaves AND P matrices (big trees).

    The classic/slot kernels bring ALL leaf partials and ALL per-node P
    matrices into VMEM as pipelined input blocks — together the dominant
    VMEM consumers for big trees (300-taxon codon: 9.4 MiB of P + 18.8
    MiB of leaf block; the compiler double-buffers input blocks, so the
    true scoped footprint is ~2x that). Here both stay in HBM; each
    node's child P (and leaf partials when the child is a leaf) are
    DMA'd into small double-buffered landing pads with a one-node
    lookahead — node i+1's copies are issued before node i's compute
    waits, so the DMA latency hides behind the child contraction. VMEM
    drops to O(n_slots * tile + cmax * (S_pad * tile + S_pad^2)), which
    is what lets 300+-taxon codon and 512+-taxon protein trees run fused
    instead of falling back to the XLA path — with no tree-size ceiling
    left (scratch no longer grows with n_nodes or n_leaves).
    """
    t_idx = pl.program_id(0)
    k_idx = pl.program_id(1)
    logscale[:] = jnp.zeros_like(logscale)
    tiny = jnp.float32(np.finfo(np.float32).tiny)
    # np.int32 literals: Python ints trace as i64 under jax_enable_x64 and
    # Mosaic's memref_slice rejects i64 indices.
    i32 = np.int32

    def leaf_copy(src, b, c):
        return pltpu.make_async_copy(
            leaf_hbm.at[src, :, pl.ds(t_idx * tile, tile)],
            lbuf.at[b, i32(c)],
            lsem.at[b, i32(c)],
        )

    def p_copy(cn, b, c):
        return pltpu.make_async_copy(
            p_hbm.at[k_idx, cn],
            pbuf.at[b, i32(c)],
            psem.at[b, i32(c)],
        )

    def issue(node_ref, src_ref, leaf_ref_, cnt_ref, i, b):
        for c in range(cmax):
            valid = i32(c) < cnt_ref[i]

            @pl.when(valid)
            def _():
                p_copy(node_ref[c, i], b, c).start()

            @pl.when(jnp.logical_and(leaf_ref_[c, i] > 0, valid))
            def _():
                leaf_copy(src_ref[c, i], b, c).start()

    # prologue: node 0's operands into buffer 0
    issue(cnode_ref, csrc_ref, cleaf_ref, count_ref, i32(0), i32(0))

    def node_step(i, b):
        # prefetch node i+1's operands into the other buffer (the shifted
        # *_nxt arrays hold zeros past the end, so the final lookahead is
        # a no-op issue)
        issue(
            cnode_nxt_ref, csrc_nxt_ref, cleaf_nxt_ref, count_nxt_ref,
            i, i32(1) - b,
        )

        slot = nslot_ref[i]
        count = count_ref[i]
        acc = None
        sc = None
        for c in range(cmax):
            src = csrc_ref[c, i]           # leaf id or slot id
            isleaf = cleaf_ref[c, i]
            valid = i32(c) < count

            @pl.when(valid)
            def _():
                p_copy(cnode_ref[c, i], b, c).wait()

            @pl.when(jnp.logical_and(isleaf > 0, valid))
            def _():
                leaf_copy(src, b, c).wait()

            xl = lbuf[b, i32(c)]
            xs = buf[jnp.minimum(src, i32(n_slots - 1))]
            x = jnp.where(isleaf > 0, xl, xs)
            y = _contract(pbuf[b, i32(c)][:, :s_pad], x, s_pad, n_real)
            csc = jnp.where(
                isleaf > 0,
                jnp.zeros_like(logscale[0]),
                logscale[jnp.minimum(src, i32(n_slots - 1))],
            )
            if acc is None:
                acc, sc = y, csc           # c == 0 always valid
            else:
                acc = jnp.where(valid, acc * y, acc)
                sc = jnp.where(valid, sc + csc, sc)
        m = jnp.maximum(jnp.max(acc, axis=0, keepdims=True), tiny)
        scale, e = pow2_rescale(m)         # exact: see _combine_children
        buf[slot] = acc * scale
        logscale[slot] = sc + e
        return i32(1) - b

    jax.lax.fori_loop(0, n_internal, node_step, jnp.int32(0))
    root_ref[0] = buf[root_slot]
    scale_ref[0] = logscale[root_slot]


def _dynamic_saveall_kernel(
    # scalar prefetch (SMEM)
    order_ref, child_ref, count_ref,
    # tensor inputs (VMEM)
    p_ref,        # (1, n_nodes, S_pad, S_pad)
    leaf_ref,     # (1, n_leaves, S_pad, T) — per-category (segment boundary
                  # inputs differ by rate category; real leaves broadcast)
    leaf_lsc_ref, # (1, n_leaves, 1, T) — input logscale (zeros for real
                  # leaves; nonzero for segment-boundary virtual leaves)
    # outputs (VMEM) — every node's partials/logscale, kept as residuals
    buf_ref,      # (1, n_nodes, S_pad, T)
    logscale_ref, # (1, n_nodes, 1, T)
    *,
    n_leaves: int,
    n_internal: int,
    cmax: int,
    s_pad: int,
    n_real: int = None,
    group: int = 0,
    n_groups: int = 0,
):
    buf_ref[0, 0:n_leaves] = leaf_ref[0]
    logscale_ref[...] = jnp.zeros(logscale_ref.shape, logscale_ref.dtype)
    logscale_ref[0, 0:n_leaves] = leaf_lsc_ref[0]
    if group:
        _walk_tree_grouped(
            order_ref, child_ref, count_ref, p_ref,
            _NodeView(buf_ref, (0,)), _NodeView(logscale_ref, (0,)),
            n_groups=n_groups, group=group, cmax=cmax, s_pad=s_pad,
            n_real=n_real,
        )
    else:
        _walk_tree(
            order_ref, child_ref, count_ref, p_ref,
            _NodeView(buf_ref, (0,)), _NodeView(logscale_ref, (0,)),
            n_internal=n_internal, cmax=cmax, s_pad=s_pad, n_real=n_real,
        )


def _dynamic_bwd_kernel(
    # scalar prefetch (SMEM)
    order_ref, child_ref, count_ref,
    # tensor inputs (VMEM)
    p_ref,        # (1, n_nodes, S_pad, S_pad)
    pt_ref,       # (1, n_nodes, S_pad, S_pad) — P^T per node (host-side)
    buf_ref,      # (1, n_nodes, S_pad, T) — forward partials (rescaled)
    ls_ref,       # (1, n_nodes, 1, T)     — forward logscale chain
    gseed_ref,    # (1, n_seed, S_pad, T) — seeds dL/d(partials) of the
                  # boundary-output nodes (whole tree: n_seed=1, the root)
    # outputs (VMEM)
    dp_ref,       # (1, n_nodes, S_pad, S_pad) — accumulated over site tiles
    dleaf_ref,    # (1, n_leaves, S_pad, T)
    # scratch
    g,            # (n_nodes, S_pad, T) — outside vectors
    *,
    seed_ids,     # numpy (n_seed,) node ids (static constants)
    n_leaves: int,
    n_internal: int,
    cmax: int,
    s_pad: int,
    n_real: int = None,
):
    """Reverse pass of the pruning walk (pre-order over the same schedule).

    Math (rescaling divisors treated as constants — exact because the primal
    ``ll = log(pi . x_root_true)`` is invariant to the rescaling scheme):
    for node n with children c:  y_c = P_c x_c,  x_n = (prod_c y_c) / m_n
      g_{y_c} = g_n * (prod_{c'!=c} y_{c'}) / m_n
      dP_c   += g_{y_c} x_c^T        (contraction over the site tile — MXU)
      g_c     = P_c^T g_{y_c}
    Leaves' g rows are the leaf-partials cotangent.
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init_dp():
        dp_ref[...] = jnp.zeros(dp_ref.shape, dp_ref.dtype)

    g[...] = jnp.zeros(g.shape, g.dtype)
    for j in range(seed_ids.shape[0]):
        g[int(seed_ids[j])] = gseed_ref[0, j]

    # NOTE: order/children/counts arrive PRE-REVERSED (top-down) so the
    # loop indexes them directly — any arithmetic on the fori index mixes
    # Mosaic's i32 induction var with x64-traced i64 literals and fails
    # to lower ('arith.subi' width mismatch).
    def node_step(i, _):
        node = order_ref[i]
        count = count_ref[i]
        gn = g[node]                   # (S, T)
        ys = []
        sc_sum = None
        for c in range(cmax):
            cid = child_ref[c, i]
            valid = c < count
            y = _contract(p_ref[0, cid], buf_ref[0, cid], s_pad, n_real)
            y = jnp.where(valid, y, jnp.ones_like(y))
            ys.append((cid, valid, y))
            # padding child ids are 0 (a leaf, logscale 0) so the masked
            # sum equals the forward's; keep the mask for safety
            csc = jnp.where(valid, ls_ref[0, cid], 0.0)
            sc_sum = csc if sc_sum is None else sc_sum + csc
        # exponent-count units: the difference is an exact f32 integer
        inv_m = exp2_int(sc_sum - ls_ref[0, node])  # (1, T) = 1/m_node
        for c in range(cmax):
            cid, valid, y = ys[c]
            sib = None
            for c2 in range(cmax):
                if c2 == c:
                    continue
                sib = ys[c2][2] if sib is None else sib * ys[c2][2]
            gy = gn * inv_m if sib is None else gn * sib * inv_m
            gy = jnp.where(valid, gy, 0.0)          # (S, T)
            dp_ref[0, cid] += jax.lax.dot_general(
                gy, buf_ref[0, cid],
                (((1,), (1,)), ((), ())),           # contract site tiles
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            g[cid] += _contract(pt_ref[0, cid], gy, s_pad, n_real)
        return 0

    jax.lax.fori_loop(0, n_internal, node_step, 0)
    dleaf_ref[0] = g[0:n_leaves]


def _dynamic_bwd2_kernel(
    # scalar prefetch (SMEM) — PRE-REVERSED (top-down) schedule arrays
    rorder_ref, rchild_ref, rcount_ref,
    # tensor inputs (VMEM)
    p_ref,        # (1, n_nodes, S_pad, S_pad)
    pt_ref,       # (1, n_nodes, S_pad, S_pad) — P^T; SEED ROWS = IDENTITY
    buf_ref,      # (1, n_nodes, S_pad, T) — forward partials (rescaled)
    ls_ref,       # (1, n_nodes, 1, T)     — forward logscale chain
    gseed_ref,    # (1, n_seed, S_pad, T) — dL/d(partials) of the seed
                  # nodes (whole tree: n_seed=1, the root; segments: the
                  # boundary outputs — each a root of the segment forest)
    # outputs (VMEM): dp always; dleaf only when want_dleaf; then scratch
    *outs_and_scratch,
    seed_ids,     # numpy (n_seed,) node ids (static constants)
    n_leaves: int,
    n_internal: int,
    cmax: int,
    s_pad: int,
    n_real: int = None,
    want_dleaf: bool = True,
    group: int = 0,
    n_groups: int = 0,
    n_nodes: int = None,
):
    """Deferred-edge reverse walk (r4 redesign of _dynamic_bwd_kernel).

    Math identical to _dynamic_bwd_kernel (rescale divisors constant —
    exact by logL invariance), restructured around two r4 measurements:
    (a) MXU dot_generals inside the serial node loop stall it (each
    (S,T)x(T,S) product serializes against the VPU chain), and (b) any
    dynamic ``pl.when`` in the loop body costs +73%. So the serial loop
    propagates cotangents ONLY (pure VPU, branch-free):

      visit n (pre-order):  gy_n = gybuf[n]   (stashed by n's parent)
        g_n      = P_n^T gy_n                   [root: pt=I ⇒ g=seed]
        gybuf[c] += g_n * (prod_{c'≠c} y_{c'}) * 2^{-e_n}   per child

    and EVERY dP lands in one batched MXU dot_general epilogue over all
    nodes at once (the MXU pipelines across the node batch instead of
    draining per step):

        dP[n] += gybuf[n] buf[n]^T    for all n   [root zeroed by caller]
        dleaf  = batched P_l^T gybuf[l]           (only when want_dleaf)

    The y_c = P_c x_c sibling recomputes stay in the loop (saveall
    residuals hold node partials; re-contracting beats saving ys — the
    measured saveall2 variant cost +57% on the forward half).
    """
    if want_dleaf:
        dp_ref, dleaf_ref, gybuf = outs_and_scratch
    else:
        dp_ref, gybuf = outs_and_scratch
        dleaf_ref = None
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init_dp():
        dp_ref[...] = jnp.zeros(dp_ref.shape, dp_ref.dtype)

    # accumulate (not overwrite): padding children write masked zeros and
    # must not clobber a real child's stash written earlier. Seeds go in
    # as gy stashes; their pt rows are the identity (caller glue) so the
    # uniform g = P^T gy step reproduces each seed exactly — and each
    # seed node is a root of the (segment) forest, so nothing else ever
    # adds into its stash.
    gybuf[...] = jnp.zeros(gybuf.shape, gybuf.dtype)
    for j in range(int(seed_ids.shape[0])):
        gybuf[np.int32(seed_ids[j])] = gseed_ref[0, j]

    def _visit(node, count, child_at):
        """One node's reverse step: returns [(cid, masked gyc), ...]."""
        gy = gybuf[node]                   # (S, T)
        # root: pt row is the identity (caller glue) ⇒ g = seed exactly
        gn = _contract(pt_ref[0, node], gy, s_pad, n_real)
        ys = []
        sc_sum = None
        for c in range(cmax):
            cid = child_at(c)
            valid = c < count
            y = _contract(p_ref[0, cid], buf_ref[0, cid], s_pad, n_real)
            y = jnp.where(valid, y, jnp.ones_like(y))
            ys.append(y)
            csc = jnp.where(valid, ls_ref[0, cid], 0.0)
            sc_sum = csc if sc_sum is None else sc_sum + csc
        # exponent-count units: the difference is an exact f32 integer
        inv_m = exp2_int(sc_sum - ls_ref[0, node])  # (1, T) = 2^{-e_n}
        outs = []
        for c in range(cmax):
            cid = child_at(c)
            valid = c < count
            sib = None
            for c2 in range(cmax):
                if c2 == c:
                    continue
                sib = ys[c2] if sib is None else sib * ys[c2]
            gyc = gn * inv_m if sib is None else gn * sib * inv_m
            outs.append((cid, jnp.where(valid, gyc, 0.0)))
        return outs

    if group:
        # grouped reverse: U independent node visits per serial iteration
        # (same Hu groups as the forward, walked in reverse group order);
        # all loads precede all += stores — within a group the store
        # targets are distinct (each child has ONE parent) and a node's
        # own gy was stashed by its parent in an earlier group. Pad slots
        # carry the trash node id (n_nodes): CLAMP it so every read stays
        # inside the n_nodes-row buffers (the pad's writes are
        # count-masked to zero, so reading the root row's junk is inert)
        # — this keeps the reverse kernel's VMEM footprint identical to
        # the serial one (the +1-row variant was 188K over the 16M
        # scoped-vmem limit on the flagship engine grad program).
        last = np.int32(n_nodes - 1 if n_nodes is not None
                        else gybuf.shape[0] - 1)

        def group_step(g, _):
            # stores apply per node (NOT deferred to a group-wide phase):
            # a fully deferred store phase keeps U*cmax (S, T) cotangent
            # tiles live on the Mosaic stack — +256K at U=4/tile 1024,
            # which pushed the flagship engine grad program 76K over the
            # 16M scoped-vmem limit. Within-group store->load ordering is
            # still hazard-free (a group member is never another's child).
            for u in range(group):
                node = jnp.minimum(rorder_ref[u, g], last)
                count = rcount_ref[u, g]
                for cid, gyc in _visit(
                    node, count, lambda c, u=u: rchild_ref[u * cmax + c, g]
                ):
                    gybuf[cid] += gyc
            return 0

        jax.lax.fori_loop(0, n_groups, group_step, 0)
    else:
        def node_step(i, _):
            node = rorder_ref[i]
            count = rcount_ref[i]
            for cid, gyc in _visit(
                node, count, lambda c: rchild_ref[c, i]
            ):
                gybuf[cid] += gyc
            return 0

        jax.lax.fori_loop(0, n_internal, node_step, 0)

    nn = n_nodes if n_nodes is not None else gybuf.shape[0]
    # batched MXU epilogue: dp_n = gy_n x_n^T for every node at once
    dp_ref[0] += jax.lax.dot_general(
        gybuf[0:nn], buf_ref[0, 0:nn],
        (((2,), (2,)), ((0,), (0,))),      # batch nodes, contract sites
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if want_dleaf:
        # each leaf has exactly one parent edge: dleaf_l = P_l^T gy_l
        dleaf_ref[0] = jax.lax.dot_general(
            pt_ref[0, 0:n_leaves], gybuf[0:n_leaves],
            (((2,), (1,)), ((0,), (0,))),  # batch leaves, contract states
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


# VMEM budget, empirically calibrated on TPU v5e through the axon relay
# (2026-08-17): the compiler enforces a 16 MiB "scoped vmem" limit on a
# kernel's stack allocation (measured: 16.60M rejected, "limit 16.00M"),
# and the streamed leaf block was observed to count against it. The
# formulas below estimate a kernel program's whole working set (scratch +
# double-buffered streamed blocks + P copies); the default budget keeps
# the true scoped usage under 16 MiB with margin. Trees that exceed it at
# the minimum (LANE-wide) site tile fall back per `pallas_supported`:
# forward -> the O(depth)-scratch slot kernel, then the XLA path; backward
# -> the XLA VJP.
VMEM_BUDGET = int(
    os.environ.get("PHYLO_VMEM_BUDGET", str(14 * 1024 * 1024))
)

# Safety margin multiplied into the 'save'/'bwd2' working-set estimates
# (ADVICE r4): those modes dropped the blanket 2x scoped-vmem calibration
# factor on the strength of one flagship-shape measurement (ACCEPTED and
# ran vmapped at itemized 13.5-19.5 MB), but Mosaic's accounting was
# measured to run ~1.9x the itemized sum for 'bwd' under a vmapped batch
# axis — if a different tree/batch shape trips a scoped-vmem rejection
# ("exceeds scoped vmem limit"), set PHYLO_VMEM_MARGIN=1.2 (or 2.0) to
# shrink those modes' tiles without touching the forward lowerings. The
# default stays 1.0 because the margin would halve the flagship grad tile
# (1024 -> 512, a measured 0.101 -> 0.184 ms regression) to insure
# against a failure never observed in save/bwd2 mode.
VMEM_MARGIN = float(os.environ.get("PHYLO_VMEM_MARGIN", "1.0"))


def _working_bytes(
    tile: int, n_nodes: int, n_leaves: int, s_pad: int, mode: str,
    n_slots: int = 0, n_blocks: int = 1, want_dleaf: bool = True,
    n_seed: int = 1,
) -> int:
    """Estimated VMEM bytes of one kernel program (f32).

    Modes: 'fwd' (classic whole-tree scratch), 'slot' (DFS slot-reuse
    scratch, O(depth)), 'stream' (slot scratch + HBM-streamed leaves —
    no leaf input block at all, only the 2 x cmax DMA landing pad),
    'save' (buf/logscale as output blocks), 'bwd' (residual inputs +
    outside-vector scratch + dP/dleaf outputs).
    ``n_blocks > 1``: category-folded forward — scratch rows and the P
    block widen to ``n_blocks * s_pad``; the leaf input block does not.
    """
    s_tot = n_blocks * s_pad
    p_bytes = 4 * n_nodes * s_tot * s_tot
    leaf = 2 * n_leaves * s_pad            # leaf input block, x2 pipelining
    if mode == "fwd":
        per_site = n_nodes * (s_tot + n_blocks) + leaf + 4 * (s_tot + n_blocks)
    elif mode == "slot":
        per_site = n_slots * (s_pad + 1) + leaf + 4 * s_pad
    elif mode == "stream":
        # P and leaves stay in HBM; VMEM = slot scratch + DMA landing pads
        cmax = 2  # schedules are binarized (trees.compile_schedule)
        per_site = n_slots * (s_pad + 1) + 2 * cmax * s_pad + 4 * s_pad
        p_bytes = 4 * 2 * cmax * s_pad * s_pad
    elif mode == "save":
        # buf/ls output blocks x2 pipelining + leaf/lsc input blocks x2;
        # P input block x2 (measured: a 228-node protein segment's
        # backward hit 21.7M where the old single-counted formula said
        # 13M — the compiler double-buffers EVERY revisited block)
        per_site = 2 * n_nodes * (s_pad + 1) + 2 * n_leaves * (s_pad + 1)
        p_bytes *= 2
    elif mode == "bwd":
        per_site = (
            3 * n_nodes * s_pad            # buf input x2 + g scratch
            + 2 * n_nodes                  # logscale input x2
            + 2 * n_leaves * s_pad         # dleaf output block x2
            + 2 * 16 * s_pad               # seed input x2 (<=16 seeds)
        )
        p_bytes *= 6                       # p, p^T inputs + dp output, each x2
    elif mode == "bwd2":
        # deferred-edge reverse (_dynamic_bwd2_kernel): saveall residuals
        # in, gybuf scratch, batched dp/dleaf epilogue
        per_site = (
            2 * n_nodes * s_pad            # buf input x2
            + 2 * n_nodes                  # logscale input x2
            + n_nodes * s_pad              # gybuf scratch
            + (2 * n_leaves * s_pad if want_dleaf else 0)  # dleaf out x2
            + 2 * n_seed * s_pad           # seed input x2
        )
        p_bytes *= 6                       # p, p^T inputs + dp output, each x2
    else:
        raise ValueError(mode)
    total = 4 * tile * per_site + p_bytes
    if mode in ("save", "bwd2") and VMEM_MARGIN != 1.0:
        total = int(total * VMEM_MARGIN)
    if mode == "bwd":
        # Empirical calibration (TPU v5e, 2026-08-17): Mosaic's scoped-
        # vmem accounting for the OLD many-blocked backward runs ~1.9x
        # the itemized block sum when an outer vmap adds a batch grid
        # axis (measured 23.4M vs 12.4M itemized on a 197-node protein
        # segment backward). Double the estimate so tile/segment sizing
        # stays inside the hard 16M limit. Re-measured 2026-08-20 for
        # 'save' and 'bwd2': both ACCEPTED and ran (vmapped B=64) at
        # itemized 13.5-19.5 MB — the 1.9x factor is bwd-specific, and
        # dropping it here doubles the grad-path tile (256 -> 1024 on
        # the flagship; bwd2 0.184 -> 0.101 ms measured).
        total *= 2
    return total


def _pick_tile(
    tile: int, sites: int, n_nodes: int, n_leaves: int, s_pad: int,
    mode: str = "fwd", n_slots: int = 0, n_blocks: int = 1,
    want_dleaf: bool = True, n_seed: int = 1,
) -> int:
    """Shrink the site tile until the kernel's VMEM working set fits."""
    tile = min(tile, _round_up(sites, LANE))  # don't pad tiny alignments
    while tile > LANE:
        if (
            _working_bytes(
                tile, n_nodes, n_leaves, s_pad, mode, n_slots, n_blocks,
                want_dleaf, n_seed,
            )
            <= VMEM_BUDGET
        ):
            break
        tile //= 2
    return tile


def _slot_count(schedule: PruningSchedule) -> int:
    return _dfs_slot_schedule(schedule)[5]


def pallas_supported(
    schedule: PruningSchedule, n_states: int, mode: str = "fwd"
) -> bool:
    """Does the kernel's working set fit VMEM at the minimum site tile?

    For the forward ('fwd') this already accounts for the fallback chain
    big trees run: classic whole-tree scratch -> O(depth) slot-reuse ->
    slot-reuse with HBM-streamed leaves. The likelihood engine uses this
    to fall back to the XLA path (forward) or the XLA VJP (backward) on
    oversized trees instead of failing inside Mosaic.
    """
    s_pad = _state_pad(n_states)
    if mode == "fwd":
        if (
            _working_bytes(LANE, schedule.n_nodes, schedule.n_leaves,
                           s_pad, "fwd")
            <= VMEM_BUDGET
        ):
            return True
        n_slots = _slot_count(schedule)
        return any(
            _working_bytes(
                LANE, schedule.n_nodes, schedule.n_leaves, s_pad, m, n_slots
            )
            <= VMEM_BUDGET
            for m in ("slot", "stream")
        )
    n_slots = _slot_count(schedule) if mode in ("slot", "stream") else 0
    return (
        _working_bytes(
            LANE, schedule.n_nodes, schedule.n_leaves, s_pad, mode, n_slots
        )
        <= VMEM_BUDGET
    )


def _pad_inputs(p_matrices, leaf_partials, s, s_pad, sites, sites_pad):
    """Kernel layout: P category-major+padded; leaves state-major+padded."""
    # (K, n_nodes, S_pad, S_pad): category-major so each program slices one k.
    p = jnp.transpose(p_matrices.astype(jnp.float32), (1, 0, 2, 3))
    p = jnp.pad(p, ((0, 0), (0, 0), (0, s_pad - s), (0, s_pad - s)))
    # (n_leaves, S_pad, sites_pad), padded slots = 1.0 (harmless: padded
    # states are zeroed by P's zero rows; padded sites are sliced off).
    lp = jnp.transpose(leaf_partials.astype(jnp.float32), (0, 2, 1))
    lp = jnp.pad(
        lp, ((0, 0), (0, s_pad - s), (0, sites_pad - sites)),
        constant_values=1.0,
    )
    return p, lp


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
    slot_data=None,
):
    k = p_matrices.shape[1]
    sites = leaf_partials.shape[1]
    s = leaf_partials.shape[2]
    s_pad = _state_pad(s)
    n_internal = order.shape[0]
    cmax = children.shape[1]
    static = n_internal <= STATIC_UNROLL_MAX
    # classic whole-tree scratch when it fits; otherwise the O(depth)
    # slot-reuse kernel (big trees). For WIDE states (S_pad >= 32:
    # codon) the HBM-streaming slot kernel is the DEFAULT — the r5
    # decision sweep (benchmarks/codon_ab.py on TPU v5e, 2026-08-20)
    # measured stream >= classic at every point: 100 taxa x 1024 codon
    # patterns 331.6k vs 327.0k patterns/s (+1.4%), 300 taxa x 1024
    # 152.7k vs 151.4k (+0.8%), logL spreads <= 7e-6 — the P input
    # block's VMEM traffic never wins once the per-child DMA is double-
    # buffered. PHYLO_FORCE_STREAM=1 forces streaming at ANY width,
    # =0 disables it where the classic block fits (narrow-state
    # measurements showed classic ahead there; stream also serializes
    # outer vmaps — see the sequential_vmap note below — which the
    # saturated wide-state kernel doesn't mind but narrow ones would).
    stream_env = os.environ.get("PHYLO_FORCE_STREAM", "auto")
    force_stream = (
        slot_data is not None
        and not static
        and (
            stream_env == "1"
            or (stream_env == "auto" and s_pad >= 32)
        )
    )
    use_slots = force_stream or (
        slot_data is not None
        and _working_bytes(LANE, n_nodes, n_leaves, s_pad, "fwd")
        > VMEM_BUDGET
    )
    fold = 1
    # DNA sublane packing: 4 real states occupy only half of the minimum
    # 8-sublane f32 tile, so TWO rate categories pack into one tile
    # (block-diagonal 4+4 P, per-block rescale) and the grid's category
    # axis halves. MEASURED NEGATIVE on TPU v5e (benchmarks/group_ab.py,
    # 2026-08-20, flagship 64-taxon GTR+G4): packed fwd 0.167 ms vs
    # 0.066 unpacked — the per-block rescale's 4-row sub-sublane slices
    # (below the 8-sublane f32 tile) force masked relayouts that cost
    # far more than the halved loads/steps save, and the block-diagonal
    # contraction loses the n_real=4 column trim (8 outer products vs 4).
    # DEFAULT OFF; kept as an exact, tested, env-gated lowering
    # (PHYLO_PACK_DNA=1) in case a future Mosaic handles sub-tile
    # reductions natively.
    pack = (
        os.environ.get("PHYLO_PACK_DNA", "0") == "1"
        and not use_slots and not static and s == 4 and s_pad == 8
        and k % 2 == 0 and k >= 2
    )
    if pack:
        s_pad = 4
        fold = 2
    elif not use_slots and not static:
        fold = _pick_fold(k, s_pad)
        while fold > 1 and (
            k % fold or fold * s_pad > LANE
            or _working_bytes(
                LANE, n_nodes, n_leaves, s_pad, "fwd", n_blocks=fold
            ) > VMEM_BUDGET
        ):
            fold -= 1
    kf = k // fold
    s_tot = fold * s_pad
    use_stream = False
    if use_slots:
        use_stream = force_stream or (
            _working_bytes(
                LANE, n_nodes, n_leaves, s_pad, "slot", slot_data[5]
            )
            > VMEM_BUDGET
        )
        tile = _pick_tile(
            tile, sites, n_nodes, n_leaves, s_pad,
            "stream" if use_stream else "slot", slot_data[5],
        )
    else:
        tile = _pick_tile(
            tile, sites, n_nodes, n_leaves, s_pad, "fwd", n_blocks=fold
        )
    sites_pad = _round_up(sites, tile)
    dtype = jnp.float32

    p, lp = _pad_inputs(p_matrices, leaf_partials, s, s_pad, sites, sites_pad)
    if fold > 1:
        # block-diagonal P per folded group: (kf, n_nodes, s_tot, s_tot)
        pf = p.reshape(kf, fold, n_nodes, s_pad, s_pad)
        pb = jnp.zeros((kf, n_nodes, s_tot, s_tot), dtype)
        for b in range(fold):
            pb = pb.at[
                :, :, b * s_pad:(b + 1) * s_pad, b * s_pad:(b + 1) * s_pad
            ].set(pf[:, b])
        p = pb

    n_tiles = sites_pad // tile

    # NOTE: zero offsets are derived from the (i32) grid indices rather than
    # written as literals — under jax_enable_x64 literal 0s trace as i64 and
    # Mosaic refuses the mixed-width index tuple ("failed to legalize
    # 'func.return'").
    tensor_in_specs = [
        pl.BlockSpec(
            (1, n_nodes, s_tot, s_tot),
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
            (1, s_tot, tile),
            lambda t, kk, *_: (kk, kk * 0, t),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, fold, tile),
            lambda t, kk, *_: (kk, kk * 0, t),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((kf, s_tot, sites_pad), dtype),
        jax.ShapeDtypeStruct((kf, fold, sites_pad), dtype),
    ]

    if use_slots:
        nslot, cnode, csrc, cleaf, counts2, n_slots, root_slot = slot_data
        # leaf-block slot kernel when the block fits; otherwise stream
        # leaves from HBM (see _dynamic_slot_stream_kernel)
        if use_stream:
            kernel = functools.partial(
                _dynamic_slot_stream_kernel,
                n_leaves=n_leaves, n_slots=n_slots,
                n_internal=n_internal, cmax=cmax, s_pad=s_pad,
                tile=tile, root_slot=root_slot, n_real=s,
            )
            in_specs = [
                pl.BlockSpec(memory_space=pl.ANY),   # P stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),   # leaves stay in HBM
            ]
            scratch = [
                pltpu.VMEM((n_slots, s_pad, tile), dtype),
                pltpu.VMEM((n_slots, 1, tile), dtype),
                pltpu.VMEM((2, cmax, s_pad, tile), dtype),
                pltpu.VMEM((2, cmax, s_pad, LANE), dtype),
                pltpu.SemaphoreType.DMA((2, cmax)),
                pltpu.SemaphoreType.DMA((2, cmax)),
            ]
            # lane-align P's minor dim for DMA (see pbuf comment)
            p = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (0, LANE - s_tot)))
            # node i+1's schedule at column i (zeros past the end -> the
            # final lookahead is a no-op); see kernel docstring
            cnode_nxt = np.vstack([cnode[1:], np.zeros((1, cmax), np.int32)])
            csrc_nxt = np.vstack([csrc[1:], np.zeros((1, cmax), np.int32)])
            cleaf_nxt = np.vstack([cleaf[1:], np.zeros((1, cmax), np.int32)])
            cnt_nxt = np.append(counts2[1:], np.int32(0))
            prefetch = (
                jnp.asarray(nslot), jnp.asarray(cnode.T.copy()),
                jnp.asarray(csrc.T.copy()), jnp.asarray(cleaf.T.copy()),
                jnp.asarray(counts2), jnp.asarray(cnode_nxt.T.copy()),
                jnp.asarray(csrc_nxt.T.copy()),
                jnp.asarray(cleaf_nxt.T.copy()), jnp.asarray(cnt_nxt),
            )
        else:
            kernel = functools.partial(
                _dynamic_slot_kernel,
                n_leaves=n_leaves, n_slots=n_slots,
                n_internal=n_internal, cmax=cmax, s_pad=s_pad,
                root_slot=root_slot, n_real=s,
            )
            in_specs = tensor_in_specs
            scratch = [
                pltpu.VMEM((n_slots, s_pad, tile), dtype),
                pltpu.VMEM((n_slots, 1, tile), dtype),
            ]
            prefetch = (
                jnp.asarray(nslot), jnp.asarray(cnode.T.copy()),
                jnp.asarray(csrc.T.copy()), jnp.asarray(cleaf.T.copy()),
                jnp.asarray(counts2),
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(n_tiles, k),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )

        def call(*args):
            return pl.pallas_call(
                kernel,
                out_shape=out_shape,
                grid_spec=grid_spec,
                interpret=interpret,
            )(*args)

        if use_stream:
            # vmap cannot slice an ANY-memory-space (HBM) operand into
            # blocks; batched evals over a big tree serialize instead —
            # each kernel call already fills the chip, so lax.map loses
            # nothing.
            call = jax.custom_batching.sequential_vmap(call)
        root_p, root_sc = call(*prefetch, p, lp)
        root_partials = jnp.transpose(root_p[:, :s, :sites], (0, 2, 1))
        root_logscale = (
            root_sc[:, 0, :sites].astype(jnp.result_type(float)) * LN2
        )
        out_dtype = leaf_partials.dtype
        return (
            root_partials.astype(out_dtype), root_logscale.astype(out_dtype)
        )

    # grouped (level-batched) walk: classic lowering only (slot/stream
    # have their own access patterns; composes with DNA packing); +1
    # scratch row = pad trash
    group_u = _group_size(s_pad)
    use_group = (
        group_u > 0 and not static and (fold == 1 or pack)
        and n_internal >= 2
    )
    n_alloc = n_nodes + 1 if use_group else n_nodes
    scratch_shapes = [
        pltpu.VMEM((n_alloc, s_tot, tile), dtype),
        pltpu.VMEM((n_alloc, fold, tile), dtype),
    ]
    if static:
        kernel = functools.partial(
            _static_kernel,
            order=order, children=children, counts=counts,
            n_leaves=n_leaves, s_pad=s_pad, n_real=s,
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
        if use_group:
            og, cg, ng = _group_walk_schedule(
                order, children, counts, n_leaves, group_u, n_nodes
            )
            kernel = functools.partial(
                _dynamic_kernel,
                n_leaves=n_leaves, n_internal=n_internal, cmax=cmax,
                s_pad=s_pad, n_blocks=fold, n_real=s,
                group=group_u, n_groups=og.shape[0],
                root=int(order[-1]),
            )
            prefetch = (
                jnp.asarray(og.T.copy()),
                jnp.asarray(cg.reshape(og.shape[0], -1).T.copy()),
                jnp.asarray(ng.T.copy()),
            )
        else:
            kernel = functools.partial(
                _dynamic_kernel,
                n_leaves=n_leaves, n_internal=n_internal, cmax=cmax,
                s_pad=s_pad, n_blocks=fold, n_real=s,
            )
            prefetch = (
                jnp.asarray(order), jnp.asarray(children.T.copy()),
                jnp.asarray(counts),
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles, kf),
            in_specs=tensor_in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        root_p, root_sc = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
        )(*prefetch, p, lp)

    # un-fold: block b of folded group g is category g*fold + b
    root_p = root_p.reshape(k, s_pad, sites_pad)
    root_partials = jnp.transpose(root_p[:, :s, :sites], (0, 2, 1))
    root_logscale = (
        root_sc.reshape(k, sites_pad)[:, :sites]
        .astype(jnp.result_type(float)) * LN2
    )
    out_dtype = leaf_partials.dtype
    return root_partials.astype(out_dtype), root_logscale.astype(out_dtype)


def make_pallas_prune_fn(
    schedule: PruningSchedule,
    tile: int = 16 * LANE,
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
        slot_data=_dfs_slot_schedule(schedule),
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


# ---------------------------------------------------------------------------
# Differentiable fused path: Pallas forward with residuals + Pallas backward
# ---------------------------------------------------------------------------


def _saveall_call(
    p_pad, lp_k, lsc_k, *,
    order, children, counts, n_nodes, n_leaves, tile, interpret,
    n_real=None, group=0,
):
    """Run the saveall kernel on pre-padded kernel-layout inputs.

    ``p_pad (K, n_nodes, S_pad, S_pad)``, ``lp_k (K, n_leaves, S_pad,
    sites_pad)`` (per-category leaves: segment-boundary inputs differ by
    category; real leaves are broadcast), ``lsc_k (K, n_leaves, 1,
    sites_pad)`` input logscales. Returns ``(buf_all, ls_all)`` —
    with ``group > 0`` (grouped walk) these carry n_nodes + 1 rows, the
    last being the pad-slot trash row (callers index real node ids only;
    the matching grouped ``_bwd2_call`` consumes the extra row layout).
    """
    k, _, s_pad, _ = p_pad.shape
    sites_pad = lp_k.shape[3]
    n_internal = order.shape[0]
    cmax = children.shape[1]
    group = group if n_internal >= 2 else 0
    n_alloc = n_nodes + 1 if group else n_nodes
    tile = _pick_tile(tile, sites_pad, n_nodes, n_leaves, s_pad, "save")
    while sites_pad % tile:
        tile //= 2
    n_tiles = sites_pad // tile

    if group:
        og, cg, ng = _group_walk_schedule(
            order, children, counts, n_leaves, group, n_nodes
        )
        kernel = functools.partial(
            _dynamic_saveall_kernel,
            n_leaves=n_leaves, n_internal=n_internal, cmax=cmax,
            s_pad=s_pad, n_real=n_real,
            group=group, n_groups=og.shape[0],
        )
        prefetch = (
            jnp.asarray(og.T.copy()),
            jnp.asarray(cg.reshape(og.shape[0], -1).T.copy()),
            jnp.asarray(ng.T.copy()),
        )
    else:
        kernel = functools.partial(
            _dynamic_saveall_kernel,
            n_leaves=n_leaves, n_internal=n_internal, cmax=cmax,
            s_pad=s_pad, n_real=n_real,
        )
        prefetch = (
            jnp.asarray(order), jnp.asarray(children.T.copy()),
            jnp.asarray(counts),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, k),
        in_specs=[
            pl.BlockSpec(
                (1, n_nodes, s_pad, s_pad),
                lambda t, kk, *_: (kk, kk * 0, kk * 0, kk * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_leaves, s_pad, tile),
                lambda t, kk, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_leaves, 1, tile),
                lambda t, kk, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, n_alloc, s_pad, tile),
                lambda t, kk, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_alloc, 1, tile),
                lambda t, kk, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    buf_all, ls_all = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((k, n_alloc, s_pad, sites_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, n_alloc, 1, sites_pad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(*prefetch, p_pad, lp_k, lsc_k)
    return buf_all, ls_all


def _backward_call(
    p_pad, pt_pad, buf_all, ls_all, gseeds, seed_ids, *,
    order, children, counts, n_nodes, n_leaves, tile, interpret,
    n_real=None,
):
    """Reverse walk seeded at ``seed_ids`` (numpy, static): returns
    ``(dp_pad (K, n_nodes, S_pad, S_pad),
    dleaf_k (K, n_leaves, S_pad, sites_pad))``.
    ``gseeds (K, n_seed, S_pad, sites_pad)`` are the cotangents of the
    seed nodes' (rescaled) partials."""
    k, _, s_pad, sites_pad = buf_all.shape
    n_internal = order.shape[0]
    cmax = children.shape[1]
    n_seed = int(seed_ids.shape[0])
    tile = _pick_tile(tile, sites_pad, n_nodes, n_leaves, s_pad, "bwd")
    while sites_pad % tile:
        tile //= 2
    n_tiles = sites_pad // tile

    kernel = functools.partial(
        _dynamic_bwd_kernel,
        seed_ids=np.asarray(seed_ids, np.int32),
        n_leaves=n_leaves, n_internal=n_internal, cmax=cmax, s_pad=s_pad,
        n_real=n_real,
    )
    # grid (k, n_tiles): site tiles iterate FASTEST so the dP output block
    # (one per k, indexed (kk, 0, 0, 0)) is revisited consecutively and
    # accumulates in VMEM across tiles.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, n_nodes, s_pad, s_pad),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, kk * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_nodes, s_pad, s_pad),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, kk * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_nodes, s_pad, tile),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_nodes, 1, tile),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_seed, s_pad, tile),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, n_nodes, s_pad, s_pad),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, kk * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_leaves, s_pad, tile),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_nodes, s_pad, tile), jnp.float32),
        ],
    )
    # pre-reversed (top-down) schedule arrays — see kernel NOTE
    dp_pad, dleaf_k = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((k, n_nodes, s_pad, s_pad), jnp.float32),
            jax.ShapeDtypeStruct(
                (k, n_leaves, s_pad, sites_pad), jnp.float32
            ),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(order[::-1].copy()),
      jnp.asarray(children[::-1].T.copy()),
      jnp.asarray(counts[::-1].copy()),
      p_pad, pt_pad, buf_all, ls_all, gseeds)
    return dp_pad, dleaf_k


def _bwd2_call(
    p_pad, pt_pad, buf_all, ls_all, gseeds, seed_ids, *,
    order, children, counts, n_nodes, n_leaves, tile, interpret,
    n_real=None, want_dleaf=True, group=0,
):
    """Deferred-edge reverse walk: returns ``(dp_pad (K, n_nodes, S_pad,
    S_pad)[, dleaf_k (K, n_leaves, S_pad, sites_pad)])``.

    Same residuals and seed semantics as _backward_call (the classic
    saveall outputs; ``gseeds (K, n_seed, S_pad, sites_pad)`` are the
    cotangents of the ``seed_ids`` nodes' rescaled partials — the root
    for whole trees, the boundary outputs for segments). ``pt_pad`` must
    have every SEED row set to the identity (the kernel's uniform
    g = P^T gy step then reproduces each seed exactly); the caller must
    also zero ``dp_pad[:, seed_ids]`` afterwards (seed nodes have no
    parent edge inside this walk).

    ``group > 0``: grouped reverse walk over the same Hu groups as the
    forward (reverse group order). ``buf_all``/``ls_all`` may come from a
    grouped ``_saveall_call`` (n_nodes + 1 rows incl. the pad trash row);
    the block specs read only the first n_nodes rows — pad visits clamp
    their node id in-kernel, so the reverse kernel's VMEM footprint is
    independent of the grouping."""
    k, _, s_pad, sites_pad = buf_all.shape
    n_internal = order.shape[0]
    cmax = children.shape[1]
    group = group if n_internal >= 2 else 0
    assert buf_all.shape[1] in (n_nodes, n_nodes + 1)
    seed_ids = np.asarray(seed_ids, np.int32)
    n_seed = int(seed_ids.shape[0])
    tile = _pick_tile(tile, sites_pad, n_nodes, n_leaves, s_pad, "bwd2",
                      want_dleaf=want_dleaf, n_seed=n_seed)
    while sites_pad % tile:
        tile //= 2
    n_tiles = sites_pad // tile

    kernel = functools.partial(
        _dynamic_bwd2_kernel,
        seed_ids=seed_ids,
        n_leaves=n_leaves, n_internal=n_internal, cmax=cmax, s_pad=s_pad,
        n_real=n_real, want_dleaf=want_dleaf, n_nodes=n_nodes,
    )
    if group:
        og, cg, ng = _group_walk_schedule(
            order, children, counts, n_leaves, group, n_nodes
        )
        kernel = functools.partial(
            kernel, group=group, n_groups=og.shape[0],
        )
    out_shape = [
        jax.ShapeDtypeStruct((k, n_nodes, s_pad, s_pad), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, n_nodes, s_pad, s_pad),
            lambda kk, t, *_: (kk, kk * 0, kk * 0, kk * 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if want_dleaf:
        out_shape.append(
            jax.ShapeDtypeStruct(
                (k, n_leaves, s_pad, sites_pad), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, n_leaves, s_pad, tile),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            )
        )
    # grid (k, n_tiles): site tiles iterate FASTEST so the dP output block
    # accumulates in VMEM across tiles (same layout as _backward_call)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, n_nodes, s_pad, s_pad),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, kk * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_nodes, s_pad, s_pad),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, kk * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_nodes, s_pad, tile),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_nodes, 1, tile),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_seed, s_pad, tile),
                lambda kk, t, *_: (kk, kk * 0, kk * 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n_nodes, s_pad, tile), jnp.float32),    # gybuf
        ],
    )
    if group:
        gg = og.shape[0]
        prefetch = (
            jnp.asarray(og[::-1].T.copy()),
            jnp.asarray(cg[::-1].reshape(gg, -1).T.copy()),
            jnp.asarray(ng[::-1].T.copy()),
        )
    else:
        # pre-reversed (top-down) schedule arrays — see _dynamic_bwd_kernel
        prefetch = (
            jnp.asarray(order[::-1].copy()),
            jnp.asarray(children[::-1].T.copy()),
            jnp.asarray(counts[::-1].copy()),
        )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(*prefetch, p_pad, pt_pad, buf_all, ls_all, gseeds)


def _dfs_internal_post(schedule: PruningSchedule):
    """(DFS post-order list of internal node ids, child map, root)."""
    order, children, counts = _postorder_arrays(schedule)
    n_leaves = schedule.n_leaves
    kids = {
        int(order[i]): [int(children[i, c]) for c in range(int(counts[i]))]
        for i in range(order.shape[0])
    }
    root = int(order[-1])
    post, stack = [], [(root, False)]
    while stack:
        node, done = stack.pop()
        if node < n_leaves:
            continue
        if done:
            post.append(node)
        else:
            stack.append((node, True))
            for ch in kids[node]:
                stack.append((ch, False))
    return post, kids, root


class _Segment:
    """One VMEM-sized chunk of the pruning walk (host-side descriptor).

    Children of a chunk's internal nodes that live outside the chunk
    become *virtual leaves*: real alignment leaves, or boundary nodes
    computed by an earlier segment. Local node ids are
    [0, n_vleaf) virtual leaves then [n_vleaf, n_vleaf + n_int) internals.
    """

    __slots__ = (
        "int_nodes", "vleaf_global", "vleaf_is_leaf", "order", "children",
        "counts", "p_gather", "boundary_local", "boundary_global",
        "vleaf_anc_boundary", "n_nodes", "n_leaves",
    )


def _segment_schedules(schedule: PruningSchedule, s_pad: int, budget: int):
    """Greedy contiguous partition of the DFS post-order walk.

    Packs internal nodes into segments whose save- AND bwd-mode VMEM
    working sets fit ``budget`` at the minimum site tile. Contiguity in
    DFS post-order guarantees every child is in the same or an earlier
    segment. Returns a list of _Segment.
    """
    post, kids, root = _dfs_internal_post(schedule)
    n_leaves = schedule.n_leaves
    cmax = schedule.n_children_max

    def seg_cost(ints):
        vleaf = set()
        sset = set(ints)
        for n in ints:
            for ch in kids[n]:
                if ch not in sset:
                    vleaf.add(ch)
        n_loc = len(ints) + len(vleaf)
        return max(
            _working_bytes(LANE, n_loc, len(vleaf), s_pad, "save"),
            _working_bytes(LANE, n_loc, len(vleaf), s_pad, "bwd"),
        )

    chunks, cur = [], []
    for node in post:
        if cur and seg_cost(cur + [node]) > budget:
            chunks.append(cur)
            cur = [node]
        else:
            cur = cur + [node]
    if cur:
        chunks.append(cur)

    # which internals are referenced by LATER chunks (boundary outputs)
    seg_of = {}
    for si, ints in enumerate(chunks):
        for n in ints:
            seg_of[n] = si

    segments = []
    for si, ints in enumerate(chunks):
        sset = set(ints)
        vleaf_global, seen = [], set()
        for n in ints:
            for ch in kids[n]:
                if ch not in sset and ch not in seen:
                    seen.add(ch)
                    vleaf_global.append(ch)
        local = {g: j for j, g in enumerate(vleaf_global)}
        nv = len(vleaf_global)
        for r, g in enumerate(ints):
            local[g] = nv + r
        order_l = np.asarray([local[g] for g in ints], np.int32)
        children_l = np.zeros((len(ints), cmax), np.int32)
        counts_l = np.zeros((len(ints),), np.int32)
        for r, g in enumerate(ints):
            ks = kids[g]
            counts_l[r] = len(ks)
            for c, ch in enumerate(ks):
                children_l[r, c] = local[ch]
        seg = _Segment()
        seg.int_nodes = np.asarray(ints, np.int32)
        seg.vleaf_global = np.asarray(vleaf_global, np.int32)
        seg.vleaf_is_leaf = np.asarray(
            [g < n_leaves for g in vleaf_global], bool
        )
        seg.order = order_l
        seg.children = children_l
        seg.counts = counts_l
        # P rows for every LOCAL node id (vleaves first, then internals):
        # the kernel contracts P by child id, and children may be vleaves
        seg.p_gather = np.asarray(vleaf_global + ints, np.int32)
        segments.append(seg)

    # boundary outputs: internals consumed by later segments (+ the root)
    consumed_later = [set() for _ in chunks]
    for si, seg in enumerate(segments):
        for g, is_l in zip(seg.vleaf_global, seg.vleaf_is_leaf):
            if not is_l:
                consumed_later[seg_of[int(g)]].add(int(g))
    for si, seg in enumerate(segments):
        outs = sorted(consumed_later[si])
        if root in seg.int_nodes and root not in outs:
            outs.append(root)
        seg.boundary_global = np.asarray(outs, np.int32)
        nv = len(seg.vleaf_global)
        rank = {int(g): r for r, g in enumerate(seg.int_nodes)}
        seg.boundary_local = np.asarray(
            [nv + rank[g] for g in outs], np.int32
        )
        seg.n_nodes = nv + len(seg.int_nodes)
        seg.n_leaves = nv
    # each virtual leaf's ancestor boundary output WITHIN its segment: the
    # segment is a forest whose tree roots are exactly the boundary
    # outputs (a node with its parent in the same segment is consumed
    # there, never later), so climbing parents always lands on one. Used
    # to route input-logscale cotangents: a vleaf's lsc adds exactly once
    # into its tree root's output lsc.
    for seg in segments:
        pmap = {}
        for g in seg.int_nodes:
            for ch in kids[int(g)]:
                pmap[ch] = int(g)
        bidx = {int(g): j for j, g in enumerate(seg.boundary_global)}
        anc = []
        for g in seg.vleaf_global:
            node = pmap[int(g)]
            while node not in bidx:
                node = pmap[node]
            anc.append(bidx[node])
        seg.vleaf_anc_boundary = np.asarray(anc, np.int32)
    return segments


def make_pallas_loglik_fn(
    schedule: PruningSchedule,
    tile: int = 16 * LANE,
    interpret: bool = None,
    n_states: int = None,
    diff_leaves: bool = True,
):
    """Fused differentiable per-(category, site) log-likelihood.

    Returns ``f(p_matrices (n_nodes, K, S, S), leaf_partials
    (n_leaves, sites, S), freqs (S,)) -> ll (K, sites)`` with
    ``ll[k, s] = log(sum_i freqs_i * true_root_partials[k, s, i])`` — the
    root reduction is fused so the pair (partials, logscale) never crosses
    the autodiff boundary in the whole-tree case. The reduction runs in
    ``freqs.dtype`` (pass f64 freqs for the precision plan); pruning runs
    f32 in VMEM.

    The plain (non-differentiated) call runs the fast fused forward
    (``_pallas_forward`` — slot/stream lowerings included); gradients run
    a save-everything forward plus a second Pallas kernel over the saved
    per-node partials (``_dynamic_bwd_kernel``).

    **Segmented big-tree mode**: when the whole-tree saveall/backward
    working set exceeds VMEM, the post-order walk is partitioned into
    VMEM-sized SEGMENTS (``_segment_schedules``); each segment is its own
    saveall+backward ``custom_vjp`` and segments chain through
    per-category boundary (partials, logscale) tensors in HBM. Freezing
    each segment's rescale divisors stays exact because the end-to-end
    logL is algebraically invariant to every rescaling constant (the
    divisor is always paired with its +log m term). This removes the
    gradient path's tree-size ceiling — any tree that fits HBM
    differentiates at kernel speed.

    ``diff_leaves=False`` declares leaf partials constant: the backward
    kernel skips their cotangent entirely (no dleaf output block, no P^T
    propagation into leaf rows) and the VJP returns zeros for them. Every
    engine fit/grad workload qualifies (leaves are data); pass True when
    differentiating w.r.t. leaf partials themselves.

    Reference parity: supersedes the Cython sitewise derivative kernels
    (phylo_utils/likcalc.pyx, SURVEY.md §3.3) with exact whole-tree
    gradients.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    order, children, counts = _postorder_arrays(schedule)
    n_nodes, n_leaves = schedule.n_nodes, schedule.n_leaves
    common = dict(
        order=order, children=children, counts=counts,
        n_nodes=n_nodes, n_leaves=n_leaves, tile=tile, interpret=interpret,
    )
    root = int(order[-1])
    _hi = jax.lax.Precision.HIGHEST

    slot_data = _dfs_slot_schedule(schedule)

    def fast_parts(p_matrices, leaf_partials, freqs):
        root_p, root_sc = _pallas_forward(
            p_matrices, leaf_partials, slot_data=slot_data, **common
        )
        rdt = freqs.dtype
        dot = jnp.einsum(
            "ksi,i->ks", root_p.astype(rdt), freqs, precision=_hi
        )
        return dot, root_sc.astype(rdt), root_p

    def fast_ll(p_matrices, leaf_partials, freqs):
        dot, root_sc, _ = fast_parts(p_matrices, leaf_partials, freqs)
        return jnp.log(dot) + root_sc

    # deferred-edge reverse (bwd2: serial loop = pure-VPU cotangent
    # propagation, ALL dp's in one batched MXU epilogue) when its working
    # set fits; PHYLO_DEFERRED_VJP=0 forces the classic per-node reverse
    # (_backward_call), =1 forces bwd2 (measurement knobs)
    bwd2_env = os.environ.get("PHYLO_DEFERRED_VJP", "auto")

    def _use_bwd2(s_pad):
        return bwd2_env != "0" and (
            bwd2_env == "1"
            or _working_bytes(LANE, n_nodes, n_leaves, s_pad, "bwd2",
                              want_dleaf=diff_leaves)
            <= VMEM_BUDGET
        )

    whole_tree = n_states is None or (
        pallas_supported(schedule, n_states, "save")
        and (
            _use_bwd2(_state_pad(n_states))
            or pallas_supported(schedule, n_states, "bwd")
        )
    )

    if whole_tree:
        root_ids = np.asarray([root], np.int32)

        @jax.custom_vjp
        def site_cat_ll(p_matrices, leaf_partials, freqs):
            return fast_ll(p_matrices, leaf_partials, freqs)

        def fwd(p_matrices, leaf_partials, freqs):
            k = p_matrices.shape[1]
            sites = leaf_partials.shape[1]
            s = leaf_partials.shape[2]
            s_pad = _state_pad(s)
            t_eff = _pick_tile(tile, sites, n_nodes, n_leaves, s_pad, "save")
            sites_pad = _round_up(sites, t_eff)
            p_pad, lp = _pad_inputs(
                p_matrices, leaf_partials, s, s_pad, sites, sites_pad
            )
            lp_k = jnp.broadcast_to(lp[None], (k,) + lp.shape)
            lsc_k = jnp.zeros((k, n_leaves, 1, sites_pad), jnp.float32)
            # grouped walk only when the matching grouped bwd2 consumes
            # the (n_nodes + 1)-row residual layout
            grp = _group_size(s_pad) if _use_bwd2(s_pad) else 0
            buf_all, ls_all = _saveall_call(
                p_pad, lp_k, lsc_k, n_real=s, group=grp, **common
            )
            rdt = freqs.dtype
            root_pp = buf_all[:, root, :s, :sites]      # (K, S, sites)
            dot = jnp.einsum(
                "kis,i->ks", root_pp.astype(rdt), freqs, precision=_hi
            )
            ll = jnp.log(dot) + ls_all[:, root, 0, :sites].astype(rdt) * LN2
            p_tok = jnp.zeros((0,), p_matrices.dtype)
            leaf_tok = jnp.zeros((0,), leaf_partials.dtype)
            return ll, (p_tok, leaf_tok, p_pad, buf_all, ls_all, dot, freqs)

        def bwd(res, ct):
            p_tok, leaf_tok, p_pad, buf_all, ls_all, dot, freqs = res
            sites_pad = buf_all.shape[3]
            s_pad = buf_all.shape[2]
            sites = dot.shape[1]
            s = freqs.shape[0]
            rdt = dot.dtype
            lam = ct / dot                               # (K, sites) rdt
            lam32 = jnp.pad(
                lam.astype(jnp.float32), ((0, 0), (0, sites_pad - sites))
            )
            f32f = jnp.zeros((s_pad,), jnp.float32).at[:s].set(
                freqs.astype(jnp.float32)
            )
            gseeds = (
                lam32[:, None, None, :] * f32f[None, None, :, None]
            )                                            # (K, 1, S_pad, sp)
            pt_pad = jnp.swapaxes(p_pad, -1, -2)
            if _use_bwd2(s_pad):
                grp = _group_size_bwd(s_pad)
                # root's pt row := identity so the kernel's uniform
                # g = P^T gy step reproduces the seed exactly at the root
                outs = _bwd2_call(
                    p_pad,
                    pt_pad.at[:, root].set(
                        jnp.eye(s_pad, dtype=jnp.float32)
                    ),
                    buf_all, ls_all, gseeds, root_ids,
                    n_real=s, want_dleaf=diff_leaves, group=grp, **common
                )
                # the root has no parent edge: its dp row is the batched
                # epilogue's uniform-step artifact — zero it
                dp_pad = outs[0].at[:, root].set(0.0)
                dleaf_k = outs[1] if diff_leaves else None
            else:
                dp_pad, dleaf_k = _backward_call(
                    p_pad, pt_pad, buf_all, ls_all, gseeds, root_ids,
                    n_real=s, **common
                )
            dp = jnp.transpose(dp_pad[:, :, :s, :s], (1, 0, 2, 3)).astype(
                p_tok.dtype
            )
            if dleaf_k is not None:
                dleaf = jnp.transpose(
                    jnp.sum(dleaf_k, axis=0)[:, :s, :sites], (0, 2, 1)
                ).astype(leaf_tok.dtype)
            else:
                dleaf = jnp.zeros((n_leaves, sites, s), leaf_tok.dtype)
            root_pp = buf_all[:, root, :s, :sites]       # (K, S, sites)
            dfreqs = jnp.einsum(
                "ks,kis->i", lam, root_pp.astype(rdt), precision=_hi
            )
            return dp, dleaf, dfreqs

        site_cat_ll.defvjp(fwd, bwd)
        return site_cat_ll

    # ---- segmented mode ----
    s_pad = _state_pad(n_states)
    segments = _segment_schedules(
        schedule, s_pad, int(VMEM_BUDGET * 0.9)
    )

    def make_seg_fn(seg):
        arrays = dict(
            order=seg.order, children=seg.children, counts=seg.counts,
            n_nodes=seg.n_nodes, n_leaves=seg.n_leaves,
            tile=tile, interpret=interpret, n_real=n_states,
        )
        bloc = np.asarray(seg.boundary_local, np.int32)
        anc = np.asarray(seg.vleaf_anc_boundary, np.int32)
        # deferred-edge reverse for segments too (r5): bwd2's working set
        # is strictly smaller than the classic bwd the segments are sized
        # for, and its multi-seed form handles the boundary outputs (each
        # a root of the segment forest). Grouped saveall residuals carry
        # the +1 trash row only on this path (bwd2 slices them).
        use2 = bwd2_env != "0"
        sgrp = _group_size(s_pad) if use2 else 0
        bgrp = _group_size_bwd(s_pad) if use2 else 0

        @jax.custom_vjp
        def f(p_seg, vleaf, vlsc):
            buf, ls = _saveall_call(p_seg, vleaf, vlsc, group=sgrp,
                                    **arrays)
            return buf[:, bloc], ls[:, bloc]

        def f_fwd(p_seg, vleaf, vlsc):
            buf, ls = _saveall_call(p_seg, vleaf, vlsc, group=sgrp,
                                    **arrays)
            return (buf[:, bloc], ls[:, bloc]), (p_seg, buf, ls)

        def f_bwd(res, cts):
            p_seg, buf, ls = res
            ct_b, ct_l = cts
            pt = jnp.swapaxes(p_seg, -1, -2)
            if use2:
                # boundary pt rows := identity (seed reproduction); their
                # dp rows are epilogue artifacts (no parent edge in this
                # segment) — zeroed below
                pt = pt.at[:, bloc].set(jnp.eye(s_pad, dtype=jnp.float32))
                dp, dvleaf = _bwd2_call(
                    p_seg, pt, buf, ls, ct_b.astype(jnp.float32), bloc,
                    want_dleaf=True, group=bgrp, **arrays
                )
                dp = dp.at[:, bloc].set(0.0)
            else:
                dp, dvleaf = _backward_call(
                    p_seg, pt, buf, ls, ct_b.astype(jnp.float32), bloc,
                    **arrays
                )
            # a vleaf's input logscale adds exactly once into its tree
            # root's output logscale (and nowhere else) — route the
            # cotangent straight from that boundary output
            dvlsc = ct_l[:, anc]
            return dp, dvleaf, dvlsc

        f.defvjp(f_fwd, f_bwd)
        return f

    seg_fns = [make_seg_fn(seg) for seg in segments]

    def seg_chain_ll(p_matrices, leaf_partials, freqs):
        k = p_matrices.shape[1]
        sites = leaf_partials.shape[1]
        s = leaf_partials.shape[2]
        sites_pad = _round_up(sites, LANE)
        p_pad, lp = _pad_inputs(
            p_matrices, leaf_partials, s, s_pad, sites, sites_pad
        )
        lp_k = jnp.broadcast_to(lp[None], (k,) + lp.shape)
        bparts, blscs = {}, {}
        for seg, fn in zip(segments, seg_fns):
            nv = int(seg.n_leaves)
            leaf_rows = np.nonzero(seg.vleaf_is_leaf)[0]
            vleaf = jnp.zeros((k, nv, s_pad, sites_pad), jnp.float32)
            vlsc = jnp.zeros((k, nv, 1, sites_pad), jnp.float32)
            if leaf_rows.size:
                gids = seg.vleaf_global[leaf_rows]
                vleaf = vleaf.at[:, leaf_rows].set(lp_k[:, gids])
            for j, (gid, is_l) in enumerate(
                zip(seg.vleaf_global, seg.vleaf_is_leaf)
            ):
                if not is_l:
                    vleaf = vleaf.at[:, j].set(bparts[int(gid)])
                    vlsc = vlsc.at[:, j].set(blscs[int(gid)])
            p_seg = p_pad[:, seg.p_gather]
            bp, bl = fn(p_seg, vleaf, vlsc)
            for j, gid in enumerate(seg.boundary_global):
                bparts[int(gid)] = bp[:, j]
                blscs[int(gid)] = bl[:, j]
        rdt = freqs.dtype
        root_pp = bparts[root][:, :s, :sites]            # (K, S, sites)
        dot = jnp.einsum(
            "kis,i->ks", root_pp.astype(rdt), freqs, precision=_hi
        )
        return jnp.log(dot) + blscs[root][:, 0, :sites].astype(rdt) * LN2

    @jax.custom_vjp
    def site_cat_ll(p_matrices, leaf_partials, freqs):
        # value-only calls take the fast fused forward (incl. the
        # HBM-streaming lowering); the segmented saveall chain runs only
        # under differentiation
        return fast_ll(p_matrices, leaf_partials, freqs)

    def fwd(p_matrices, leaf_partials, freqs):
        ll, pullback = jax.vjp(
            seg_chain_ll, p_matrices, leaf_partials, freqs
        )
        return ll, pullback

    def bwd(pullback, ct):
        return pullback(ct)

    site_cat_ll.defvjp(fwd, bwd)
    return site_cat_ll
