"""Felsenstein pruning as a level-scheduled, batched XLA computation.

Reference parity: phylo_utils/likcalc.pyx ``likvec_2desc``/``likvec_1desc``
(per-node C loops over sites x states), per-node rescaling, and the sitewise
root reduction (SURVEY.md §2/§3.2 [HIGH]).

TPU-first redesign: instead of a Python post-order walk calling a C kernel
per node, the topology's level schedule (trees.compile_schedule) is baked
into the trace as constant index arrays; each level combines ALL its nodes
for ALL rate categories in one batched einsum over
(width x children x categories x sites x states), with unconditional
per-(category, site) rescaling. The per-category Python loop of the
reference becomes a tensor axis; the per-node loop becomes a gather/scatter
on one partials buffer. Sites are the data-parallel axis: every op here is
elementwise or a gather/scatter on non-site axes, so under a
``NamedSharding(P(..., 'sites', ...))`` the pass runs shard-local and only
the final weighted sum needs a psum.

A fused Pallas TPU kernel for the combine+rescale is in
``phylo_utils_tpu.ops.pallas_pruning``; this module is the pure-XLA path and
correctness reference (identical math, different lowering).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from phylo_utils_tpu.trees import PruningSchedule

__all__ = [
    "make_prune_fn",
    "mixture_loglik",
    "mixture_loglik_from_ll",
    "invariant_site_likelihood",
    "pow2_rescale",
    "exp2_int",
    "LN2",
]

_HI = lax.Precision.HIGHEST

LN2 = float(np.log(2.0))


def pow2_rescale(m):
    """EXACT power-of-two rescale of a positive f32 tensor.

    Returns ``(scale, e)`` with ``scale = 2**-e`` bit-assembled from m's
    binary exponent (``e = floor(log2(m))``), so ``x * scale`` is an
    EXACT f32 operation and the accumulated scale exponents are exact
    small integers (stored in f32; adds are exact below 2^24).

    Why: TPU's f32 ``log`` is a fast polynomial with absolute error up to
    ~1e-4 and a positive bias (measured on v5e, PARITY.md) — accumulating
    ``log(m)`` per pruning node biased every sitewise logL by ~1e-5
    relative, blowing the 1e-6 parity budget on realistic trees. The
    power-of-two scheme removes every transcendental (and every rounding)
    from the rescale chain; the single exponent-count -> ln conversion
    happens once at the root, in the reduction dtype.
    """
    import jax

    # np.int32 literals: Python ints trace as i64 under jax_enable_x64,
    # which Mosaic rejects (and jnp.clip recurses on the mixed widths)
    i32 = np.int32
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    eb = jnp.right_shift(bits, i32(23)) & i32(0xFF)
    eb = jnp.minimum(jnp.maximum(eb, i32(1)), i32(253))
    scale = jax.lax.bitcast_convert_type(
        jnp.left_shift(i32(254) - eb, i32(23)), jnp.float32
    )
    return scale, (eb - i32(127)).astype(jnp.float32)


def exp2_int(k):
    """Exact ``2**k`` for an integer-VALUED f32 tensor (bit assembly)."""
    import jax

    i32 = np.int32
    kf = jnp.minimum(jnp.maximum(k, jnp.float32(-126.0)), jnp.float32(127.0))
    ki = kf.astype(jnp.int32)
    return jax.lax.bitcast_convert_type(
        jnp.left_shift(ki + i32(127), i32(23)), jnp.float32
    )


def make_prune_fn(
    schedule: PruningSchedule,
    unroll: bool = True,
    remat: bool = False,
) -> Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Compile a pruning schedule into a jit-able pure function.

    Returns ``prune(p_matrices, leaf_partials) -> (root_partials, root_logscale)``
    with shapes:

    - ``p_matrices``   (n_nodes, K, S, S) — P for the edge above each node
      (root row unused),
    - ``leaf_partials`` (n_leaves, sites, S),
    - ``root_partials`` (K, sites, S), ``root_logscale`` (K, sites).

    The schedule's index arrays are embedded as constants, so XLA sees static
    gather/scatter indices; recompilation happens only on topology change.
    ``unroll=True`` unrolls the level loop at trace time (best for autodiff:
    residual memory stays O(total nodes), not O(levels x buffer)); otherwise
    a ``lax.scan`` over padded levels is used (faster compiles for very deep
    trees, forward-only workloads). ``remat=True`` wraps each level in
    ``jax.checkpoint`` so autodiff recomputes level activations instead of
    storing the full (n_nodes+1, K, sites, S) residual chain — trades ~1
    extra forward pass for O(depth) less gradient memory on deep trees
    (SURVEY.md HBM-bandwidth guidance: remat to trade FLOPs for memory).
    """
    nodes_np = np.asarray(schedule.level_nodes)
    children_np = np.asarray(schedule.level_children)
    mask_np = np.asarray(schedule.level_childmask)
    n_nodes = schedule.n_nodes
    n_leaves = schedule.n_leaves
    root = schedule.root

    def prune(p_matrices: jnp.ndarray, leaf_partials: jnp.ndarray):
        dtype = leaf_partials.dtype
        k = p_matrices.shape[1]
        sites = leaf_partials.shape[1]
        s = leaf_partials.shape[2]
        tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)

        # buffer rows: [leaves | internals | trash]; categories broadcast at leaves
        buf = jnp.zeros((n_nodes + 1, k, sites, s), dtype)
        buf = buf.at[:n_leaves].set(leaf_partials[:, None, :, :].astype(dtype))
        logscale = jnp.zeros((n_nodes + 1, k, sites), dtype)

        def level_step(carry, level):
            buf, logscale = carry
            nodes, children, mask = level
            child_p = buf[children]          # (W, C, K, sites, S)
            child_sc = logscale[children]    # (W, C, K, sites)
            p = p_matrices[children]         # (W, C, K, S, S)
            contrib = jnp.einsum(
                "wckij,wcksj->wcksi", p, child_p, precision=_HI
            )
            mask_b = mask[:, :, None, None, None].astype(dtype)
            contrib = contrib * mask_b + (1.0 - mask_b)
            partial = jnp.prod(contrib, axis=1)                     # (W,K,sites,S)
            sc = jnp.sum(child_sc * mask[:, :, None, None], axis=1)  # (W,K,sites)
            m = jnp.maximum(jnp.max(partial, axis=-1), tiny)
            if dtype == jnp.float32:
                # exact power-of-2 rescale: TPU f32 log is ~1e-4-accurate
                # with a positive bias (see pow2_rescale) — logscale
                # accumulates binary EXPONENT COUNTS here, converted to
                # ln units once at the root below
                scale, e = pow2_rescale(m)
                partial = partial * scale[..., None]
                sc = sc + e
            else:
                partial = partial / m[..., None]
                sc = sc + jnp.log(m)
            buf = buf.at[nodes].set(partial)
            logscale = logscale.at[nodes].set(sc)
            return (buf, logscale), None

        step = level_step
        if remat:
            import jax

            step = jax.checkpoint(level_step, static_argnums=())
        if unroll:
            carry = (buf, logscale)
            for lvl in range(nodes_np.shape[0]):
                carry, _ = step(
                    carry, (nodes_np[lvl], children_np[lvl], mask_np[lvl])
                )
            buf, logscale = carry
        else:
            (buf, logscale), _ = lax.scan(
                step,
                (buf, logscale),
                (jnp.asarray(nodes_np), jnp.asarray(children_np),
                 jnp.asarray(mask_np)),
            )
        root_sc = logscale[root]
        if dtype == jnp.float32:
            root_sc = (
                root_sc.astype(jnp.result_type(float)) * LN2
            ).astype(dtype)
        return buf[root], root_sc

    return prune


def invariant_site_likelihood(
    leaf_partials: jnp.ndarray, freqs: jnp.ndarray
) -> jnp.ndarray:
    """Per-site likelihood of the zero-rate (invariant) component:
    sum_i pi_i * prod_leaves leaf_partials[l, s, i]. (sites,)"""
    prod = jnp.prod(leaf_partials, axis=0)  # (sites, S)
    return prod @ freqs.astype(prod.dtype)


def mixture_loglik(
    root_partials: jnp.ndarray,     # (K, sites, S)
    root_logscale: jnp.ndarray,     # (K, sites)
    freqs: jnp.ndarray,             # (S,)
    cat_weights: jnp.ndarray,       # (K,)
    pattern_weights: jnp.ndarray,   # (sites,)
    pinv: Optional[jnp.ndarray] = None,
    inv_lik: Optional[jnp.ndarray] = None,   # (sites,) required with pinv
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Root reduction + rate-category mixing with scale re-alignment.

    Mirrors the reference's linear-space mixing of per-category sitewise
    likelihoods under shared scaling (SURVEY.md §3.2), with an optional
    invariant-sites component L_s = pinv*I_s + (1-pinv)*sum_c w_c L_{s,c}.

    Returns (total_loglik, sitewise_loglik). The total is the weighted sum
    over (possibly sharded) patterns — under a mesh this is the single psum.
    """
    dtype = root_partials.dtype
    site_lik = jnp.einsum(
        "ksi,i->ks", root_partials, freqs.astype(dtype), precision=_HI
    )
    m = jnp.max(root_logscale, axis=0)  # (sites,)
    mixed = jnp.sum(
        cat_weights[:, None].astype(dtype)
        * site_lik
        * jnp.exp(root_logscale - m[None, :]),
        axis=0,
    )
    if pinv is not None:
        sitewise = _mix_invariant(jnp.log(mixed) + m, pinv, inv_lik, dtype)
    else:
        sitewise = jnp.log(mixed) + m
    total = jnp.sum(pattern_weights.astype(dtype) * sitewise)
    return total, sitewise


def _mix_invariant(log_var, pinv, inv_lik, dtype):
    """+I mixing in log space: L_s = pinv*I_s + (1-pinv)*L_var,s."""
    if inv_lik is None:
        raise ValueError("inv_lik is required when pinv is given")
    pinv = jnp.asarray(pinv, dtype)
    # variable sites have inv_lik == 0: their +I component is exactly
    # -inf in log space (clamping to `tiny` would floor sitewise logL at
    # log(pinv) + log(tiny), a real error in float32). NaN-safe where().
    inv_lik = inv_lik.astype(dtype)
    log_inv = jnp.where(
        inv_lik > 0,
        jnp.log(jnp.where(inv_lik > 0, inv_lik, 1.0)),
        -jnp.inf,
    )
    return jnp.logaddexp(
        jnp.log1p(-pinv) + log_var, jnp.log(pinv) + log_inv
    )


def mixture_loglik_from_ll(
    ll: jnp.ndarray,                # (K, sites) per-category sitewise logL
    cat_weights: jnp.ndarray,       # (K,)
    pattern_weights: jnp.ndarray,   # (sites,)
    pinv: Optional[jnp.ndarray] = None,
    inv_lik: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Category mixing given per-category LOG likelihoods (fused-root path).

    Same semantics as ``mixture_loglik`` but starting from
    ``ll[k, s] = log L_{s|k}`` (as produced by
    ``pallas_pruning.make_pallas_loglik_fn``): a weighted logsumexp over
    categories, optional +I, then the weighted pattern sum.
    """
    dtype = ll.dtype
    m = jnp.max(ll, axis=0)                          # (sites,)
    m = jnp.where(jnp.isfinite(m), m, 0.0)           # all--inf guard
    mixed = jnp.sum(
        cat_weights[:, None].astype(dtype) * jnp.exp(ll - m[None, :]), axis=0
    )
    log_var = jnp.log(mixed) + m
    if pinv is not None:
        sitewise = _mix_invariant(log_var, pinv, inv_lik, dtype)
    else:
        sitewise = log_var
    total = jnp.sum(pattern_weights.astype(dtype) * sitewise)
    return total, sitewise
