"""Ancestral state reconstruction (marginal / empirical-Bayes posteriors)
and per-site rate-category posteriors.

Beyond the reference's surface, but a standard companion capability of any
likelihood engine. Two passes over the compiled level schedule:

- **down** (Felsenstein pruning, reused from ops.pruning): ``down[v]`` =
  P(data below v | state at v), per rate category, per-node rescaled.
- **up** (pre-order): ``out[v]`` = P(data outside v's subtree | state at v):
  ``out[root] = pi``; for child v of u with siblings c,
  ``out[v][i] = sum_j P_v[j, i] * out[u][j] * prod_c (P_c @ down[c])[j]``.

Posteriors: per category p_c(state=i) ∝ down*out (per-node rescaling cancels
in the per-site normalization), mixed over categories with the per-site
category posterior gamma_{s,c} ∝ w_c * L_{s,c} * e^{scale_c}. All shapes are
static; everything jits.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from phylo_utils_tpu.trees import PruningSchedule

__all__ = ["ancestral_posteriors", "site_rate_posteriors"]

_HI = lax.Precision.HIGHEST


def _down_pass(schedule: PruningSchedule, p, leaf_partials):
    """Felsenstein pruning retaining ALL node buffers (for the up pass)."""
    dtype = leaf_partials.dtype
    k = p.shape[1]
    sites = leaf_partials.shape[1]
    s = leaf_partials.shape[2]
    n = schedule.n_nodes
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)
    buf = jnp.zeros((n + 1, k, sites, s), dtype)
    buf = buf.at[: schedule.n_leaves].set(leaf_partials[:, None, :, :])
    logscale = jnp.zeros((n + 1, k, sites), dtype)
    for lvl in range(schedule.n_levels):
        nodes = schedule.level_nodes[lvl]
        children = schedule.level_children[lvl]
        mask = schedule.level_childmask[lvl]
        child_p = buf[children]
        child_sc = logscale[children]
        pm = p[children]
        contrib = jnp.einsum("wckij,wcksj->wcksi", pm, child_p, precision=_HI)
        mb = mask[:, :, None, None, None].astype(dtype)
        contrib = contrib * mb + (1.0 - mb)
        partial = jnp.prod(contrib, axis=1)
        sc = jnp.sum(child_sc * mask[:, :, None, None], axis=1)
        m = jnp.maximum(jnp.max(partial, axis=-1), tiny)
        buf = buf.at[nodes].set(partial / m[..., None])
        logscale = logscale.at[nodes].set(sc + jnp.log(m))
    return buf, logscale


def _up_pass(schedule: PruningSchedule, p, down, freqs):
    """Outside likelihoods out[v] for every node, pre-order, rescaled."""
    dtype = down.dtype
    n = schedule.n_nodes
    k, sites, s = down.shape[1], down.shape[2], down.shape[3]
    out = jnp.zeros((n + 1, k, sites, s), dtype)
    out = out.at[schedule.root].set(
        jnp.broadcast_to(freqs.astype(dtype)[None, None, :], (k, sites, s))
    )
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)
    # reverse level order: parents' out is ready before their children's
    for lvl in range(schedule.n_levels - 1, -1, -1):
        nodes = schedule.level_nodes[lvl]          # (W,) parents u
        children = schedule.level_children[lvl]    # (W, C)
        mask = schedule.level_childmask[lvl]       # (W, C)
        parent_out = out[nodes]                    # (W, K, sites, S)
        child_down = down[children]                # (W, C, K, sites, S)
        pm = p[children]                           # (W, C, K, S, S)
        contrib = jnp.einsum(
            "wckij,wcksj->wcksi", pm, child_down, precision=_HI
        )                                          # (W, C, K, sites, S)
        mb = mask[:, :, None, None, None].astype(dtype)
        contrib = contrib * mb + (1.0 - mb)
        # product over the OTHER children: total / self, computed exactly as
        # prod over c' != c (C is tiny) to avoid division blowups at zeros
        c = contrib.shape[1]
        sib = []
        for ci in range(c):
            others = [contrib[:, cj] for cj in range(c) if cj != ci]
            acc = others[0] if others else jnp.ones_like(contrib[:, 0])
            for o in others[1:]:
                acc = acc * o
            sib.append(acc)
        sib = jnp.stack(sib, axis=1)               # (W, C, K, sites, S)
        msg = parent_out[:, None] * sib            # at parent: out_u * sibs
        child_out = jnp.einsum(
            "wckji,wcksj->wcksi", pm, msg, precision=_HI
        )                                          # transpose-P application
        # rescale per (child, category, site); scale cancels in posteriors
        mx = jnp.maximum(jnp.max(child_out, axis=-1, keepdims=True), tiny)
        child_out = child_out / mx
        flat_children = children.reshape(-1)
        flat_vals = child_out.reshape((-1,) + child_out.shape[2:])
        flat_mask = mask.reshape(-1)
        # masked scatter: padded slots write to the trash row
        tgt = jnp.where(flat_mask > 0, flat_children, n)
        out = out.at[tgt].set(
            jnp.where(
                flat_mask[:, None, None, None] > 0,
                flat_vals,
                out[tgt],
            )
        )
    return out


def ancestral_posteriors(
    engine, params: Optional[Mapping] = None
) -> np.ndarray:
    """Marginal posterior state probabilities at every internal node.

    Returns (n_internal, n_sites, S): rows ordered by internal node id
    (``engine.tree`` ids ``n_leaves..n_nodes-1``; the last row is the root),
    expanded to per-site (not per-pattern) positions, normalized over states.
    """
    schedule = engine.schedule
    full = engine._full_params(params)
    dtype = engine.dtype

    def compute(full, leaf_partials, weights):
        # engine hook: per-edge-per-category P and the mixture weights —
        # branch-model engines (per-edge omega classes) plug in here too
        _, cat_weights, p, freqs = engine._mixture_tensors(full, dtype)
        down, logscale = _down_pass(schedule, p, leaf_partials)
        out = _up_pass(schedule, p, down, freqs)
        # binarization pseudo-nodes (ids >= n_real_nodes) are not tree
        # nodes — report posteriors for real internal nodes only
        internal = slice(schedule.n_leaves, schedule.n_real_nodes)
        joint = down[internal] * out[internal]      # (I, K, sites, S)
        per_cat = joint / jnp.maximum(
            jnp.sum(joint, axis=-1, keepdims=True),
            jnp.finfo(dtype).tiny,
        )
        # per-site category posterior from the root reduction
        root_lik = jnp.einsum(
            "ksi,i->ks", down[schedule.root], freqs.astype(dtype),
            precision=_HI,
        )
        sc = logscale[schedule.root]
        m = jnp.max(sc, axis=0)
        gam = cat_weights[:, None] * root_lik * jnp.exp(sc - m[None, :])
        gam = gam / jnp.sum(gam, axis=0, keepdims=True)   # (K, sites)
        return jnp.einsum(
            "iksj,ks->isj", per_cat, gam, precision=_HI
        )                                           # (I, sites, S)

    # cache the compiled program per engine (jit on a fresh closure would
    # recompile the two-pass pruning program on every call)
    if not hasattr(engine, "_ancestral_jit"):
        engine._ancestral_jit = jax.jit(compute)
    post = engine._ancestral_jit(full, engine._leaf_partials, engine._weights)
    post = np.asarray(post)[:, : engine._compressed.n_patterns, :]
    return post[:, engine._compressed.site_to_pattern, :]


def site_rate_posteriors(
    engine, params: Optional[Mapping] = None
) -> np.ndarray:
    """Posterior probability of each rate category per site: (n_sites, K)."""
    full = engine._full_params(params)
    dtype = engine.dtype

    def compute(full, leaf_partials, weights):
        _, cat_weights, p, freqs = engine._mixture_tensors(full, dtype)
        root_partials, root_logscale = engine._prune(p, leaf_partials)
        lik = jnp.einsum(
            "ksi,i->ks", root_partials, freqs.astype(dtype), precision=_HI
        )
        m = jnp.max(root_logscale, axis=0)
        gam = cat_weights[:, None] * lik * jnp.exp(root_logscale - m[None, :])
        return (gam / jnp.sum(gam, axis=0, keepdims=True)).T   # (sites, K)

    if not hasattr(engine, "_site_rate_jit"):
        engine._site_rate_jit = jax.jit(compute)
    gam = engine._site_rate_jit(full, engine._leaf_partials, engine._weights)
    gam = np.asarray(gam)[: engine._compressed.n_patterns]
    return gam[engine._compressed.site_to_pattern]
