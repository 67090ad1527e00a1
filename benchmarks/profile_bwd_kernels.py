"""Micro-A/B of backward-kernel variants on the flagship config (r4).

Times raw kernel calls only (honest batched methodology):
  backward_call        the classic reverse kernel (reads saveall residuals;
                       6 contractions/node)
  saveall2_call        the ys-residual forward (deferred pair's fwd half)
  bwd2_call            deferred-edge reverse, want_dleaf True/False
                       (2/node + 1/leaf [+1/leaf])
Historical r4 result that killed the single-kernel fused fwd+bwd variant
(code since removed): fused want_dleaf=True 0.3093 ms, want_dleaf=False
(per-child pl.when) 0.4948 ms vs backward_call 0.2595 ms — the in-kernel
forward recompute beats nothing (saveall is cheaper than the fast fwd and
its HBM traffic is pipelined away) and dynamic pl.when in the inner loop
costs +73%.

Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)

    from __graft_entry__ import _random_alignment
    from phylo_utils_tpu import models
    from phylo_utils_tpu.likelihood import LikelihoodEngine, \
        mixture_rates_and_p
    from phylo_utils_tpu.ops import pallas_pruning as pp
    from phylo_utils_tpu.trees import random_tree
    from phylo_utils_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    B, OUT = 64, 16
    tree = random_tree(64, seed=0)
    aln = _random_alignment(tree, 1024, seed=1)
    engine = LikelihoodEngine(tree, aln, models.GTR, ncat=4,
                              dtype="float32", pruner="pallas")
    sched = engine.schedule
    params = engine._full_params(None)
    lp = engine._leaf_partials
    eig = engine.model_eigen(params)
    rates = engine.model_rates(params)
    _, _, p_base, freqs = mixture_rates_and_p(
        engine, params, engine._reduce_dtype, eig=eig, rates=rates)
    p_base = p_base.astype(jnp.float32)
    k = p_base.shape[1]
    s = lp.shape[2]
    s_pad = pp._state_pad(s)
    sites = lp.shape[1]

    order, children, counts = pp._postorder_arrays(sched)
    n_nodes, n_leaves = sched.n_nodes, sched.n_leaves
    common = dict(order=order, children=children, counts=counts,
                  n_nodes=n_nodes, n_leaves=n_leaves, tile=4 * pp.LANE,
                  interpret=False)
    root = int(order[-1])
    root_ids = np.asarray([root], np.int32)

    t_save = pp._pick_tile(4 * pp.LANE, sites, n_nodes, n_leaves, s_pad,
                           "save")
    sites_pad = pp._round_up(sites, t_save)
    p_pad0, lpk0 = pp._pad_inputs(p_base, lp, s, s_pad, sites, sites_pad)
    lp_k0 = jnp.broadcast_to(lpk0[None], (k,) + lpk0.shape)
    lsc_k0 = jnp.zeros((k, n_leaves, 1, sites_pad), jnp.float32)
    buf0, ls0 = jax.jit(
        lambda p: pp._saveall_call(p, lp_k0, lsc_k0, n_real=s, **common)
    )(p_pad0)
    pt_pad0 = jnp.swapaxes(p_pad0, -1, -2)
    gseed = jnp.ones((k, 1, s_pad, sites_pad), jnp.float32)

    acc0 = jnp.zeros((), jnp.float64)

    def timed(one_eval, n_reps=3):
        @jax.jit
        def run(seed):
            def body(acc, i):
                scales = 1.0 + 1e-7 * (
                    seed + i * B + jnp.arange(B, dtype=jnp.float32))
                return acc + jnp.sum(
                    jax.vmap(one_eval)(scales)).astype(acc.dtype), None
            acc, _ = lax.scan(body, acc0,
                              jnp.arange(OUT, dtype=jnp.float32))
            return acc
        jax.block_until_ready(run(jnp.float32(0.0)))
        best = float("inf")
        for r in range(1, n_reps + 1):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.float32(r * 1000.0)))
            best = min(best, time.perf_counter() - t0)
        return best / (B * OUT) * 1e3

    res = {}

    def bwd_old(scale):
        dp, dl = pp._backward_call(p_pad0, pt_pad0, buf0, ls0,
                                   gseed * scale, root_ids, n_real=s,
                                   **common)
        return dp.sum()

    res["backward_call_ms"] = round(timed(bwd_old), 4)

    pt_root_eye = pt_pad0.at[:, root].set(jnp.eye(s_pad, dtype=jnp.float32))

    def bwd2(scale, want):
        outs = pp._bwd2_call(p_pad0, pt_root_eye, buf0, ls0, gseed * scale,
                             root_ids,
                             n_real=s, want_dleaf=want, **common)
        return outs[0].sum()

    res["bwd2_dleaf_ms"] = round(timed(lambda sc: bwd2(sc, True)), 4)
    res["bwd2_nodleaf_ms"] = round(timed(lambda sc: bwd2(sc, False)), 4)

    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
