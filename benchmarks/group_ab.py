"""A/B of the grouped (level-batched) walk vs the serial walk (r5 item 1).

Times the three fused-kernel phases on the flagship config (64-taxon
GTR+G4, 1024 DNA patterns, f32) with the honest batched methodology
(B=64 evals/launch x OUT=16 scans/dispatch, unique inputs, min over
repeats, default 16*LANE tile so _pick_tile lands on the r4-optimal
sizes):

  fwd[U]       value-only fused forward (_pallas_forward)
  saveall[U]   residual-writing forward (the VJP's fwd half)
  bwd2[U]      deferred-edge reverse (no dleaf — the engine path)

U=0 is the serial walk; U>0 groups U independent node combines per
serial iteration (see ops/pallas_pruning._group_walk_schedule).

Usage: python benchmarks/group_ab.py [--groups 0,4,8,16]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", default="0,4,8,16")
    ap.add_argument("--taxa", type=int, default=64)
    ap.add_argument("--sites", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", type=int, default=16)
    args = ap.parse_args()
    groups = [int(x) for x in args.groups.split(",")]

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
    B, OUT = args.batch, args.out
    tree = random_tree(args.taxa, seed=0)
    aln = _random_alignment(tree, args.sites, seed=1)
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
    freqs32 = freqs

    order, children, counts = pp._postorder_arrays(sched)
    n_nodes, n_leaves = sched.n_nodes, sched.n_leaves
    common = dict(order=order, children=children, counts=counts,
                  n_nodes=n_nodes, n_leaves=n_leaves, tile=16 * pp.LANE,
                  interpret=False)
    root = int(order[-1])

    t_save = pp._pick_tile(16 * pp.LANE, sites, n_nodes, n_leaves, s_pad,
                           "save")
    sites_pad = pp._round_up(sites, t_save)
    p_pad0, lpk0 = pp._pad_inputs(p_base, lp, s, s_pad, sites, sites_pad)
    lp_k0 = jnp.broadcast_to(lpk0[None], (k,) + lpk0.shape)
    lsc_k0 = jnp.zeros((k, n_leaves, 1, sites_pad), jnp.float32)
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

    res = {"per_eval_ms": {}}
    for U in groups:
        tag = f"U{U}"
        # value forward: module-level switch read at trace time
        pp.GROUP_WALK = U
        prune = pp.make_pallas_prune_fn(sched)

        def fwd(scale):
            rp, rsc = prune(p_base * scale, lp)
            return rp[:, 0, 0].sum() + rsc[:, 0].sum()

        res["per_eval_ms"][f"fwd_{tag}"] = round(timed(fwd), 4)

        def saveall(scale):
            buf_all, ls_all = pp._saveall_call(
                p_pad0 * scale, lp_k0, lsc_k0, n_real=s, group=U, **common
            )
            return buf_all[:, root].sum() + ls_all[:, root].sum()

        res["per_eval_ms"][f"saveall_{tag}"] = round(timed(saveall), 4)

        # residuals for the reverse (fixed; unique gseeds per eval)
        bufU, lsU = jax.jit(
            lambda p: pp._saveall_call(p, lp_k0, lsc_k0, n_real=s,
                                       group=U, **common)
        )(p_pad0)
        ptU = jnp.swapaxes(p_pad0, -1, -2)
        ptU = ptU.at[:, root].set(jnp.eye(s_pad, dtype=jnp.float32))

        def bwd2(scale):
            outs = pp._bwd2_call(
                p_pad0, ptU, bufU, lsU, gseed * scale,
                np.asarray([root], np.int32),
                n_real=s, want_dleaf=False, group=U, **common
            )
            return outs[0].sum()

        res["per_eval_ms"][f"bwd2_{tag}"] = round(timed(bwd2), 4)
    pp.GROUP_WALK = int(os.environ.get("PHYLO_GROUP_WALK", "0"))

    r0 = res["per_eval_ms"]
    if 0 in groups:
        best_u = {}
        for ph in ("fwd", "saveall", "bwd2"):
            base = r0[f"{ph}_U0"]
            cand = {U: r0[f"{ph}_U{U}"] for U in groups if U}
            ub = min(cand, key=cand.get) if cand else 0
            best_u[ph] = {
                "best_U": ub,
                "speedup_vs_serial": round(base / cand[ub], 3) if cand else 1,
            }
        res["summary"] = best_u
    res["config"] = {"taxa": args.taxa, "patterns": sites, "ncat": k,
                     "batch": B, "out": OUT, "tile_save": t_save}
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
