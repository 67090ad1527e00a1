"""Backward-pass attribution for the fused Pallas VJP (VERDICT r3 item 1).

Splits the flagship gradient evaluation (64-taxon GTR+G4, 1024 DNA
patterns — BENCH's `grad_eval_ms_batched`) into its physical phases:

  fwd_fast      value-only fused forward kernel (the 0.12 ms baseline)
  saveall       forward that also writes every node's (partials, logscale)
                residuals to HBM (the VJP's fwd half)
  bwd_kernel    the reverse-walk kernel alone (reads residuals, emits
                dP + dleaf)
  vjp_kernel    value_and_grad of the raw kernel fn (p_matrices -> ll):
                saveall + bwd_kernel + gseed/transpose glue
  engine_vag    value_and_grad through the full engine path (adds P(t)
                spectral reconstruct, mixing, pattern reduction) — the
                number BENCH reports

plus HBM-traffic estimates for the roofline. Methodology: honest batched
timing per bench.py — B independent evals per launch (vmap) x OUT scan
iterations per dispatch, unique inputs per eval, min over repeats.

Usage:  python benchmarks/profile_backward.py [--taxa 64] [--sites 1024]
Writes one JSON line to stdout.
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
    ap.add_argument("--taxa", type=int, default=64)
    ap.add_argument("--sites", type=int, default=1024)
    ap.add_argument("--ncat", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)

    from __graft_entry__ import _random_alignment
    from phylo_utils_tpu import models
    from phylo_utils_tpu.likelihood import LikelihoodEngine
    from phylo_utils_tpu.ops import pallas_pruning as pp
    from phylo_utils_tpu.trees import random_tree
    from phylo_utils_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    B, OUT = args.batch, args.out
    tree = random_tree(args.taxa, seed=0)
    aln = _random_alignment(tree, args.sites, seed=1)
    engine = LikelihoodEngine(
        tree, aln, models.GTR, ncat=args.ncat, dtype="float32",
        pruner="pallas",
    )
    sched = engine.schedule
    n_pat = engine._compressed.n_patterns
    params = engine._full_params(None)
    lp, w = engine._leaf_partials, engine._weights
    eig = engine.model_eigen(params)
    cat_rates = engine.model_rates(params)

    # ---- base tensors for the raw-kernel components ----
    from phylo_utils_tpu.likelihood import mixture_rates_and_p

    rdt = engine._reduce_dtype
    _, cat_w, p_base, freqs = mixture_rates_and_p(
        engine, params, rdt, eig=eig, rates=cat_rates
    )
    p_base = p_base.astype(jnp.float32)          # (n_nodes, K, S, S)
    freqs32 = freqs
    k = p_base.shape[1]
    s = lp.shape[2]
    s_pad = pp._state_pad(s)
    sites = lp.shape[1]

    order, children, counts = pp._postorder_arrays(sched)
    n_nodes, n_leaves = sched.n_nodes, sched.n_leaves
    common = dict(
        order=order, children=children, counts=counts,
        n_nodes=n_nodes, n_leaves=n_leaves, tile=4 * pp.LANE,
        interpret=False,
    )
    root = int(order[-1])
    root_ids = np.asarray([root], np.int32)

    t_save = pp._pick_tile(4 * pp.LANE, sites, n_nodes, n_leaves, s_pad,
                           "save")
    sites_pad = pp._round_up(sites, t_save)

    pll = engine._pallas_ll

    acc0 = jnp.zeros((), jnp.float64)

    def timed(fn, n_evals, n_reps=3):
        jax.block_until_ready(fn(jnp.float32(0.0)))
        best = float("inf")
        for r in range(1, n_reps + 1):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jnp.float32(r * 1000.0)))
            best = min(best, time.perf_counter() - t0)
        return best / n_evals

    def batched_scan(one_eval):
        """jit(scan(vmap(one_eval)))  with unique scale inputs."""

        @jax.jit
        def run(seed):
            def body(acc, i):
                scales = 1.0 + 1e-7 * (
                    seed + i * B + jnp.arange(B, dtype=jnp.float32)
                )
                return acc + jnp.sum(
                    jax.vmap(one_eval)(scales)
                ).astype(acc.dtype), None

            acc, _ = lax.scan(body, acc0, jnp.arange(OUT, dtype=jnp.float32))
            return acc

        return run

    results = {}

    # 1. value-only fused forward (kernel + root reduce, no P build)
    def fwd_fast(scale):
        return jnp.sum(pll(p_base * scale, lp, freqs32))

    results["fwd_fast_ms"] = timed(batched_scan(fwd_fast), B * OUT) * 1e3

    # 2. saveall forward alone (pad glue included; residuals reduced to a
    #    scalar so XLA keeps the kernel but the output transfer is tiny)
    def saveall(scale):
        p_pad, lpk = pp._pad_inputs(
            p_base * scale, lp, s, s_pad, sites, sites_pad
        )
        lp_k = jnp.broadcast_to(lpk[None], (k,) + lpk.shape)
        lsc_k = jnp.zeros((k, n_leaves, 1, sites_pad), jnp.float32)
        buf_all, ls_all = pp._saveall_call(
            p_pad, lp_k, lsc_k, n_real=s, **common
        )
        return buf_all[:, root].sum() + ls_all[:, root].sum()

    results["saveall_ms"] = timed(batched_scan(saveall), B * OUT) * 1e3

    # 3. backward kernel alone: residuals fixed (computed once, closed
    #    over), unique gseeds per eval
    p_pad0, lpk0 = pp._pad_inputs(p_base, lp, s, s_pad, sites, sites_pad)
    lp_k0 = jnp.broadcast_to(lpk0[None], (k,) + lpk0.shape)
    lsc_k0 = jnp.zeros((k, n_leaves, 1, sites_pad), jnp.float32)
    buf0, ls0 = jax.jit(
        lambda p: pp._saveall_call(p, lp_k0, lsc_k0, n_real=s, **common)
    )(p_pad0)
    pt_pad0 = jnp.swapaxes(p_pad0, -1, -2)
    gseed_base = jnp.ones((k, 1, s_pad, sites_pad), jnp.float32)

    def bwd_kernel(scale):
        dp_pad, dleaf_k = pp._backward_call(
            p_pad0, pt_pad0, buf0, ls0, gseed_base * scale, root_ids,
            n_real=s, **common
        )
        return dp_pad.sum() + dleaf_k[:, :, 0, 0].sum()

    results["bwd_kernel_ms"] = timed(batched_scan(bwd_kernel), B * OUT) * 1e3

    # 3b. backward kernel with the dleaf output reduced away (lets XLA
    #     drop nothing in-kernel — measures whether the dleaf HBM write
    #     costs; compare with bwd_kernel_ms)
    def bwd_kernel_dponly(scale):
        dp_pad, dleaf_k = pp._backward_call(
            p_pad0, pt_pad0, buf0, ls0, gseed_base * scale, root_ids,
            n_real=s, **common
        )
        return dp_pad.sum()

    results["bwd_kernel_dponly_ms"] = timed(
        batched_scan(bwd_kernel_dponly), B * OUT) * 1e3

    # 4. value_and_grad of the raw kernel fn (p -> weighted ll sum):
    #    saveall + bwd + gseed/transpose glue
    def kernel_loss(scale):
        def f(p):
            ll = pll(p, lp, freqs)              # (K, sites) rdt
            return jnp.sum(
                jnp.sum(ll, axis=0).astype(rdt) * w.astype(rdt)
            )

        v, g = jax.value_and_grad(f)(p_base * scale)
        return v + g[0, 0, 0, 0]

    results["vjp_kernel_ms"] = timed(batched_scan(kernel_loss), B * OUT) * 1e3

    # 5. full engine value_and_grad (adds P(t) reconstruct + mixing) —
    #    BENCH's grad_eval_ms_batched
    def engine_vag(scale):
        p2 = dict(params)
        p2["branch_lengths"] = params["branch_lengths"] * scale
        v, g = jax.value_and_grad(
            lambda q: engine._loglik_fn(q, lp, w, eig=eig,
                                        rates=cat_rates)[0]
        )(p2)
        return v + jnp.sum(g["branch_lengths"])

    results["engine_vag_ms"] = timed(batched_scan(engine_vag), B * OUT) * 1e3

    # ---- HBM traffic estimates (bytes per eval, f32) ----
    buf_bytes = 4 * k * n_nodes * s_pad * sites_pad
    ls_bytes = 4 * k * n_nodes * 1 * sites_pad
    dleaf_bytes = 4 * k * n_leaves * s_pad * sites_pad
    leaf_bytes = 4 * k * n_leaves * s_pad * sites_pad
    traffic = {
        "saveall_write_mb": round((buf_bytes + ls_bytes) / 1e6, 2),
        "bwd_read_mb": round(
            (buf_bytes + ls_bytes + leaf_bytes * 0 + 2 * 4 * k * n_nodes
             * s_pad * s_pad) / 1e6, 2),
        "dleaf_write_mb": round(dleaf_bytes / 1e6, 2),
    }

    out = {
        "metric": "backward-pass attribution, 64-taxon GTR+G4",
        "n_patterns": int(n_pat),
        "batch": B, "scan_out": OUT,
        "per_eval_ms": {kk: round(v, 4) for kk, v in results.items()},
        "derived": {
            "bwd_over_fwd": round(
                results["engine_vag_ms"] / results["fwd_fast_ms"], 2),
            "vjp_glue_ms": round(
                results["vjp_kernel_ms"] - results["fwd_fast_ms"]
                - results["saveall_ms"] - results["bwd_kernel_ms"], 4),
            "pbuild_mixing_ms": round(
                results["engine_vag_ms"] - results["vjp_kernel_ms"], 4),
            "dleaf_write_cost_ms": round(
                results["bwd_kernel_ms"]
                - results["bwd_kernel_dponly_ms"], 4),
        },
        "hbm_traffic_per_eval": traffic,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
