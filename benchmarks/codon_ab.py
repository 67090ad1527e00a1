"""Codon kernel A/B: Pallas (classic / forced-stream) vs XLA path.

Round-3 VERDICT item 6: the round-2 codon margin (67.4k vs 55.5k
patterns/s, 1.22x) was measured with the f64 emulated P(t) build inside
BOTH paths — at 61 states that build is (edges x cats x 61 x 61) ~ 1M
f64 elements per eval and plausibly dominated the measurement. Round 3
reconstructs P in f32 from precomputed spectral modes, so this harness
re-measures the pruner ratio under the new P path, and A/Bs the
HBM-streaming lowering (PHYLO_FORCE_STREAM=1) against the classic
VMEM-block kernel at S_pad=64.

Honest methodology (PARITY.md): N unique-branch-length evals fused into
one dispatch; min over repeats; nothing else running on the box.

Usage: python benchmarks/codon_ab.py [--taxa 32] [--patterns 256]
       [--ncat 4] [--inner 8] [--stream]
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
    ap.add_argument("--taxa", type=int, default=32)
    ap.add_argument("--patterns", type=int, default=256)
    ap.add_argument("--ncat", type=int, default=4)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--stream", action="store_true",
                    help="also measure the forced HBM-streaming lowering")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)

    from phylo_utils_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from phylo_utils_tpu.likelihood import LikelihoodEngine
    from phylo_utils_tpu.models.codon import make_gy94
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import random_tree

    model = make_gy94()
    tree = random_tree(args.taxa, seed=0)
    aln = simulate_alignment(
        jax.random.key(3), tree, model, args.patterns * 3, ncat=1
    )

    # streaming is the DEFAULT for S_pad >= 32 since r5 (measured >=
    # classic everywhere wide); "pallas" pins classic for the A/B
    variants = [("pallas", {"PHYLO_FORCE_STREAM": "0"}), ("xla", {})]
    if args.stream:
        variants.insert(1, ("pallas-stream", {"PHYLO_FORCE_STREAM": "1"}))

    results = {}
    for name, env in variants:
        for k, v in env.items():
            os.environ[k] = v
        try:
            engine = LikelihoodEngine(
                tree, aln, model, ncat=args.ncat, dtype="float32",
                pruner="pallas" if name.startswith("pallas") else "xla",
            )
        finally:
            for k in env:
                os.environ.pop(k, None)
        params = engine._full_params(None)
        lp, w = engine._leaf_partials, engine._weights
        eig = engine.model_eigen(params)
        rates = engine.model_rates(params)
        n_pat = int(w.shape[0])

        def loglik(p2):
            return engine._loglik_fn(p2, lp, w, eig=eig, rates=rates)[0]

        @jax.jit
        def run(seed):
            def body(acc, i):
                p2 = dict(params)
                p2["branch_lengths"] = params["branch_lengths"] * (
                    1.0 + 1e-7 * (i + seed)
                )
                return acc + loglik(p2).astype(acc.dtype), None

            acc, _ = lax.scan(
                body, jnp.zeros((), jnp.result_type(float)),
                jnp.arange(args.inner, dtype=jnp.float32),
            )
            return acc

        jax.block_until_ready(run(jnp.float32(0.0)))
        best = float("inf")
        for s in range(1, 4):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.float32(1000.0 * s)))
            best = min(best, time.perf_counter() - t0)
        dt = best / args.inner
        ll = float(loglik(params))
        results[name] = {
            "patterns_per_s": round(n_pat / dt, 1),
            "eval_ms": round(dt * 1e3, 3),
            "loglik": ll,
        }

    base = results.get("xla", {}).get("patterns_per_s")
    for name, r in results.items():
        if base:
            r["vs_xla"] = round(r["patterns_per_s"] / base, 3)
    lls = [r["loglik"] for r in results.values()]
    print(json.dumps({
        "config": (
            f"GY94+G{args.ncat}, {args.taxa} taxa, "
            f"{args.patterns} codon patterns, f32, cached eigen+rates"
        ),
        "results": results,
        "loglik_max_spread": max(lls) - min(lls),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
