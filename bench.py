"""Headline benchmark: site-patterns/sec/chip, 64-taxon GTR+Gamma pruning.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patterns/s/chip", "vs_baseline": N}

``vs_baseline`` is the speedup over the reference's algorithm measured as the
in-repo float64 numpy oracle (serial Felsenstein pruning — same algorithm and
serial structure as phylo_utils' Cython loop; SURVEY.md §6: the reference
publishes no numbers and its mount is empty, so the oracle is the 10x
denominator, swappable for real reference timings if the mount appears).

Measurement order matters on the experimental axon runtime: the throughput
loop runs FIRST, immediately after the compile/warmup call with the same
buffers. Interleaving any other dispatch (fresh param dicts, host numpy
work) before the loop was measured to degrade steady-state step time ~40x
(0.038ms -> 1.6ms) for the remainder of the process. Parity checks therefore
run after the timing.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_TAXA = 64
N_SITES = 1024          # random DNA -> patterns ~= sites (all unique)
NCAT = 4
ORACLE_SITES = 128      # oracle is slow; measure on a slice and scale


def main():
    import jax

    from phylo_utils_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _random_alignment
    from oracle import core as oracle
    from phylo_utils_tpu import models
    from phylo_utils_tpu.likelihood import LikelihoodEngine
    from phylo_utils_tpu.trees import random_tree

    pruner = os.environ.get("BENCH_PRUNER", "pallas")
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    tree = random_tree(N_TAXA, seed=0)
    aln = _random_alignment(tree, N_SITES, seed=1)

    engine = LikelihoodEngine(
        tree, aln, models.GTR, ncat=NCAT, dtype=dtype, pruner=pruner
    )
    n_patterns = engine._compressed.n_patterns
    params = engine.default_params()

    # --- throughput first (see module docstring) ---------------------------
    fn = engine._jit_fn
    args = (engine._full_params(params), engine._leaf_partials, engine._weights)
    result_for_parity = fn(*args)
    jax.block_until_ready(result_for_parity)  # compile + warm
    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    pps = n_patterns / dt
    ll = float(result_for_parity[0])

    # --- parity + oracle denominator (after timing) ------------------------
    rates = oracle.discrete_gamma(0.5, NCAT)
    gtr_oracle = oracle.gtr([1.0] * 6, [0.25] * 4)
    weights = np.asarray(engine._compressed.weights)
    lp64 = np.asarray(engine._compressed.partials, dtype=np.float64)
    oracle_time = float("inf")
    for _ in range(3):  # min over repeats: robust to CPU contention
        t0 = time.perf_counter()
        oracle.loglikelihood(
            tree, aln, gtr_oracle, rates=rates,
            pattern_weights=weights[:ORACLE_SITES],
            leaf_partials=lp64[:, :ORACLE_SITES, :],
        )
        oracle_time = min(oracle_time, time.perf_counter() - t0)
    oracle_pps = ORACLE_SITES / oracle_time

    ll_full_oracle = oracle.loglikelihood(
        tree, aln, gtr_oracle, rates=rates, pattern_weights=weights,
        leaf_partials=lp64,
    )
    err = abs(ll - ll_full_oracle) / max(abs(ll_full_oracle), 1.0)

    # worst-case per-step latency: fresh parameter buffers each call,
    # synced per call (an optimizer-loop-shaped workload; on the axon relay
    # this path runs in its degraded dispatch mode — see module docstring)
    import jax.numpy as jnp

    fresh_iters = 10
    t0 = time.perf_counter()
    for i in range(fresh_iters):
        p = dict(args[0])
        p["branch_lengths"] = p["branch_lengths"] * (1.0 + 1e-6 * (i + 1))
        jax.block_until_ready(fn(p, args[1], args[2]))
    fresh_ms = (time.perf_counter() - t0) / fresh_iters * 1e3

    result = {
        "metric": "site-patterns/sec/chip, 64-taxon GTR+Gamma4 pruning",
        "value": round(pps, 1),
        "unit": "patterns/s/chip",
        "vs_baseline": round(pps / oracle_pps, 2),
        "extra": {
            "n_patterns": int(n_patterns),
            "step_ms": round(dt * 1e3, 4),
            "step_ms_fresh_params_synced": round(fresh_ms, 4),
            "oracle_patterns_per_s": round(oracle_pps, 1),
            "rel_logl_err_vs_f64_oracle": float(err),
            "pruner": pruner,
            "dtype": dtype,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
