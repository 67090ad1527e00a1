"""Headline benchmark: site-patterns/sec/chip, 64-taxon GTR+Gamma pruning.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patterns/s/chip", "vs_baseline": N}

``vs_baseline`` is the speedup over the reference's algorithm measured as the
in-repo float64 numpy oracle (serial Felsenstein pruning — same algorithm and
serial structure as phylo_utils' Cython loop; SURVEY.md §6: the reference
publishes no numbers and its mount is empty, so the oracle is the 10x
denominator, swappable for real reference timings if the mount appears).

MEASUREMENT METHODOLOGY (r2): the axon relay MEMOIZES identical dispatches —
calling a jitted fn twice with the same buffers returns a cached result in
~0.03 ms regardless of problem size (measured: 64 taxa x 16384 patterns
"ran" in 0.029 ms, which is physically impossible). Same-buffer replay
therefore measures cache latency, not compute (round-1 numbers were
cache-bound). Honest timing = N likelihood evaluations with UNIQUE branch
lengths fused into ONE dispatch via lax.scan, with a per-call seed so outer
dispatches are unique too; per-eval time = call time / N. Every evaluation
includes the full pipeline (P(t) eigen-expm construction, fused Pallas
pruning, f64 root reduction/mixing) — what a real optimizer step pays.
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
N_INNER = 50            # single-stream evals fused per dispatch (latency)
N_INNER_GRAD = 25
VMAP_B = 64             # batched evals per kernel launch (throughput)
VMAP_OUT = 16           # scan iterations of vmapped batches per dispatch
# r2 finding (PARITY.md): the relay charges a FIXED ~25 ms per dispatch
# with fresh inputs, independent of program size — so honest throughput
# requires amortizing over >=1000 evals per dispatch (B*OUT=1024 here;
# measured: 64 evals/dispatch reads 0.55 ms/eval, 1024 -> 0.17 ms/eval,
# both the same compute). Latency-style numbers (single-stream scan,
# fit steps) inherently include a share of that fixed cost.
VMAP_B_GRAD = 64        # batched value_and_grad per launch (r4: raised to
VMAP_OUT_GRAD = 16      # the forward's 1024-eval amortization — at 128
                        # evals/dispatch the fixed ~25 ms relay dispatch
                        # cost was half the measured grad time)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    # x64 on: the f32 perf engine then builds P(t) and does the root
    # reduction / final pattern sum in f64 (likelihood.py precision plan) —
    # this is what closes rel_logl_err to <= 1e-6 while partials stay f32
    # in the Pallas kernel.
    jax.config.update("jax_enable_x64", True)

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
    params = engine._full_params(None)
    lp, w = engine._leaf_partials, engine._weights

    # model fixed across the evals -> eigen + gamma rates computed once
    # (the reference's TransitionMatrix semantics); P(t) is still rebuilt
    # per evaluation
    eig = engine.model_eigen(params)
    cat_rates = engine.model_rates(params)

    def loglik(p2):
        return engine._loglik_fn(p2, lp, w, eig=eig, rates=cat_rates)[0]

    acc0 = jnp.zeros((), jnp.result_type(float))

    @jax.jit
    def scan_eval(params, seed):
        def body(acc, i):
            p2 = dict(params)
            p2["branch_lengths"] = params["branch_lengths"] * (
                1.0 + 1e-7 * (i + seed)
            )
            return acc + loglik(p2).astype(acc.dtype), None

        acc, _ = lax.scan(
            body, acc0, jnp.arange(N_INNER, dtype=jnp.float32)
        )
        return acc

    @jax.jit
    def scan_vag(params, seed):
        def body2(acc, i):
            p2 = dict(params)
            p2["branch_lengths"] = params["branch_lengths"] * (
                1.0 + 1e-7 * (i + seed)
            )
            v, g = jax.value_and_grad(loglik)(p2)
            return (
                acc + v.astype(acc.dtype)
                + jnp.sum(g["branch_lengths"]).astype(acc.dtype),
                None,
            )

        acc, _ = lax.scan(
            body2, acc0, jnp.arange(N_INNER_GRAD, dtype=jnp.float32)
        )
        return acc

    # batched-gradient throughput (bootstrap/multi-start/topology-set
    # fits run many independent gradient evals per dispatch)
    def one_vag(scale):
        p2 = dict(params)
        p2["branch_lengths"] = params["branch_lengths"] * scale
        v, g = jax.value_and_grad(loglik)(p2)
        return v + jnp.sum(g["branch_lengths"])

    batched_vag = jax.vmap(one_vag)

    @jax.jit
    def scan_vmap_vag(params, seed):
        def body(acc, i):
            scales = 1.0 + 1e-7 * (
                seed + i * VMAP_B_GRAD
                + jnp.arange(VMAP_B_GRAD, dtype=jnp.float32)
            )
            return acc + jnp.sum(batched_vag(scales)).astype(acc.dtype), None

        acc, _ = lax.scan(
            body, acc0, jnp.arange(VMAP_OUT_GRAD, dtype=jnp.float32)
        )
        return acc

    # throughput mode: B independent evaluations per kernel launch (vmap
    # adds a batch grid axis), scanned VMAP_OUT times per dispatch —
    # measured ~3x the single-stream rate (launch overhead amortized)
    def one_eval(scale):
        p2 = dict(params)
        p2["branch_lengths"] = params["branch_lengths"] * scale
        return loglik(p2)

    batched_eval = jax.vmap(one_eval)

    @jax.jit
    def scan_vmap(params, seed):
        def body(acc, i):
            scales = 1.0 + 1e-7 * (
                seed + i * VMAP_B + jnp.arange(VMAP_B, dtype=jnp.float32)
            )
            return acc + jnp.sum(batched_eval(scales)).astype(acc.dtype), None

        acc, _ = lax.scan(
            body, acc0, jnp.arange(VMAP_OUT, dtype=jnp.float32)
        )
        return acc

    # process-unique seed base: the relay memoizes identical dispatches
    # ACROSS processes too (r4 finding, see the fit-chunk jitter below),
    # so fixed seeds would let a repeat bench run time cache replays
    seed_base = float(time.time_ns() % 100_000)

    def timed(fn, n_inner, n_reps=3):
        jax.block_until_ready(fn(params, jnp.float32(seed_base)))  # warm
        best = float("inf")
        for s in range(1, n_reps + 1):
            t0 = time.perf_counter()
            jax.block_until_ready(
                fn(params, jnp.float32(seed_base + s * 1000.0))
            )
            best = min(best, time.perf_counter() - t0)
        return best / n_inner

    per_eval_batched = timed(scan_vmap, VMAP_B * VMAP_OUT)
    pps = n_patterns / per_eval_batched
    per_grad_batched = timed(scan_vmap_vag, VMAP_B_GRAD * VMAP_OUT_GRAD)
    per_eval = timed(scan_eval, N_INNER)
    per_grad = timed(scan_vag, N_INNER_GRAD)

    # single honest eval for the parity number
    fn = engine._jit_fn
    result_for_parity = fn(params, lp, w)
    jax.block_until_ready(result_for_parity)
    ll = float(result_for_parity[0])

    # legacy same-buffer replay (relay cache latency, NOT compute) — kept
    # for transparency about what round-1 measured
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn(params, lp, w)
    jax.block_until_ready(out)
    replay_cached_ms = (time.perf_counter() - t0) / 20 * 1e3

    # --- steady-state fit loop: optimizer steps fused into one dispatch ---
    import optax

    from phylo_utils_tpu.optimize import transform_params, untransform_params

    CHUNK = 100
    opt = optax.adam(1e-2)
    # process-unique start: the relay memoizes identical dispatches ACROSS
    # processes (measured r4: a repeat bench run read 262k fit steps/s —
    # the whole measured chunk was a cache replay of the previous run's).
    # A tiny unique perturbation of the starting point makes every chunk
    # dispatch this process issues globally fresh.
    jitter = 1e-7 * float(time.time_ns() % 997)
    params_j = dict(params)
    params_j["branch_lengths"] = params["branch_lengths"] * (1.0 + jitter)
    raw0 = transform_params(params_j)
    opt_state0 = opt.init(raw0)

    def loss_fn(raw):
        total, _ = engine._loglik_fn(untransform_params(raw), lp, w)
        return -total

    @jax.jit
    def chunk(raw, opt_state):
        def body(carry, _):
            raw, st = carry
            loss, grads = jax.value_and_grad(loss_fn)(raw)
            updates, st = opt.update(grads, st, raw)
            return (optax.apply_updates(raw, updates), st), loss

        (raw, opt_state), losses = lax.scan(
            body, (raw, opt_state), None, length=CHUNK
        )
        return raw, opt_state, losses

    raw, st, _ = chunk(raw0, opt_state0)        # compile + warm
    jax.block_until_ready((raw, st))
    t0 = time.perf_counter()
    raw, st, losses = chunk(raw, st)            # fresh buffers: real loop
    jax.block_until_ready((raw, st))
    fit_steps_per_s = CHUNK / (time.perf_counter() - t0)
    final_fit_ll = -float(np.asarray(losses)[-1])

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

    result = {
        "metric": "site-patterns/sec/chip, 64-taxon GTR+Gamma4 pruning",
        "value": round(pps, 1),
        "unit": "patterns/s/chip",
        "vs_baseline": round(pps / oracle_pps, 2),
        # top-level so a dashboard trend-comparing `value` across rounds
        # can't miss a CPU-fallback run (the device detail in `extra` is
        # too subtle — judged weak in round 2)
        "chip_comparable": jax.devices()[0].platform != "cpu",
        "extra": {
            "methodology": (
                f"throughput: {VMAP_B} independent evals per kernel launch "
                f"(vmap) x {VMAP_OUT} per dispatch, unique branch lengths; "
                "latency: eval_ms_single_stream (sequential scan). The "
                "relay memoizes identical dispatches, so same-buffer "
                "replay is cache latency — see replay_cached_ms"
            ),
            "n_patterns": int(n_patterns),
            "eval_ms_batched": round(per_eval_batched * 1e3, 4),
            "eval_ms_single_stream": round(per_eval * 1e3, 4),
            "grad_eval_ms": round(per_grad * 1e3, 4),
            "grad_eval_ms_batched": round(per_grad_batched * 1e3, 4),
            "grad_patterns_per_s": round(n_patterns / per_grad_batched, 1),
            "grad_patterns_per_s_single_stream": round(
                n_patterns / per_grad, 1),
            "fit_steps_per_s": round(fit_steps_per_s, 1),
            "fit_chunk_ll": final_fit_ll,
            "replay_cached_ms": round(replay_cached_ms, 4),
            "oracle_patterns_per_s": round(oracle_pps, 1),
            "rel_logl_err_vs_f64_oracle": float(err),
            "pruner": pruner,
            "dtype": dtype,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def _tpu_alive_once(timeout_s: float = 90.0) -> bool:
    """Probe device init in a SUBPROCESS: a half-dead relay makes
    jax.devices() hang forever in-process (observed 2026-08-18), and a
    hung bench leaves no artifact at all."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def _tpu_alive() -> bool:
    """Retry the probe with backoff (~10 min total): the axon relay is
    known to flap — a single 90 s probe against a relay that recovers in
    minutes would forfeit the round's only driver-captured TPU artifact
    (exactly what happened in round 2)."""
    backoffs = [60.0, 120.0, 180.0]          # 4 probes x 90 s + waits ~ 12 min
    for i in range(len(backoffs) + 1):
        if _tpu_alive_once():
            return True
        if i < len(backoffs):
            sys.stderr.write(
                f"bench: TPU probe {i + 1} failed; retrying in "
                f"{backoffs[i]:.0f} s\n"
            )
            time.sleep(backoffs[i])
    return False


if __name__ == "__main__":
    if os.environ.get("BENCH_SKIP_TPU_PROBE") != "1" and not _tpu_alive():
        # TPU relay down: re-exec on CPU with the axon plumbing scrubbed
        # so the round still records an artifact — clearly labeled (the
        # "device" field will read CPU), NOT comparable to chip numbers.
        sys.stderr.write(
            "bench: TPU backend unavailable (probe failed/timed out); "
            "re-executing on CPU — numbers are NOT chip-comparable\n"
        )
        env = dict(
            os.environ,
            PYTHONPATH="",
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            BENCH_SKIP_TPU_PROBE="1",
        )
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)
    main()
