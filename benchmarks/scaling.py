"""Scaling-efficiency harness: sites/s at 1..N devices on one mesh.

On TPU pods this measures the real ICI/DCN scaling required by BASELINE.json
(>=85% efficiency at 2 hosts). On this single-chip machine, run it on the
virtual CPU mesh to validate the harness + sharding math:

  PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/scaling.py

Weak scaling: per-device pattern count is fixed, so ideal sites/s grows
linearly with devices; efficiency = (sites/s at N) / (N * sites/s at 1).
The only cross-device communication is the final logL psum (and its
gradient), so efficiency should be near 1 whenever per-device work amortizes
dispatch overhead.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_devices: int, patterns_per_device: int, n_taxa: int,
            grad: bool, iters: int = 10) -> float:
    import jax

    from phylo_utils_tpu import models
    from phylo_utils_tpu.likelihood import LikelihoodEngine
    from phylo_utils_tpu.parallel import SiteSharding, make_mesh
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import random_tree

    mesh = make_mesh(jax.devices()[:n_devices])
    sharding = SiteSharding(mesh)
    tree = random_tree(n_taxa, seed=0)
    n_sites = patterns_per_device * n_devices
    aln = simulate_alignment(
        jax.random.key(7), tree, models.GTR, n_sites, ncat=4
    )
    engine = LikelihoodEngine(
        tree, aln, models.GTR, ncat=4, sharding=sharding, dtype="float32",
    )
    params = engine._full_params(None)
    fn = engine._jit_grad if grad else engine._jit_fn
    args = (params, engine._leaf_partials, engine._weights)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return int(engine._weights.shape[0]) / dt


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--patterns-per-device", type=int, default=2048)
    ap.add_argument("--taxa", type=int, default=64)
    ap.add_argument("--grad", action="store_true",
                    help="measure value_and_grad instead of forward")
    args = ap.parse_args()

    n_avail = len(jax.devices())
    scales = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base = None
    for n in scales:
        pps = measure(n, args.patterns_per_device, args.taxa, args.grad)
        if base is None:
            base = pps
        eff = pps / (n * base)
        print(json.dumps({
            "devices": n,
            "patterns_per_s": round(pps, 1),
            "weak_scaling_efficiency": round(eff, 4),
            "patterns_per_device": args.patterns_per_device,
            "taxa": args.taxa,
            "measuring": "grad" if args.grad else "forward",
            "platform": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
