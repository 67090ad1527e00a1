"""Partitioned-fit cost vs partition count: looped vs stacked (r5 item 3).

Round 4's APPBENCH measured the 4-locus PartitionedEngine at 2.22 warm
adam steps/s against 77.9 single-engine L-BFGS steps/s and a 1949 s cold
wall (~96% remote compile of the 4-engine chunk) — with no measurement of
how either cost scales with partition count, and no alternative
formulation tried. This harness produces that scaling curve for BOTH
formulations on the chip:

  looped    PartitionedEngine — one inlined engine subgraph per locus
  stacked   StackedPartitionedEngine — loci on a vmap batch axis of ONE
            engine (program size independent of G)

Per (formulation, G in --parts): cold wall of the first fit chunk
(dominated by compile), then warm steps/s of a second fit from the same
state (program cached). APPBENCH-shaped config: --taxa 64, G loci x
(--sites/G) columns of one GTR+G4-simulated alignment, pallas pruner,
adam(2e-2) in --chunk-step scanned chunks.

Usage: python benchmarks/partition_scaling.py [--parts 1,2,4,8]
Prints one JSON line (plus per-row progress lines).
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
    ap.add_argument("--parts", default="1,2,4,8")
    ap.add_argument("--taxa", type=int, default=64)
    ap.add_argument("--sites", type=int, default=1000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--chunk-steps", type=int, default=50)
    ap.add_argument("--formulations", default="stacked,looped")
    args = ap.parse_args()
    counts = [int(x) for x in args.parts.split(",")]

    import jax
    import optax

    jax.config.update("jax_enable_x64", True)

    from phylo_utils_tpu import models
    from phylo_utils_tpu.optimize import fit
    from phylo_utils_tpu.partition import (
        Partition,
        PartitionedEngine,
        StackedPartitionedEngine,
    )
    from phylo_utils_tpu.simulate import simulate_alignment
    from phylo_utils_tpu.trees import random_tree
    from phylo_utils_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    tree = random_tree(args.taxa, seed=0)
    aln = simulate_alignment(jax.random.PRNGKey(1), tree, models.GTR,
                             n_sites=args.sites, ncat=4)

    classes = {
        "looped": PartitionedEngine,
        "stacked": StackedPartitionedEngine,
    }
    rows = []
    for g in counts:
        q = args.sites // g
        parts = [
            Partition(
                f"locus{i}",
                {k: v[i * q:(i + 1) * q] for k, v in aln.items()},
                models.GTR, ncat=4,
            )
            for i in range(g)
        ]
        for form in args.formulations.split(","):
            cls = classes[form]
            t0 = time.perf_counter()
            pe = cls(tree, parts, pruner="pallas", dtype="float32")
            ll0 = pe.loglikelihood()
            res1 = fit(pe, optimizer=optax.adam(2e-2),
                       max_steps=args.chunk_steps,
                       steps_per_call=args.chunk_steps, patience=10 ** 6)
            cold_s = time.perf_counter() - t0
            # warm: same program (chunk shape pinned), fresh run
            t0 = time.perf_counter()
            res2 = fit(pe, params0=res1.params,
                       optimizer=optax.adam(2e-2), max_steps=args.steps,
                       steps_per_call=args.chunk_steps, patience=10 ** 6)
            warm_s = time.perf_counter() - t0
            row = {
                "formulation": form,
                "n_partitions": g,
                "cold_wall_s": round(cold_s, 2),
                "warm_wall_s": round(warm_s, 2),
                "warm_steps_per_s": round(res2.n_steps / warm_s, 2),
                "loglik_start": round(ll0, 2),
                "loglik_end": round(res2.loglik, 2),
            }
            rows.append(row)
            print(json.dumps({"row": row}), flush=True)

    print(json.dumps({
        "metric": "partitioned-fit scaling (cold compile + warm steps/s) "
                  "vs partition count, looped vs stacked",
        "config": {"taxa": args.taxa, "sites": args.sites,
                   "model": "GTR+G4 per locus", "pruner": "pallas",
                   "optimizer": f"adam(2e-2) x{args.chunk_steps}-chunks"},
        "rows": rows,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
