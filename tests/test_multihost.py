"""True multi-process distributed test: two processes, one global mesh.

Exercises the actual multi-host runtime path (jax.distributed.initialize +
global mesh + make_array_from_process_local_data + cross-process reduction)
on CPU — the same code a TPU pod slice runs, with DCN swapped for local
gRPC. SURVEY.md §4.5 / §5.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "benchmarks", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_loglik():
    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # drop the axon sitecustomize hook
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""                # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=_REPO,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert all(o["global_devices"] == 8 for o in outs)
    assert all(o["match"] for o in outs), outs
    # both processes observe the identical globally-reduced logL
    assert outs[0]["sharded_loglik"] == outs[1]["sharded_loglik"]
