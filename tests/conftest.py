"""Test configuration: force an 8-device CPU mesh.

This environment boots JAX on the experimental ``axon`` TPU platform via a
sitecustomize hook (jax is already imported at interpreter start). Tests run on
a virtual 8-device CPU backend instead so sharding logic is exercised without
TPU hardware: the backend can be switched post-import as long as no arrays have
been created yet (verified in SURVEY.md §4.5 / §7).

x64 is enabled so float64 parity tests against the numpy oracle are exact.
"""
import os
import sys

# Make repo root importable regardless of pytest rootdir config.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
