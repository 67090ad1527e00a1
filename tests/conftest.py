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

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Smoke tier (`pytest -m smoke`, <5 min): goldens, one config per engine
# family, kernel/gradient parity, one sharding equality — the fast
# high-signal subset for inner-loop verification. The full (~25 min) suite
# remains the default and runs at round end.
# ---------------------------------------------------------------------------

_SMOKE_MODULES = {
    "test_oracle",            # closed-form + property goldens
    "test_external_goldens",  # published Yang CME absolute anchors
    "test_likelihood",        # core engine vs oracle (DNA/protein, +G +I)
    "test_sharding",          # 8-device mesh equality + psum grads
    "test_gradients",         # jax.grad vs finite differences
    "test_facades",           # reference-API facades
}

_SMOKE_TESTS = {
    # Pallas kernel parity (fast cases only; segmented stress is full-tier)
    ("test_pallas_pruning", "test_pallas_matches_xla"),
    ("test_pallas_pruning", "test_pallas_gradients_match_xla"),
    ("test_pallas_pruning", "test_fused_loglik_value_and_grad_match_xla"),
    ("test_pallas_pruning",
     "test_deferred_vjp_kernel_leaf_grads_and_saveall_agreement"),
    # one config per engine family
    ("test_codon", "test_gy94_logl_matches_oracle"),
    ("test_morphology", "test_lewis_correction_hand_computed_binary"),
    ("test_freerate", "test_freerate_matches_oracle_weighted_mixture"),
    ("test_mixtures", "test_kappa_mixture_matches_golden"),
    ("test_profile_mixtures", "test_profile_mixture_matches_oracle"),
    ("test_clock", "test_calibrated_dating_recovers_absolute_ages"),
    ("test_partition", "test_partitioned_equals_sum_of_engines"),
    # optimization basics
    ("test_optimize", "test_transform_roundtrip"),
    ("test_optimize", "test_fit_improves_and_reaches_optimum_neighborhood"),
    # round-5 additions: platform-bug regression + one config per new
    # subsystem (grouped kernels are exercised by the pallas rows above)
    ("test_eigh_robustness", "test_sequential_eigh_matches_unbatched"),
    ("test_stacked_partition", "test_stacked_matches_general"),
    ("test_regroup", "test_tse_regrouped_matches_level_grid"),
    ("test_grouped_walk", "test_grouped_value_and_grad_match_classic"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base = item.name.split("[")[0]
        if mod in _SMOKE_MODULES or (mod, base) in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
