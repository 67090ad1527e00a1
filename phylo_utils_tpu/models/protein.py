"""Empirical protein models LG and WAG (20 states, PAML order).

Reference parity: phylo_utils/models.py LG/WAG classes with optional user
frequencies, i.e. "+F" (SURVEY.md §2 [HIGH]).
"""
from __future__ import annotations

import jax.numpy as jnp

from phylo_utils_tpu.data import LG_FREQS, LG_RATES, WAG_FREQS, WAG_RATES
from phylo_utils_tpu.models.base import Model


def _lg_build(freqs):
    freqs = jnp.asarray(freqs)
    return jnp.asarray(LG_RATES, freqs.dtype), freqs


def _wag_build(freqs):
    freqs = jnp.asarray(freqs)
    return jnp.asarray(WAG_RATES, freqs.dtype), freqs


LG = Model("LG", 20, "protein", {"freqs": tuple(LG_FREQS.tolist())}, _lg_build)
WAG = Model("WAG", 20, "protein", {"freqs": tuple(WAG_FREQS.tolist())}, _wag_build)
