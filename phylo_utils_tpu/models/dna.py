"""DNA substitution models (state order A, C, G, T).

Reference parity: phylo_utils/models.py JC69/K80/F81/F84/HKY85/TN93/GTR
(SURVEY.md §2 [HIGH for JC69/K80/HKY85/GTR, MED for F81/F84/TN93]) and the
non-reversible UNREST model ([LOW]).

Transitions are A<->G (indices 0,2) and C<->T (indices 1,3).
"""
from __future__ import annotations

import jax.numpy as jnp

from phylo_utils_tpu.models.base import Model, normalize_q, stationary_from_q

_QUARTER = (0.25, 0.25, 0.25, 0.25)


def _sym_from_six(ac, ag, at, cg, ct, gt, dtype):
    z = jnp.zeros((), dtype)
    row0 = jnp.stack([z, ac, ag, at])
    row1 = jnp.stack([ac, z, cg, ct])
    row2 = jnp.stack([ag, cg, z, gt])
    row3 = jnp.stack([at, ct, gt, z])
    return jnp.stack([row0, row1, row2, row3])


def _jc69_build():
    one = jnp.ones(())
    s = _sym_from_six(one, one, one, one, one, one, one.dtype)
    return s, jnp.full((4,), 0.25, s.dtype)


def _k80_build(kappa):
    kappa = jnp.asarray(kappa)
    one = jnp.ones((), kappa.dtype)
    s = _sym_from_six(one, kappa, one, one, kappa, one, kappa.dtype)
    return s, jnp.full((4,), 0.25, kappa.dtype)


def _f81_build(freqs):
    freqs = jnp.asarray(freqs)
    return jnp.ones((4, 4), freqs.dtype), freqs


def _hky85_build(kappa, freqs):
    kappa = jnp.asarray(kappa)
    freqs = jnp.asarray(freqs)
    one = jnp.ones((), kappa.dtype)
    s = _sym_from_six(one, kappa, one, one, kappa, one, kappa.dtype)
    return s, freqs


def _f84_build(kappa, freqs):
    kappa = jnp.asarray(kappa)
    freqs = jnp.asarray(freqs)
    pur = freqs[0] + freqs[2]
    pyr = freqs[1] + freqs[3]
    one = jnp.ones((), kappa.dtype)
    s = _sym_from_six(one, one + kappa / pur, one, one, one + kappa / pyr, one,
                      kappa.dtype)
    return s, freqs


def _tn93_build(alpha1, alpha2, beta, freqs):
    alpha1, alpha2, beta = (jnp.asarray(x) for x in (alpha1, alpha2, beta))
    freqs = jnp.asarray(freqs)
    s = _sym_from_six(beta, alpha1, beta, beta, alpha2, beta, freqs.dtype)
    return s, freqs


def _gtr_build(rates, freqs):
    rates = jnp.asarray(rates)
    freqs = jnp.asarray(freqs)
    s = _sym_from_six(rates[0], rates[1], rates[2], rates[3], rates[4], rates[5],
                      rates.dtype)
    return s, freqs


def _unrest_build(rates):
    """12 off-diagonal rates, row-major (q_AC,q_AG,q_AT, q_CA,q_CG,q_CT,
    q_GA,q_GC,q_GT, q_TA,q_TC,q_TG). Returns (normalized Q, stationary pi)."""
    r = jnp.asarray(rates)
    z = jnp.zeros((), r.dtype)
    q = jnp.stack([
        jnp.stack([z, r[0], r[1], r[2]]),
        jnp.stack([r[3], z, r[4], r[5]]),
        jnp.stack([r[6], r[7], z, r[8]]),
        jnp.stack([r[9], r[10], z * 0 + r[11], z]),
    ])
    q = q - jnp.diag(jnp.sum(q, axis=1))
    pi = stationary_from_q(q)
    return normalize_q(q, pi), pi


JC69 = Model("JC69", 4, "dna", {}, _jc69_build)
K80 = Model("K80", 4, "dna", {"kappa": 2.0}, _k80_build)
F81 = Model("F81", 4, "dna", {"freqs": _QUARTER}, _f81_build)
F84 = Model("F84", 4, "dna", {"kappa": 1.0, "freqs": _QUARTER}, _f84_build)
HKY85 = Model("HKY85", 4, "dna", {"kappa": 2.0, "freqs": _QUARTER}, _hky85_build)
TN93 = Model(
    "TN93", 4, "dna",
    {"alpha1": 2.0, "alpha2": 2.0, "beta": 1.0, "freqs": _QUARTER},
    _tn93_build,
)
GTR = Model(
    "GTR", 4, "dna",
    {"rates": (1.0,) * 6, "freqs": _QUARTER},
    _gtr_build,
)
UNREST = Model("UNREST", 4, "dna", {"rates": (1.0,) * 12}, _unrest_build,
               reversible=False)
