"""Transition-matrix facade mirroring the reference's markov layer.

Reference parity: phylo_utils/markov.py ``TransitionMatrix`` — P(t) from the
model's eigendecomposition, dP/dt = Q P, d2P/dt2 = Q^2 P, equilibrium
frequency access, and row sampling for simulation (SURVEY.md §2 [MED names,
HIGH mechanism]).

This is a thin OO veneer for users migrating from the reference; the engine
itself uses the pure-function layer (ops.pmatrix) directly. ``t`` may be a
scalar or any batch shape — everything is one fused device computation.
"""
from __future__ import annotations

from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from phylo_utils_tpu.models.base import Model
from phylo_utils_tpu.ops.pmatrix import (
    d2p_matrices,
    dp_matrices,
    transition_matrices,
)

__all__ = ["TransitionMatrix"]


class TransitionMatrix:
    """P(t) evaluator for one model + parameter setting."""

    def __init__(self, model: Model, params: Optional[Mapping] = None,
                 dtype=None):
        self.model = model
        self.params = params
        self.eigen = model.eigen(params, dtype=dtype)

    @property
    def freqs(self) -> jnp.ndarray:
        """Equilibrium frequencies pi."""
        return self.eigen.freqs

    @property
    def q(self) -> jnp.ndarray:
        """Normalized rate matrix (mean equilibrium rate 1)."""
        return self.eigen.q

    def get_p_matrix(self, t) -> jnp.ndarray:
        """P(t) = expm(Q t); t scalar or batched -> (..., S, S)."""
        return transition_matrices(self.eigen, jnp.asarray(t))

    def get_dp_matrix(self, t) -> jnp.ndarray:
        """dP/dt = Q P(t)."""
        return dp_matrices(self.eigen, jnp.asarray(t))

    def get_d2p_matrix(self, t) -> jnp.ndarray:
        """d2P/dt2 = Q^2 P(t)."""
        return d2p_matrices(self.eigen, jnp.asarray(t))

    def sample_states(self, key, parent_states, t) -> jnp.ndarray:
        """Draw child states from P(t) rows of ``parent_states`` (the
        reference's weighted-choice simulation kernel, vectorized)."""
        p = self.get_p_matrix(t)
        rows = p[parent_states, :]
        return jax.random.categorical(
            key, jnp.log(jnp.clip(rows, 1e-30, None))
        ).astype(jnp.int32)
