"""Model mixtures: categories that differ in MODEL PARAMETERS, not just rate.

Rate mixtures (gamma/FreeRate) scale branch lengths per category; model
mixtures give each category its own substitution-model parameters — e.g.
the M3 site-selection models (discrete omega classes over a GY94 codon
model: sites evolve under purifying/neutral/positive selection with
estimable class weights), or empirical profile mixtures. The pruning pass
already carries a category axis, so the only change is building one Q (and
P batch) per category via vmap over a stacked parameter PyTree.

``omega_posteriors`` gives per-site posterior class membership and the
posterior mean omega — the standard positive-selection site scan.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from phylo_utils_tpu.likelihood import LikelihoodEngine
from phylo_utils_tpu.ops.pmatrix import (
    extend_p_identity,
    p_matrices_reversible,
)
from phylo_utils_tpu.ops.pruning import (
    invariant_site_likelihood,
    mixture_loglik,
)

__all__ = ["ModelMixtureEngine", "omega_posteriors"]


def _stack_params(param_dicts: Sequence[Mapping], dtype) -> Dict:
    """List of per-category param dicts -> one dict of stacked leaves."""
    keys = set(param_dicts[0].keys())
    for d in param_dicts[1:]:
        if set(d.keys()) != keys:
            raise ValueError("mixture categories must share parameter names")
    return {
        k: jnp.stack([jnp.asarray(d[k], dtype) for d in param_dicts])
        for k in keys
    }


class ModelMixtureEngine(LikelihoodEngine):
    """LikelihoodEngine whose categories have independent model parameters.

    ``mixture``: list of K parameter dicts for ``model`` (same keys each);
    weights start uniform and are a free simplex parameter
    (``cat_weights``). The reversible model's build is vmapped over the
    stacked parameters, producing per-category Q/P; everything downstream
    (pruning, scaling, mixing, gradients, sharding) is unchanged.
    """

    def __init__(self, tree, alignment, model, mixture: Sequence[Mapping],
                 **kwargs):
        if not model.reversible:
            raise ValueError("model mixtures require a reversible model")
        if len(mixture) < 2:
            raise ValueError("need at least 2 mixture categories")
        kwargs.pop("ncat", None)
        super().__init__(tree, alignment, model, ncat=len(mixture), **kwargs)
        self._mixture0 = [
            {**{k: v for k, v in model.param_defaults.items()}, **dict(m)}
            for m in mixture
        ]

    def default_params(self) -> Dict:
        params = {
            "branch_lengths": jnp.asarray(self.tree.lengths, self.dtype),
            "mixture": _stack_params(self._mixture0, self.dtype),
            "cat_weights": jnp.full(
                (self.ncat,), 1.0 / self.ncat, self.dtype
            ),
        }
        if self.invariant_sites:
            params["pinv"] = jnp.asarray(0.2, self.dtype)
        return params

    def _full_params(self, params: Optional[Mapping]) -> Dict:
        full = self.default_params()
        if params:
            for k, v in params.items():
                if k == "mixture":
                    full["mixture"] = {**full["mixture"], **{
                        kk: jnp.asarray(vv, self.dtype)
                        for kk, vv in v.items()
                    }}
                else:
                    full[k] = jnp.asarray(v, self.dtype)
        return full

    def _loglik_fn(self, params, leaf_partials, weights):
        dtype = self.dtype
        cat_weights = params["cat_weights"].astype(dtype)
        cat_weights = cat_weights / jnp.sum(cat_weights)
        t = params["branch_lengths"].astype(dtype)           # (n_nodes,)

        def build_one(cat_params):
            return self.model.build(**cat_params)            # (sym, freqs)

        sym_k, freqs_k = jax.vmap(build_one)(params["mixture"])  # (K,S,S),(K,S)
        # per-category P for all edges: vmap categories, batch edges inside
        p_k = jax.vmap(
            lambda s, f: p_matrices_reversible(s, f, t)
        )(sym_k, freqs_k)                                    # (K, n_nodes, S, S)
        p = jnp.swapaxes(p_k, 0, 1)                          # (n_nodes, K, S, S)
        p = extend_p_identity(p, self.schedule.n_nodes)
        root_partials, root_logscale = self._prune(p, leaf_partials)
        # mixture root reduction with PER-CATEGORY frequencies
        site_lik = jnp.einsum(
            "ksi,ki->ks", root_partials, freqs_k.astype(dtype)
        )
        m = jnp.max(root_logscale, axis=0)
        mixed = jnp.sum(
            cat_weights[:, None] * site_lik
            * jnp.exp(root_logscale - m[None, :]),
            axis=0,
        )
        if self.invariant_sites:
            pinv = jnp.asarray(params["pinv"], dtype)
            # invariant component under the weight-averaged frequencies
            freqs_bar = jnp.einsum("k,ki->i", cat_weights, freqs_k)
            inv = invariant_site_likelihood(leaf_partials, freqs_bar)
            log_var = jnp.log(mixed) + m
            log_inv = jnp.where(
                inv > 0, jnp.log(jnp.where(inv > 0, inv, 1.0)), -jnp.inf
            )
            sitewise = jnp.logaddexp(
                jnp.log1p(-pinv) + log_var, jnp.log(pinv) + log_inv
            )
        else:
            sitewise = jnp.log(mixed) + m
        total = jnp.sum(weights.astype(dtype) * sitewise)
        return total, sitewise

    def category_posteriors(self, params: Optional[Mapping] = None):
        """Per-site posterior class membership (n_sites, K)."""
        full = self._full_params(params)
        dtype = self.dtype

        def compute(full, leaf_partials):
            cat_weights = full["cat_weights"].astype(dtype)
            cat_weights = cat_weights / jnp.sum(cat_weights)
            t = full["branch_lengths"].astype(dtype)
            sym_k, freqs_k = jax.vmap(
                lambda cp: self.model.build(**cp)
            )(full["mixture"])
            p_k = jax.vmap(
                lambda s, f: p_matrices_reversible(s, f, t)
            )(sym_k, freqs_k)
            p = jnp.swapaxes(p_k, 0, 1)
            p = extend_p_identity(p, self.schedule.n_nodes)
            root_partials, root_logscale = self._prune(p, leaf_partials)
            lik = jnp.einsum("ksi,ki->ks", root_partials,
                             freqs_k.astype(dtype))
            m = jnp.max(root_logscale, axis=0)
            gam = cat_weights[:, None] * lik * jnp.exp(
                root_logscale - m[None, :]
            )
            return (gam / jnp.sum(gam, axis=0, keepdims=True)).T

        if not hasattr(self, "_catpost_jit"):
            self._catpost_jit = jax.jit(compute)
        gam = self._catpost_jit(full, self._leaf_partials)
        gam = np.asarray(gam)[: self._compressed.n_patterns]
        return gam[self._compressed.site_to_pattern]


def omega_posteriors(
    engine: ModelMixtureEngine, params: Optional[Mapping] = None
):
    """Per-site (posterior_mean_omega, class_posteriors) for a GY94 omega
    mixture (M3-style site-selection scan)."""
    full = engine._full_params(params)
    omegas = np.asarray(full["mixture"]["omega"], np.float64)
    gam = engine.category_posteriors(params)
    return gam @ omegas, gam
