"""Discrete-gamma rate heterogeneity, fully in-graph and differentiable in
the shape parameter alpha.

Reference parity: phylo_utils/likcalc.pyx ``discrete_gamma`` — PAML's
Yang (1994) discretization (SURVEY.md §2 [HIGH capability]). The reference
computes rates on the host with an incomplete-gamma inverse; here the
quantile function is inverted on device with a Wilson-Hilferty-initialized
Newton iteration in log space, and category means use the regularized
incomplete gamma (whose d/da JAX defines), so d(rates)/d(alpha) is exact —
this is what makes the gamma shape a first-class optimizable parameter
(SURVEY.md §7 hard part 2).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import gammainc, ndtri

__all__ = ["gamma_quantile", "discrete_gamma"]


def _gamma_logpdf_unit_scale(a, x):
    # log pdf of Gamma(a, scale=1)
    return (a - 1.0) * jnp.log(x) - x - jax.scipy.special.gammaln(a)


@partial(jnp.vectorize, excluded=frozenset(), signature="(),()->()")
def gamma_quantile(a, q):
    """Quantile of Gamma(shape=a, scale=1): x with gammainc(a, x) = q.

    Wilson-Hilferty init + Newton in log space (always-positive iterates,
    quadratic convergence). Fixed 30 iterations keeps the op trace-static;
    implicit differentiation falls out of the last Newton step since JAX has
    d/da and d/dx of gammainc.
    """
    dtype = jnp.result_type(a, q)
    a = jnp.asarray(a, dtype)
    q = jnp.asarray(q, dtype)
    z = ndtri(q)
    wh = a * (1.0 - 1.0 / (9.0 * a) + z / (3.0 * jnp.sqrt(a))) ** 3
    # Wilson-Hilferty can go nonpositive for small a; fall back to the
    # small-shape asymptote x ~ (q * Gamma(a+1))^(1/a).
    small = jnp.exp((jnp.log(q) + jax.scipy.special.gammaln(a + 1.0)) / a)
    x0 = jnp.where(wh > 1e-300, wh, small)
    x0 = jnp.maximum(x0, jnp.asarray(1e-300, dtype))
    y0 = jnp.log(x0)

    def newton(y, _):
        x = jnp.exp(y)
        f = gammainc(a, x) - q
        # dF/dy = pdf(x) * x
        dfdy = jnp.exp(_gamma_logpdf_unit_scale(a, x) + y)
        step = f / jnp.maximum(dfdy, jnp.asarray(1e-300, dtype))
        step = jnp.clip(step, -4.0, 4.0)  # safeguard far-field steps
        return y - step, None

    # Newton is quadratic from the Wilson-Hilferty start (already ~1e-2
    # relative): 12 iterations reach f64 roundoff with wide margin (6-7
    # suffice; the extra ones cost nothing numerically but each iteration
    # is a sequential on-device gammainc, so don't run 30).
    y, _ = lax.scan(newton, y0, None, length=12)
    return jnp.exp(y)


def discrete_gamma(alpha, ncat: int, median: bool = False) -> jnp.ndarray:
    """PAML-style discrete gamma category rates, mean 1 (Yang 1994).

    Differentiable in ``alpha``. ``ncat`` is static.
    """
    alpha = jnp.asarray(alpha)
    dtype = alpha.dtype if jnp.issubdtype(alpha.dtype, jnp.floating) else None
    if dtype is None:
        alpha = alpha.astype(jnp.result_type(float))
        dtype = alpha.dtype
    if ncat == 1:
        return jnp.ones((1,), dtype)
    if median:
        qs = (2.0 * jnp.arange(ncat, dtype=dtype) + 1.0) / (2.0 * ncat)
        rates = gamma_quantile(alpha, qs) / alpha
        return rates * (ncat / jnp.sum(rates))
    qs = jnp.arange(1, ncat, dtype=dtype) / ncat
    cuts = gamma_quantile(alpha, qs) / alpha  # quantiles of Gamma(a, rate=a)
    # mean-in-bin via regularized incomplete gamma at shape alpha+1:
    # E[X 1{a<X<b}] = I(alpha+1, alpha*b) - I(alpha+1, alpha*a) for rate=alpha
    upper = gammainc(alpha + 1.0, cuts * alpha)
    hi = jnp.concatenate([upper, jnp.ones((1,), dtype)])
    lo = jnp.concatenate([jnp.zeros((1,), dtype), upper])
    return ncat * (hi - lo)
