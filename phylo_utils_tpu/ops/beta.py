"""Discrete-beta omega classes, in-graph, differentiable in (p, q).

Used by the M7/M8 codon site-selection models (Yang et al. 2000): site
omega values follow Beta(p, q) on (0, 1), discretized into ``ncat``
equal-probability classes whose representative value is the within-bin
mean — the same discretization scheme as PAML's codeml.

The reference (kgori/phylo_utils) has no codon machinery; this extends the
framework's GY94 family (models/codon.py). Structure mirrors
``ops.gamma``: a fixed-iteration Newton quantile inversion keeps the op
trace-static. Unlike gammainc, JAX defines no derivative of betainc with
respect to its SHAPE parameters ("Betainc gradient with respect to a and b
not supported"), so the exact primal is wrapped in a ``custom_jvp`` whose
(p, q) tangents come from in-graph central differences — ncat extra
quantile solves per direction, negligible next to the pruning pass, and
accurate to ~h^2 = 1e-8 in f64.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import betainc, betaln

__all__ = ["beta_quantile", "discrete_beta"]


def _beta_logpdf(p, q, x):
    return (
        (p - 1.0) * jnp.log(x)
        + (q - 1.0) * jnp.log1p(-x)
        - betaln(p, q)
    )


@partial(jnp.vectorize, signature="(),(),()->()")
def beta_quantile(p, q, prob):
    """Quantile of Beta(p, q): x in (0,1) with betainc(p, q, x) = prob.

    Newton iteration in logit space (iterates stay inside (0,1); handles
    U-shaped p,q < 1 cases). Fixed 25 iterations keeps the trace static;
    the mean-based start is crude but the clamped logit-space steps make
    convergence robust across the (p, q) range used by M7/M8 fits.
    """
    dtype = jnp.result_type(p, q, prob)
    p = jnp.asarray(p, dtype)
    q = jnp.asarray(q, dtype)
    prob = jnp.asarray(prob, dtype)
    mean = p / (p + q)
    x0 = jnp.clip(mean, 1e-12, 1.0 - 1e-12)
    y0 = jnp.log(x0) - jnp.log1p(-x0)

    def newton(y, _):
        x = jax.nn.sigmoid(y)
        f = betainc(p, q, x) - prob
        # dF/dy = pdf(x) * x * (1 - x)  (sigmoid chain rule)
        dfdy = jnp.exp(_beta_logpdf(p, q, x) + jax.nn.log_sigmoid(y)
                       + jax.nn.log_sigmoid(-y))
        step = f / jnp.maximum(dfdy, jnp.asarray(1e-300, dtype))
        step = jnp.clip(step, -4.0, 4.0)
        return y - step, None

    y, _ = lax.scan(newton, y0, None, length=25)
    return jax.nn.sigmoid(y)


def _discrete_beta_means(p, q, ncat: int):
    """Within-bin means of Beta(p, q) over ncat equal-probability bins.

    E[X 1{a<X<b}] = mean * (I_b(p+1, q) - I_a(p+1, q)); class value is
    that divided by the bin mass 1/ncat.
    """
    dtype = jnp.result_type(p, q)
    qs = jnp.arange(1, ncat, dtype=dtype) / ncat
    cuts = beta_quantile(p, q, qs)
    upper = betainc(p + 1.0, q, cuts)
    hi = jnp.concatenate([upper, jnp.ones((1,), dtype)])
    lo = jnp.concatenate([jnp.zeros((1,), dtype), upper])
    return ncat * (p / (p + q)) * (hi - lo)


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def discrete_beta(p, q, ncat: int):
    """M7/M8-style discrete Beta(p, q) class values (length ``ncat``).

    Equal class weights 1/ncat; class value = within-bin mean (PAML
    codeml's discretization). Differentiable in p and q (see module
    docstring for how, given betainc's missing shape derivatives).
    """
    return _discrete_beta_means(p, q, ncat)


@discrete_beta.defjvp
def _discrete_beta_jvp(ncat, primals, tangents):
    p, q = primals
    dp, dq = tangents
    primal_out = _discrete_beta_means(p, q, ncat)
    dtype = primal_out.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    hp = eps ** (1.0 / 3.0) * jnp.maximum(1.0, jnp.abs(p))
    hq = eps ** (1.0 / 3.0) * jnp.maximum(1.0, jnp.abs(q))
    dfdp = (
        _discrete_beta_means(p + hp, q, ncat)
        - _discrete_beta_means(p - hp, q, ncat)
    ) / (2.0 * hp)
    dfdq = (
        _discrete_beta_means(p, q + hq, ncat)
        - _discrete_beta_means(p, q - hq, ncat)
    ) / (2.0 * hq)
    dp = jnp.zeros((), dtype) if type(dp) is jax.custom_derivatives.SymbolicZero else dp
    dq = jnp.zeros((), dtype) if type(dq) is jax.custom_derivatives.SymbolicZero else dq
    tangent_out = dfdp * dp + dfdq * dq
    return primal_out, tangent_out
