"""Prior log-density library.

Functional role of dr.inference.distribution.DistributionLikelihood over
dr.math.distributions.* (ref: src/dr/math/distributions — 70 classes; the
subset here covers the priors used across the reference's example corpus).
Every function returns the log density evaluated elementwise and summed,
with -inf outside support (which is also how parameter bounds reject
proposals — the MH kernel sees -inf and rejects).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln


def _sum(x):
    return jnp.sum(x)


def uniform_logpdf(x, lower, upper):
    x = jnp.asarray(x)
    in_range = (x >= lower) & (x <= upper)
    return _sum(jnp.where(in_range, -jnp.log(upper - lower), -jnp.inf))


def normal_logpdf(x, mean, stdev):
    x = jnp.asarray(x)
    z = (x - mean) / stdev
    return _sum(-0.5 * z * z - jnp.log(stdev) - 0.5 * jnp.log(2 * jnp.pi))


def lognormal_logpdf(x, mu, sigma):
    """mu/sigma in log space (ref: LogNormalDistribution.java — BEAST's
    <logNormalPrior mean= stdev=> with meanInRealSpace=false)."""
    x = jnp.asarray(x)
    safe = x > 0
    lx = jnp.log(jnp.where(safe, x, 1.0))
    z = (lx - mu) / sigma
    lp = -0.5 * z * z - lx - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi)
    return _sum(jnp.where(safe, lp, -jnp.inf))


def gamma_logpdf(x, shape, scale):
    x = jnp.asarray(x)
    safe = x > 0
    xs = jnp.where(safe, x, 1.0)
    lp = (shape - 1) * jnp.log(xs) - xs / scale - gammaln(shape) - shape * jnp.log(scale)
    return _sum(jnp.where(safe, lp, -jnp.inf))


def inverse_gamma_logpdf(x, shape, scale):
    x = jnp.asarray(x)
    safe = x > 0
    xs = jnp.where(safe, x, 1.0)
    lp = -(shape + 1) * jnp.log(xs) - scale / xs - gammaln(shape) + shape * jnp.log(scale)
    return _sum(jnp.where(safe, lp, -jnp.inf))


def exponential_logpdf(x, mean):
    x = jnp.asarray(x)
    safe = x >= 0
    return _sum(jnp.where(safe, -x / mean - jnp.log(mean), -jnp.inf))


def laplace_logpdf(x, mean, scale):
    x = jnp.asarray(x)
    return _sum(-jnp.abs(x - mean) / scale - jnp.log(2 * scale))


def beta_logpdf(x, alpha, beta):
    x = jnp.asarray(x)
    safe = (x > 0) & (x < 1)
    xs = jnp.where(safe, x, 0.5)
    lp = (alpha - 1) * jnp.log(xs) + (beta - 1) * jnp.log1p(-xs) - betaln(alpha, beta)
    return _sum(jnp.where(safe, lp, -jnp.inf))


def dirichlet_logpdf(x, alpha):
    x = jnp.asarray(x)
    alpha = jnp.asarray(alpha, x.dtype)
    safe = jnp.all(x > 0) & (jnp.abs(jnp.sum(x) - 1.0) < 1e-8)
    xs = jnp.where(x > 0, x, 1.0)
    lp = jnp.sum((alpha - 1) * jnp.log(xs)) + gammaln(jnp.sum(alpha)) - jnp.sum(gammaln(alpha))
    return jnp.where(safe, lp, -jnp.inf)


def one_on_x_logpdf(x):
    """Improper 1/x prior (ref: OneOnXPrior, inferencexml oneOnXPrior)."""
    x = jnp.asarray(x)
    return _sum(jnp.where(x > 0, -jnp.log(x), -jnp.inf))


def poisson_logpmf(k, mean):
    k = jnp.asarray(k)
    return _sum(k * jnp.log(mean) - mean - gammaln(k + 1.0))


def ctmc_scale_logpdf(rate, tree_length):
    """CTMC reference prior for the overall clock rate (ref:
    src/dr/evomodel/tree/CTMCScalePrior.java:51 — p(rate) ∝
    sqrt(T/rate) e^{-rate T} with T the tree length in time units)."""
    rate = jnp.asarray(rate)
    safe = rate > 0
    rs = jnp.where(safe, rate, 1.0)
    lp = 0.5 * (jnp.log(tree_length) - jnp.log(rs)) - rs * tree_length - gammaln(0.5)
    return _sum(jnp.where(safe, lp, -jnp.inf))


def normal_gamma_precision_logpdf(x, mean, precision):
    x = jnp.asarray(x)
    z = (x - mean)
    return _sum(0.5 * jnp.log(precision) - 0.5 * precision * z * z - 0.5 * jnp.log(2 * jnp.pi))
