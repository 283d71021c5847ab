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


def multivariate_normal_logpdf(x, mean, precision=None, covariance=None):
    """MVN log density (ref: dr.math.distributions.MultivariateNormalDistribution).
    Supply either a precision or a covariance matrix."""
    x = jnp.asarray(x)
    d = x.shape[-1]
    diff = x - jnp.asarray(mean)
    if precision is not None:
        p = jnp.asarray(precision)
        sign, logdet_p = jnp.linalg.slogdet(p)
        quad = diff @ p @ diff
        return 0.5 * (logdet_p - d * jnp.log(2 * jnp.pi) - quad)
    c = jnp.asarray(covariance)
    sol = jnp.linalg.solve(c, diff)
    sign, logdet_c = jnp.linalg.slogdet(c)
    return -0.5 * (logdet_c + d * jnp.log(2 * jnp.pi) + diff @ sol)


def bayesian_bridge_logpdf(x, global_scale, exponent=0.25, local_scales=None,
                           reduce: bool = True):
    """Bayesian bridge shrinkage prior (ref:
    dr.inference.distribution.shrinkage.BayesianBridgeLikelihood /
    BayesianBridgeDistributionModel): p(x) = c * exp(-|x / tau|^alpha) with
    c = alpha / (2 tau Gamma(1/alpha)); with local scales the effective
    scale is tau * lambda_i (the normal-scale-mixture parameterisation)."""
    x = jnp.asarray(x)
    tau = jnp.asarray(global_scale)
    alpha = jnp.asarray(exponent)
    if local_scales is not None:
        # conditionally normal given local scales: x_i ~ N(0, (tau*lambda_i)^2)
        sd = tau * jnp.asarray(local_scales)
        lp = -0.5 * (jnp.log(2 * jnp.pi) + 2 * jnp.log(sd) + (x / sd) ** 2)
    else:
        lp = (jnp.log(alpha) - jnp.log(2 * tau) - gammaln(1.0 / alpha)
              - jnp.abs(x / tau) ** alpha)
    return _sum(lp) if reduce else lp


def lkj_logpdf(corr, shape=1.0):
    """LKJ prior over correlation matrices (ref:
    dr.math.distributions.LKJCorrelationDistribution): log p(R) =
    (shape-1) log det R + log normaliser. The normaliser is constant in R
    and omitted (MH ratios cancel it)."""
    sign, logdet = jnp.linalg.slogdet(jnp.asarray(corr))
    return (jnp.asarray(shape) - 1.0) * logdet


def _multivariate_gammaln(a, d):
    j = jnp.arange(d)
    return 0.25 * d * (d - 1) * jnp.log(jnp.pi) + jnp.sum(gammaln(a - 0.5 * j))


def wishart_logpdf(w, df, scale_matrix):
    """Wishart log density over PD matrices (ref:
    dr.math.distributions.WishartDistribution)."""
    w = jnp.asarray(w)
    s = jnp.asarray(scale_matrix)
    d = w.shape[-1]
    df = jnp.asarray(df, w.dtype)
    _, logdet_w = jnp.linalg.slogdet(w)
    _, logdet_s = jnp.linalg.slogdet(s)
    tr = jnp.trace(jnp.linalg.solve(s, w))
    return (0.5 * (df - d - 1) * logdet_w - 0.5 * tr
            - 0.5 * df * d * jnp.log(2.0) - 0.5 * df * logdet_s
            - _multivariate_gammaln(0.5 * df, d))


def inverse_wishart_logpdf(w, df, scale_matrix):
    """Inverse-Wishart log density (ref:
    dr.math.distributions.InverseWishartDistribution)."""
    w = jnp.asarray(w)
    s = jnp.asarray(scale_matrix)
    d = w.shape[-1]
    df = jnp.asarray(df, w.dtype)
    _, logdet_w = jnp.linalg.slogdet(w)
    _, logdet_s = jnp.linalg.slogdet(s)
    tr = jnp.trace(jnp.linalg.solve(w, s))
    return (0.5 * df * logdet_s - 0.5 * (df + d + 1) * logdet_w - 0.5 * tr
            - 0.5 * df * d * jnp.log(2.0) - _multivariate_gammaln(0.5 * df, d))


def half_t_logpdf(x, scale, df=1.0):
    """Half-t (df=1: half-Cauchy) on x >= 0 — the local/global scale prior
    used by horseshoe-style shrinkage (ref: dr.inference.distribution
    shrinkage priors)."""
    x = jnp.asarray(x)
    s = jnp.asarray(scale)
    nu = jnp.asarray(df)
    z = x / s
    lp = (gammaln(0.5 * (nu + 1)) - gammaln(0.5 * nu)
          - 0.5 * jnp.log(nu * jnp.pi) - jnp.log(s)
          - 0.5 * (nu + 1) * jnp.log1p(z * z / nu) + jnp.log(2.0))
    return _sum(jnp.where(x >= 0, lp, -jnp.inf))
