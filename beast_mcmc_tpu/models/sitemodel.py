"""Across-site rate variation: discretized Gamma (+ invariant sites).

Functional role of dr.evomodel.siteratemodel.GammaSiteRateModel (and the
oldevomodel GammaSiteModel the golden oracles were computed with, ref:
src/dr/oldevomodel/sitemodel/GammaSiteModel.java calculateCategoryRates):

  - K gamma categories at median quantiles (2i+1)/(2K) of Gamma(a, 1/a)
  - optional invariant category: rate 0, weight pInv
  - rates normalized so the weighted mean rate across ALL categories is 1
  - an overall relative rate mu multiplies everything

The gamma quantile is computed by a jit-safe bisection/Newton inversion of
the regularized incomplete gamma function (no gammaincinv in jax).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc, gammaln


def gamma_quantile(p: jnp.ndarray, shape, scale) -> jnp.ndarray:
    """Inverse CDF of Gamma(shape, scale), elementwise over p.

    Bisection to locate, then Newton polish (the cdf is smooth and
    monotone; 60 bisection steps give ~1e-18 relative bracketing, Newton
    sharpens to machine precision). jit/vmap-safe; static iteration count.
    """
    a = jnp.asarray(shape, p.dtype)
    p = jnp.asarray(p)

    # initial bracket: Wilson-Hilferty start, then expand geometrically
    lo = jnp.full_like(p, 1e-300)
    hi = jnp.full_like(p, 1.0)

    def expand(_, hi):
        return jnp.where(gammainc(a, hi) < p, hi * 4.0, hi)

    hi = jax.lax.fori_loop(0, 60, expand, hi)

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = gammainc(a, mid) < p
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 80, bisect, (lo, hi))
    x = 0.5 * (lo + hi)

    # Newton polish: f(x) = gammainc(a,x) - p, f'(x) = x^(a-1) e^-x / Gamma(a)
    def newton(_, x):
        f = gammainc(a, x) - p
        logpdf = (a - 1.0) * jnp.log(x) - x - gammaln(a)
        step = f * jnp.exp(-logpdf)
        x_new = x - step
        return jnp.where((x_new > 0) & jnp.isfinite(x_new), x_new, x)

    x = jax.lax.fori_loop(0, 4, newton, x)
    return x * scale


def discrete_gamma_rates(
    alpha,
    n_categories: int,
    p_invariant=None,
    mu=None,
    dtype=jnp.float64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rates[C], weights[C]) matching GammaSiteModel.calculateCategoryRates.

    With p_invariant, category 0 is the invariant one (rate exactly 0).
    The gamma rates are the category-median quantiles, normalized so the
    full mixture has mean rate 1; mu rescales all rates.
    """
    alpha = jnp.asarray(alpha, dtype)
    k = n_categories
    quantiles = (2.0 * jnp.arange(k, dtype=dtype) + 1.0) / (2.0 * k)
    raw = gamma_quantile(quantiles, alpha, 1.0 / alpha)
    if p_invariant is None:
        rates = raw / jnp.mean(raw)
        weights = jnp.full((k,), 1.0 / k, dtype)
    else:
        p_inv = jnp.asarray(p_invariant, dtype)
        prop_var = 1.0 - p_inv
        # ref normalization: rate_i = q_i * K / (propVar * sum q)
        rates = raw / (prop_var * jnp.mean(raw))
        rates = jnp.concatenate([jnp.zeros((1,), dtype), rates])
        weights = jnp.concatenate(
            [p_inv[None], jnp.full((k,), 1.0, dtype) * prop_var / k]
        )
    if mu is not None:
        rates = rates * jnp.asarray(mu, dtype)
    return rates, weights


def invariant_only_rates(p_invariant, mu=None, dtype=jnp.float64):
    """No gamma, just +I: one zero-rate category plus one at 1/(1-pInv)."""
    p_inv = jnp.asarray(p_invariant, dtype)
    rates = jnp.stack([jnp.zeros((), dtype), 1.0 / (1.0 - p_inv)])
    weights = jnp.stack([p_inv, 1.0 - p_inv])
    if mu is not None:
        rates = rates * jnp.asarray(mu, dtype)
    return rates, weights


def single_rate(mu=None, dtype=jnp.float64):
    r = jnp.ones((1,), dtype)
    if mu is not None:
        r = r * jnp.asarray(mu, dtype)
    return r, jnp.ones((1,), dtype)
