"""Across-site rate variation: discretized Gamma (+ invariant sites).

Functional role of dr.evomodel.siteratemodel.GammaSiteRateModel (and the
oldevomodel GammaSiteModel the golden oracles were computed with, ref:
src/dr/oldevomodel/sitemodel/GammaSiteModel.java calculateCategoryRates):

  - K gamma categories at median quantiles (2i+1)/(2K) of Gamma(a, 1/a)
  - optional invariant category: rate 0, weight pInv
  - rates normalized so the weighted mean rate across ALL categories is 1
  - an overall relative rate mu multiplies everything

The gamma quantile comes from ops.special.gamma_quantile — a
fixed-iteration (TPU-friendly, no data-dependent while loops) inversion
of the regularized incomplete gamma function.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from beast_mcmc_tpu.ops.special import gamma_quantile, log_gamma_category_quantiles


def discrete_gamma_rates(
    alpha,
    n_categories: int,
    p_invariant=None,
    mu=None,
    dtype=jnp.float64,
    exact_quantiles: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rates[C], weights[C]) matching GammaSiteModel.calculateCategoryRates.

    With p_invariant, category 0 is the invariant one (rate exactly 0).
    The gamma rates are the category-median quantiles, normalized so the
    full mixture has mean rate 1; mu rescales all rates.

    Internally computed in f64 when x64 is on, cast to `dtype` on
    return: the cast makes the result BIT-IDENTICAL whether it is
    computed in the derived cache's operator branch or the
    full-evaluation self-check's fresh fusion context (the f32
    self-check depends on this — accum.py policy).
    """
    out_dtype = dtype
    import jax as _jax

    if _jax.config.jax_enable_x64:
        dtype = jnp.float64
    # AS91 bit-parity route: concrete f64 evaluation (host report paths)
    # runs the reference's exact published quantile algorithm, whose
    # 0.5e-6 truncation is part of the corpus' 1e-13 oracle values
    # (utils/as91.py). Traced/jitted evaluations keep the smooth
    # differentiable quantile below.
    if (exact_quantiles
            and dtype == jnp.float64 and p_invariant is None
            and not isinstance(alpha, _jax.core.Tracer)
            and (mu is None or not isinstance(mu, _jax.core.Tracer))):
        try:
            a_c = float(alpha)
        except (TypeError, _jax.errors.ConcretizationTypeError):
            a_c = None
        if a_c is not None and a_c > 0:
            from beast_mcmc_tpu.utils.as91 import gamma_category_rates

            r_np = gamma_category_rates(a_c, n_categories)
            rates = jnp.asarray(r_np, dtype)
            weights = jnp.full((n_categories,), 1.0 / n_categories, dtype)
            if mu is not None:
                rates = rates * jnp.asarray(mu, dtype)
            return rates.astype(out_dtype), weights.astype(out_dtype)
    alpha = jnp.asarray(alpha, dtype)
    k = n_categories
    # Chebyshev-tabulated log-quantiles (ops.special): the scale 1/alpha
    # cancels in the mean normalization, and normalizing in log space
    # stays exact even where the raw quantiles underflow (tiny alpha).
    lq = log_gamma_category_quantiles(alpha, k)
    lnorm = jax.nn.logsumexp(lq) - jnp.log(jnp.asarray(float(k), dtype))
    if p_invariant is None:
        rates = jnp.exp(lq - lnorm)
        weights = jnp.full((k,), 1.0 / k, dtype)
    else:
        p_inv = jnp.asarray(p_invariant, dtype)
        prop_var = 1.0 - p_inv
        # ref normalization: rate_i = q_i * K / (propVar * sum q)
        rates = jnp.exp(lq - lnorm) / prop_var
        rates = jnp.concatenate([jnp.zeros((1,), dtype), rates])
        weights = jnp.concatenate(
            [p_inv[None], jnp.full((k,), 1.0, dtype) * prop_var / k]
        )
    if mu is not None:
        rates = rates * jnp.asarray(mu, dtype)
    return rates.astype(out_dtype), weights.astype(out_dtype)


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


def free_rates(rates: jnp.ndarray, weights: jnp.ndarray):
    """Free-rate site model (ref: siteratemodel free-rate /
    DiscretizedSiteRateModel with explicit categories): arbitrary positive
    rates and simplex weights, renormalized so the expected rate is 1.
    Returns (rates [C], weights [C])."""
    w = weights / jnp.sum(weights)
    mean = jnp.sum(w * rates)
    return rates / mean, w
