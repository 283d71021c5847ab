"""Branch rate (molecular clock) models.

Functional role of dr.evomodel.branchratemodel (ref:
StrictClockBranchRates.java:42, DiscretizedBranchRates.java:53,327-340,
ContinuousBranchRates.java, ArbitraryBranchRates.java:55). A clock model
is a pure function from its parameters to a per-node rate vector [M]
(rate of the branch ABOVE each node; the root entry is unused).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import ndtri


def strict_clock_rates(rate, n_nodes: int, dtype=None) -> jnp.ndarray:
    """One global rate (ref: StrictClockBranchRates.java:42)."""
    rate = jnp.asarray(rate)
    return jnp.broadcast_to(rate, (n_nodes,))


def lognormal_quantile(q, mean, stdev, mean_in_real_space: bool = True):
    """Quantile of the UCLD rate distribution (ref:
    LogNormalDistributionModel quantile as used by DiscretizedBranchRates).
    With mean_in_real_space (BEAST's ucld.mean default), mu = log(mean) -
    sigma^2/2 so E[rate] = mean."""
    sigma = jnp.asarray(stdev)
    mu = jnp.where(
        mean_in_real_space,
        jnp.log(jnp.asarray(mean)) - 0.5 * sigma * sigma,
        jnp.asarray(mean),
    )
    return jnp.exp(mu + sigma * ndtri(q))


def discretized_lognormal_rates(
    categories: jnp.ndarray,  # int32[M] per-node category (root entry ignored)
    mean,
    stdev,
    n_categories: int | None = None,
    mean_in_real_space: bool = True,
) -> jnp.ndarray:
    """Uncorrelated relaxed clock, discretized parameterization.

    Each branch carries an integer category c; its rate is the lognormal
    quantile at (c + 0.5)/K (ref: DiscretizedBranchRates.java:327-340
    setupRates). Operators act on the integer categories (uniform-integer
    / swap moves), so topology moves never renumber rates.
    """
    k = n_categories or categories.shape[0]
    q = (categories.astype(jnp.float64) + 0.5) / k
    return lognormal_quantile(q, mean, stdev, mean_in_real_space)


def continuous_quantile_rates(quantiles: jnp.ndarray, mean, stdev,
                              mean_in_real_space: bool = True) -> jnp.ndarray:
    """Continuous-quantile relaxed clock (ref: ContinuousBranchRates.java)
    — each branch has q in (0,1); HMC-friendly (smooth in q)."""
    return lognormal_quantile(quantiles, mean, stdev, mean_in_real_space)


def arbitrary_rates(rates: jnp.ndarray) -> jnp.ndarray:
    """Unconstrained per-branch rates (ref: ArbitraryBranchRates.java:55)."""
    return rates


def rate_epoch_rates(
    heights: jnp.ndarray,
    parent: jnp.ndarray,
    epoch_times: jnp.ndarray,  # [E-1] ascending transition times
    epoch_rates: jnp.ndarray,  # [E]
) -> jnp.ndarray:
    """Epoch clock: the rate on a branch is the time-weighted average of
    epoch rates across the branch's span (ref: RateEpochBranchRateModel).
    """
    dt = heights.dtype
    pidx = jnp.maximum(parent, 0)
    t0 = heights
    t1 = jnp.where(parent >= 0, heights[pidx], heights)
    lo = jnp.concatenate([jnp.zeros((1,), dt), epoch_times])
    hi = jnp.concatenate([epoch_times, jnp.full((1,), jnp.inf, dt)])
    overlap = jnp.clip(
        jnp.minimum(t1[:, None], hi[None, :]) - jnp.maximum(t0[:, None], lo[None, :]),
        0.0,
    )
    dur = t1 - t0
    avg = jnp.sum(overlap * epoch_rates[None, :], axis=1) / jnp.where(dur > 0, dur, 1.0)
    return jnp.where(dur > 0, avg, epoch_rates[0])
