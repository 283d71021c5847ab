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


# ---------------------------------------------------------------------------
# Local clocks
# ---------------------------------------------------------------------------

def _doubling_steps(n_nodes: int) -> int:
    steps = 1
    while (1 << steps) < n_nodes:
        steps += 1
    return steps


def ancestor_or_self_mask(parent: jnp.ndarray, node) -> jnp.ndarray:
    """bool[M]: is `node` an ancestor-or-self of each node? O(M log M) via
    pointer doubling (jit-safe, fixed trip count)."""
    m = parent.shape[0]
    hit = jnp.arange(m) == node
    jump = jnp.where(parent >= 0, parent, jnp.arange(m))
    for _ in range(_doubling_steps(m)):
        hit = hit | hit[jump]
        jump = jump[jump]
    return hit


def local_clock_rates(assignment: jnp.ndarray, clock_rates: jnp.ndarray) -> jnp.ndarray:
    """Fixed local clocks: each branch carries an integer clock index into
    a small rate vector (ref: LocalClockModel — clade/trunk-scoped rates;
    the clade->branch assignment is computed once from the taxon sets via
    ancestor_or_self_mask and stays static under fixed topology)."""
    return clock_rates[assignment]


def random_local_clock_rates(
    parent: jnp.ndarray,      # int32[M], parent[root] == -1
    heights: jnp.ndarray,     # [M]
    indicators: jnp.ndarray,  # [M] real; > threshold means "rate changes here"
    rates: jnp.ndarray,       # [M] per-node raw rate variables
    mean_rate=None,
    rates_are_multipliers: bool = False,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Random local clock (Drummond & Suchard 2010).

    Each non-root node carries an indicator: if selected, the branch above
    it starts a new rate (or multiplies the inherited one); otherwise the
    parent's rate is inherited (ref: RandomLocalClockModel.java
    recursivelyCompute :179-210). Rates are then normalised so the
    time-weighted mean rate equals mean_rate (ref: recalculateScaleFactor
    :214-240, scaleFactor = sum(t) / sum(t * unscaled) * meanRate).

    The root-to-node propagation is pointer doubling over the parent
    array (log2(M) fixed iterations) instead of the reference's recursion,
    so it jits with static shapes.
    """
    m = parent.shape[0]
    dt = heights.dtype
    is_root = parent < 0
    sel = (indicators > threshold) & ~is_root
    jump = jnp.where(is_root, jnp.arange(m), parent)

    if rates_are_multipliers:
        # log unscaled rate = sum of selected log-multipliers on the
        # root->node path; prefix-sum by doubling.
        acc = jnp.where(sel, jnp.log(rates), 0.0).astype(dt)
        j = jump
        for _ in range(_doubling_steps(m)):
            acc = acc + jnp.where(j != jnp.arange(m), acc[j], 0.0)
            j = j[j]
        unscaled = jnp.exp(acc)
    else:
        # rate = variable at nearest selected ancestor-or-self, else 1.
        resolved = sel | is_root
        value = jnp.where(sel, rates, 1.0).astype(dt)
        j = jump
        for _ in range(_doubling_steps(m)):
            value = jnp.where(resolved, value, value[j])
            resolved = resolved | resolved[j]
            j = j[j]
        unscaled = value

    t = jnp.where(is_root, 0.0, heights[jnp.maximum(parent, 0)] - heights)
    scale = jnp.sum(t) / jnp.sum(t * unscaled)
    if mean_rate is not None:
        scale = scale * jnp.asarray(mean_rate)
    return unscaled * scale


# ---------------------------------------------------------------------------
# Autocorrelated / shrinkage rate priors
# ---------------------------------------------------------------------------

def branch_rate_increments(
    parent: jnp.ndarray,
    heights: jnp.ndarray,
    log_rates: jnp.ndarray,  # [M] per-node log rate (root entry = root value)
    scale_by_time: bool = False,
):
    """Per-branch increments log(rate_child) - log(rate_parent), optionally
    scaled by 1/sqrt(branch time) (ref:
    AutoCorrelatedBranchRatesDistribution BranchVarianceScaling BY_TIME).
    Returns (increments[M], valid_mask[M]) with root entry masked out.
    """
    is_root = parent < 0
    pidx = jnp.maximum(parent, 0)
    inc = log_rates - log_rates[pidx]
    if scale_by_time:
        t = jnp.where(is_root, 1.0, heights[pidx] - heights)
        inc = inc / jnp.sqrt(jnp.maximum(t, 1e-300))
    return jnp.where(is_root, 0.0, inc), ~is_root


def autocorrelated_rates_log_density(
    parent: jnp.ndarray,
    heights: jnp.ndarray,
    log_rates: jnp.ndarray,
    precision,
    scale_by_time: bool = True,
) -> jnp.ndarray:
    """Autocorrelated (geometric-Brownian-ish) relaxed clock prior: each
    branch's log-rate increment is N(0, t/precision) (ref:
    AutoCorrelatedBranchRatesDistribution.java over a normal distribution
    model; Thorne-Kishino style). Returns the log density over increments.
    """
    is_root = parent < 0
    pidx = jnp.maximum(parent, 0)
    inc = log_rates - log_rates[pidx]
    var = 1.0 / jnp.asarray(precision)
    if scale_by_time:
        var = var * jnp.where(is_root, 1.0, heights[pidx] - heights)
    ll = -0.5 * (jnp.log(2 * jnp.pi * var) + inc * inc / var)
    return jnp.sum(jnp.where(is_root, 0.0, ll))


def shrinkage_local_clock_log_density(
    parent: jnp.ndarray,
    heights: jnp.ndarray,
    log_rates: jnp.ndarray,
    global_scale,
    exponent=0.25,
    local_scales=None,
) -> jnp.ndarray:
    """Shrinkage-based random local clock: Bayesian-bridge prior on the
    per-branch log-rate increments, concentrating most increments at ~0
    (no rate change) with heavy tails for genuine local clocks (ref:
    branchratemodel/shrinkage/AutoCorrelatedRatesWithBayesianBridge.java).
    """
    from beast_mcmc_tpu.models.priors import bayesian_bridge_logpdf

    inc, valid = branch_rate_increments(parent, heights, log_rates)
    lp = bayesian_bridge_logpdf(inc, global_scale, exponent,
                                local_scales=local_scales, reduce=False)
    return jnp.sum(jnp.where(valid, lp, 0.0))


# ---------------------------------------------------------------------------
# Mixture-model branch rates
# ---------------------------------------------------------------------------

def lognormal_mixture_cdf(x, weights, means, stdevs, mean_in_real_space=True):
    from jax.scipy.special import ndtr

    sigma = jnp.asarray(stdevs)
    mu = jnp.where(
        mean_in_real_space,
        jnp.log(jnp.asarray(means)) - 0.5 * sigma * sigma,
        jnp.asarray(means),
    )
    z = (jnp.log(x)[..., None] - mu) / sigma
    return jnp.sum(jnp.asarray(weights) * ndtr(z), axis=-1)


def mixture_model_rates(
    quantiles: jnp.ndarray,  # [M] per-branch quantile in (0,1)
    weights: jnp.ndarray,    # [K] mixture weights (sum 1)
    means: jnp.ndarray,      # [K]
    stdevs: jnp.ndarray,     # [K]
    mean_in_real_space: bool = True,
    iters: int = 60,
) -> jnp.ndarray:
    """Mixture-of-lognormals relaxed clock: branch rate = mixture quantile
    at the branch's quantile parameter (ref: MixtureModelBranchRates.java —
    quantile-parameterised rates under a mixture of parametric
    distributions). The mixture quantile has no closed form; fixed-trip
    bisection in log space (60 iters ~ f64 precision) keeps it jittable.
    """
    sigma = jnp.asarray(stdevs)
    mu = jnp.where(
        mean_in_real_space,
        jnp.log(jnp.asarray(means)) - 0.5 * sigma * sigma,
        jnp.asarray(means),
    )
    # bracket: min/max component quantiles at extreme z = +-9
    lo0 = jnp.min(mu - 9.0 * sigma)
    hi0 = jnp.max(mu + 9.0 * sigma)
    lo = jnp.full_like(quantiles, lo0)
    hi = jnp.full_like(quantiles, hi0)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        c = lognormal_mixture_cdf(jnp.exp(mid), weights, means, stdevs,
                                  mean_in_real_space)
        go_up = c < quantiles
        lo = jnp.where(go_up, mid, lo)
        hi = jnp.where(go_up, hi, mid)
    return jnp.exp(0.5 * (lo + hi))


# ---------------------------------------------------------------------------
# Latent-state branch rates
# ---------------------------------------------------------------------------

def latent_state_branch_rates(rates: jnp.ndarray,
                              latent_proportions: jnp.ndarray) -> jnp.ndarray:
    """Effective rate when a branch spends a fraction of its time in a
    latent (non-evolving) state: rate * (1 - proportion) (ref:
    LatentStateBranchRateModel.java getBranchRate)."""
    return rates * (1.0 - latent_proportions)


def two_state_occupancy_log_density(
    branch_times: jnp.ndarray,        # [B] branch durations t
    latent_proportions: jnp.ndarray,  # [B] fraction of t spent latent, in [0,1)
    rate_to_latent,                   # alpha: active -> latent switch rate
    rate_from_latent,                 # beta: latent -> active switch rate
    condition_on_active_end: bool = True,
) -> jnp.ndarray:
    """Log density of the latent-occupancy fraction of a two-state CTMC
    over a branch (ref: LatentStateBranchRateModel.java /
    SericolaLatentStateBranchRateModel — occupancy-time distribution of a
    telegraph process). Closed form (Pedler 1971): with V = time in the
    latent state over [0, t], starting active,

      P(V = 0)            = exp(-alpha t)
      f(v, end active)    = e^{-a(t-v)-b v} sqrt(ab (t-v)/v) I1(2 sqrt(ab v (t-v)))
      f(v, end latent)    = a e^{-a(t-v)-b v} I0(2 sqrt(ab v (t-v)))

    (derived by conditioning on the number of switches; series sums to
    modified Bessel functions). BEAST conditions both branch endpoints on
    the active state, i.e. uses f(v, end active) normalised by
    P(X_t = active); density is w.r.t. v = proportion * t, so a
    Jacobian log(t) converts to proportion space.

    Proportions exactly 0 get the P(V=0) atom (conditioned as above).
    """
    from jax.scipy.special import i0e, i1e

    a = jnp.asarray(rate_to_latent)
    b = jnp.asarray(rate_from_latent)
    t = branch_times
    v = latent_proportions * t
    u = t - v
    x = 2.0 * jnp.sqrt(a * b * jnp.maximum(u, 0.0) * jnp.maximum(v, 1e-300))
    # i_k(x) = i_k_e(x) * exp(x): fold exp(x) into the exponent for stability
    log_common = -a * u - b * v + x
    log_f_active = log_common + 0.5 * (jnp.log(a * b) + jnp.log(jnp.maximum(u, 1e-300)) - jnp.log(jnp.maximum(v, 1e-300))) + jnp.log(jnp.maximum(i1e(x), 1e-300))
    log_f_latent = log_common + jnp.log(a) + jnp.log(jnp.maximum(i0e(x), 1e-300))
    if condition_on_active_end:
        # P(X_t = active | X_0 = active) for the 2-state chain
        s = a + b
        p_aa = b / s + (a / s) * jnp.exp(-s * t)
        log_f = log_f_active - jnp.log(p_aa)
        log_atom = -a * t - jnp.log(p_aa)
    else:
        log_f = jnp.logaddexp(log_f_active, log_f_latent)
        log_atom = -a * t
    # density w.r.t. proportion: f_V(v) * t
    lp = jnp.where(latent_proportions > 0.0, log_f + jnp.log(t), log_atom)
    return jnp.sum(lp)
