"""Coalescent tree priors.

Functional role of dr.evomodel.coalescent (CoalescentLikelihood.java:50,
99-124 — per-interval analytic integrals over an IntervalList;
TreeIntervals.java:50; demographic functions in
src/dr/evolution/coalescent/*) and the skygrid
(GMRFSkygridLikelihood.java:53).

Interval extraction is a device-side sort: node heights with lineage
deltas (+1 at tips, -1 at coalescences) sorted by height give lineage
counts by cumulative sum — no host-side IntervalList object, fully
jit/vmap/grad-safe for any topology.

General likelihood with demographic N(t) and intensity L(t) = int 1/N:
  logL = sum_coal -log N(t_i)  -  sum_intervals C(k,2) [L(t_end)-L(t_start)]
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from beast_mcmc_tpu.utils.accum import prefix_sum


def coalescent_intervals(heights: jnp.ndarray, n_taxa: int):
    """Sorted event times, lineage counts, and coalescent flags.

    Returns (times[M], lineages[M], is_coal[M]) where lineages[i] is the
    number of active lineages during the interval (times[i], times[i+1]).
    (ref: dr.evolution.coalescent.Intervals / TreeIntervals.java:50)
    """
    m = heights.shape[0]
    delta = jnp.where(jnp.arange(m) < n_taxa, 1, -1)
    # stable sort; tips (delta +1) must come before coalescences at equal
    # heights: sort by (height, delta descending) via composite key
    order = jnp.lexsort((-delta, heights))
    times = heights[order]
    deltas = delta[order]
    # log-depth prefix sum: jnp.cumsum lowers to a quadratic-window
    # reduce_window when vmapped inside a while-loop on TPU (v5e scoped
    # VMEM OOM at ~123 events x 8 chains); associative_scan stays O(M)
    lineages = jax.lax.associative_scan(jnp.add, deltas)
    is_coal = deltas < 0
    return times, lineages, is_coal


def coalescent_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    log_pop: Callable[[jnp.ndarray], jnp.ndarray],
    intensity: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Generic coalescent density for any parametric demographic
    (ref: CoalescentLikelihood.java:99-124 calculateLogLikelihood)."""
    times, lineages, is_coal = coalescent_intervals(heights, n_taxa)
    dt_intensity = intensity(times[1:]) - intensity(times[:-1])
    k = lineages[:-1]
    choose2 = (k * (k - 1) / 2.0).astype(heights.dtype)
    interval_term = -jnp.sum(choose2 * dt_intensity)
    event_term = -jnp.sum(jnp.where(is_coal, log_pop(times), 0.0))
    return interval_term + event_term


def constant_coalescent_loglik(heights, n_taxa: int, pop_size) -> jnp.ndarray:
    """Constant-size coalescent (ref: ConstantPopulation.java)."""
    pop = jnp.asarray(pop_size, heights.dtype)
    return coalescent_loglik(
        heights, n_taxa,
        log_pop=lambda t: jnp.broadcast_to(jnp.log(pop), t.shape),
        intensity=lambda t: t / pop,
    )


def exponential_growth_loglik(heights, n_taxa: int, pop_size, growth_rate) -> jnp.ndarray:
    """Exponential growth N(t) = N0 exp(-r t) backwards in time
    (ref: ExponentialGrowth.java getIntensity)."""
    n0 = jnp.asarray(pop_size, heights.dtype)
    r = jnp.asarray(growth_rate, heights.dtype)

    def log_pop(t):
        return jnp.log(n0) - r * t

    def intensity(t):
        # (exp(r t) - 1) / (r N0); r->0 limit t/N0, via expm1
        return jnp.where(
            jnp.abs(r) < 1e-12, t / n0, jnp.expm1(r * t) / (r * n0)
        )

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def logistic_growth_loglik(heights, n_taxa: int, pop_size, growth_rate, t50) -> jnp.ndarray:
    """Logistic growth (ref: LogisticGrowth.java:setTime50 —
    c = 1/(exp(r t50) - 2), which makes N(t50) exactly N0/2):
    N(t) = N0 (1+c)/(1 + c e^{rt}), intensity integral analytic."""
    n0 = jnp.asarray(pop_size, heights.dtype)
    r = jnp.asarray(growth_rate, heights.dtype)
    c = 1.0 / (jnp.expm1(r * jnp.asarray(t50, heights.dtype)) - 1.0)

    def log_pop(t):
        return jnp.log(n0) + jnp.log1p(c) - jnp.log1p(c * jnp.exp(r * t))

    def intensity(t):
        # int 1/N = [t + c/r (e^{rt}-1)] / (N0 (1+c))
        return (t + c * jnp.expm1(r * t) / r) / (n0 * (1.0 + c))

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def expansion_loglik(heights, n_taxa: int, pop_size, ancestral_prop, growth_rate) -> jnp.ndarray:
    """Expansion model: N(t) = N0 (p + (1-p) e^{-rt}) (ref: Expansion.java)."""
    n0 = jnp.asarray(pop_size, heights.dtype)
    p = jnp.asarray(ancestral_prop, heights.dtype)
    r = jnp.asarray(growth_rate, heights.dtype)

    def log_pop(t):
        return jnp.log(n0) + jnp.log(p + (1 - p) * jnp.exp(-r * t))

    def intensity(t):
        # int dt / (p + (1-p)e^{-rt}) = [t + (1/r) log(p e^{rt} + 1 - p)... ]
        # d/dt of (1/(p r)) log(p*exp(r t) + (1-p)) = exp(rt)/(p exp(rt)+1-p)
        #   = 1/(p + (1-p)exp(-rt)). Correct.
        return jnp.log(p * jnp.exp(r * t) + (1 - p)) / (p * r * n0)

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


# ---------------------------------------------------------------------------
# Skygrid: piecewise-constant log population on a fixed time grid + GMRF
# smoothing prior (ref: GMRFSkygridLikelihood.java:53,
# GMRFMultilocusSkyrideLikelihood.java:53)
# ---------------------------------------------------------------------------


def skygrid_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    log_pop_sizes: jnp.ndarray,  # gamma[K]: log N in each grid cell
    cut_points: jnp.ndarray,  # [K-1] interior grid boundaries (ascending)
) -> jnp.ndarray:
    """Coalescent density under a piecewise-constant N(t) on a fixed grid.

    Cell k covers [cut_{k-1}, cut_k) with cut_{-1}=0, cut_{K-1}=inf.
    Computed as an O(intervals x cells) masked overlap sum — static
    shapes, no data-dependent control flow.
    """
    dt_dtype = heights.dtype
    times, lineages, is_coal = coalescent_intervals(heights, n_taxa)
    k_cells = log_pop_sizes.shape[0]
    lo = jnp.concatenate([jnp.zeros((1,), dt_dtype), cut_points])  # [K]
    hi = jnp.concatenate([cut_points, jnp.full((1,), jnp.inf, dt_dtype)])

    # interval x cell overlap
    t0 = times[:-1][:, None]
    t1 = times[1:][:, None]
    overlap = jnp.clip(jnp.minimum(t1, hi[None, :]) - jnp.maximum(t0, lo[None, :]), 0.0)
    k = lineages[:-1]
    choose2 = (k * (k - 1) / 2.0).astype(dt_dtype)
    interval_term = -jnp.sum(
        choose2[:, None] * overlap * jnp.exp(-log_pop_sizes)[None, :]
    )
    # event terms: -gamma(cell containing each coalescent time)
    # an event exactly AT a grid point belongs to the cell BELOW it (ref:
    # SingleTreeGriddedNodesTimeline merged-timeline convention — upper
    # endpoint inclusive), hence side="left". NOTE: this is the PARITY
    # TARGET; the classic GMRFSkygridLikelihood loop
    # (`while (nextTime < gridPoints[idx])`) puts an exact grid-point hit
    # in the cell ABOVE — old-skygrid runs can differ on such hits. The
    # Gibbs block update's sufficient statistics (inference/gibbs.py
    # _suff_stats) deliberately use the same side="left" convention.
    cell_idx = jnp.searchsorted(cut_points, times, side="left")
    event_term = -jnp.sum(jnp.where(is_coal, log_pop_sizes[cell_idx], 0.0))
    return interval_term + event_term


def gmrf_log_prior(log_pop_sizes: jnp.ndarray, precision) -> jnp.ndarray:
    """First-order Gaussian Markov random field smoothing prior on the
    skygrid log-populations (ref: GMRFSkyrideLikelihood
    calculateLogFieldLikelihood — RW1 increment penalty):
      (K-1)/2 log(tau/2pi) - tau/2 * sum (g_{k+1}-g_k)^2
    """
    tau = jnp.asarray(precision, log_pop_sizes.dtype)
    diffs = jnp.diff(log_pop_sizes)
    k1 = diffs.shape[0]
    return 0.5 * k1 * (jnp.log(tau) - jnp.log(2 * jnp.pi)) - 0.5 * tau * jnp.sum(
        diffs * diffs
    )


# ---------------------------------------------------------------------------
# Bayesian skyline: piecewise-constant N over GROUPS of coalescent intervals
# (ref: dr.evomodel.coalescent.BayesianSkylineLikelihood — group boundaries
# at coalescent events, popSizes[K] + groupSizes[K] parameters)
# ---------------------------------------------------------------------------


def bayesian_skyline_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    pop_sizes: jnp.ndarray,  # [K]
    group_sizes: jnp.ndarray,  # int[K], sums to n_taxa - 1
) -> jnp.ndarray:
    """Piecewise-constant Bayesian skyline coalescent density.

    Group k spans coalescent events [cum_{k-1}, cum_k); the population
    size governing an inter-event interval is that of the group containing
    the NEXT coalescent event (the reference's convention: N changes at
    coalescent events).
    """
    dt = heights.dtype
    times, lineages, is_coal = coalescent_intervals(heights, n_taxa)
    # index of the next coalescent event for each interval start
    coal_before = prefix_sum(is_coal.astype(jnp.int32))  # events at <= times[i]
    cum_groups = prefix_sum(group_sizes)
    # group of coalescent event j (0-based): first k with cum_groups[k] > j
    def group_of(j):
        return jnp.searchsorted(cum_groups, j, side="right").astype(jnp.int32)

    # interval (times[i], times[i+1]) -> next event index = coal_before[i]
    next_event = jnp.minimum(coal_before[:-1], n_taxa - 2)
    n_interval = pop_sizes[group_of(next_event)]
    k = lineages[:-1]
    choose2 = (k * (k - 1) / 2.0).astype(dt)
    interval_term = -jnp.sum(choose2 * jnp.diff(times) / n_interval)
    # event term: -log N(group of the event itself)
    event_idx = jnp.maximum(coal_before - 1, 0)
    event_term = -jnp.sum(
        jnp.where(is_coal, jnp.log(pop_sizes[group_of(event_idx)]), 0.0)
    )
    return interval_term + event_term


# ---------------------------------------------------------------------------
# SIR epidemic demographic (ref: dr.evomodel.epidemiology.SIRModel — ODE
# solved numerically; Volz-style effective population size
# Ne(t) = I(t) / (2 beta S(t) / N); coalescent intensity by trapezoid,
# mirroring the reference's numerical getIntensity)
# ---------------------------------------------------------------------------


def sir_trajectories(
    r0, recovery_rate, i0_prop, t_grid: jnp.ndarray
):
    """Integrate the (backward-time) SIR ODE on a fixed grid with RK4.

    Forward-time dynamics: dS/dt = -beta S I, dI/dt = beta S I - gamma I,
    with beta = R0 * gamma (per-capita, S/I as proportions). The epidemic
    peaks at t=0 boundary condition S(0)=1-i0, I(0)=i0, integrated
    BACKWARD in time (toward the epidemic's start), matching the
    coalescent's time-into-the-past axis.
    Returns (S[T], I[T]) on t_grid.
    """
    dt_ = t_grid.dtype
    gamma = jnp.asarray(recovery_rate, dt_)
    beta = jnp.asarray(r0, dt_) * gamma

    def deriv(y):
        s, i = y
        # backward time: negate the forward derivatives
        ds = beta * s * i
        di = -(beta * s * i - gamma * i)
        return jnp.stack([ds, di])

    def rk4_step(y, h):
        k1 = deriv(y)
        k2 = deriv(y + 0.5 * h * k1)
        k3 = deriv(y + 0.5 * h * k2)
        k4 = deriv(y + h * k3)
        return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    y0 = jnp.stack([1.0 - jnp.asarray(i0_prop, dt_), jnp.asarray(i0_prop, dt_)])

    def scan_step(y, h):
        y_new = rk4_step(y, h)
        y_new = jnp.maximum(y_new, 1e-12)
        return y_new, y_new

    hs = jnp.diff(t_grid)
    _, ys = jax.lax.scan(scan_step, y0, hs)
    s = jnp.concatenate([y0[0:1], ys[:, 0]])
    i = jnp.concatenate([y0[1:2], ys[:, 1]])
    return s, i


def sir_coalescent_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    r0,
    recovery_rate,
    i0_prop,
    n_total,
    t_max: float,
    n_grid: int = 256,
) -> jnp.ndarray:
    """Coalescent density under the SIR effective population size
    Ne(t) = N I(t) / (2 beta S(t)) (Volz 2009; the reference's SIRModel
    demographic role), with trapezoid intensity on a fixed grid."""
    dt = heights.dtype
    t_grid = jnp.linspace(0.0, t_max, n_grid).astype(dt)
    s, i = sir_trajectories(r0, recovery_rate, i0_prop, t_grid)
    gamma = jnp.asarray(recovery_rate, dt)
    beta = jnp.asarray(r0, dt) * gamma
    ne = jnp.asarray(n_total, dt) * i / (2.0 * beta * s)
    inv_ne = 1.0 / ne
    # trapezoid cumulative intensity on the grid
    cum = jnp.concatenate([
        jnp.zeros((1,), dt),
        prefix_sum(0.5 * (inv_ne[1:] + inv_ne[:-1]) * jnp.diff(t_grid)),
    ])

    def log_pop(t):
        ti = jnp.clip(t, 0.0, t_max)
        return jnp.interp(ti, t_grid, jnp.log(ne))

    def intensity(t):
        ti = jnp.clip(t, 0.0, t_max)
        base = jnp.interp(ti, t_grid, cum)
        # beyond the grid: extrapolate with the last Ne
        over = jnp.maximum(t - t_max, 0.0) * inv_ne[-1]
        return base + over

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def multilocus_skygrid_loglik(
    heights_list,   # sequence of [M_l] height arrays, one per locus tree
    n_taxa_list,    # sequence of taxon counts
    log_pop_sizes: jnp.ndarray,   # gamma[K] shared across loci
    cut_points: jnp.ndarray,      # [K-1] shared grid
    ploidy_factors=None,          # [L] per-locus population-size scaling
) -> jnp.ndarray:
    """Multilocus skygrid: several locus trees share one piecewise-constant
    N(t) grid; each locus may scale N by a ploidy factor (ref:
    src/dr/evomodel/coalescent/GMRFMultilocusSkyrideLikelihood.java:53 —
    per-locus interval sums against shared gridPoints, populationFactors).
    Per-locus effective log N = gamma + log(ploidy); total = sum of locus
    coalescent densities (the GMRF smoothing prior is gmrf_log_prior,
    applied once)."""
    total = jnp.asarray(0.0, log_pop_sizes.dtype)
    n_loci = len(heights_list)
    if ploidy_factors is None:
        ploidy_factors = [1.0] * n_loci
    for heights, n_taxa, ploidy in zip(heights_list, n_taxa_list,
                                       ploidy_factors):
        gamma_eff = log_pop_sizes + jnp.log(
            jnp.asarray(ploidy, log_pop_sizes.dtype)
        )
        total = total + skygrid_loglik(heights, n_taxa, gamma_eff, cut_points)
    return total


# ---------------------------------------------------------------------------
# GMRF skyride (time-aware) — ref: GMRFSkyrideLikelihood.java:57
# ---------------------------------------------------------------------------


def gmrf_skyride_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    log_pops: jnp.ndarray,  # [n_taxa - 1] one field value per coal event
) -> jnp.ndarray:
    """Skyride coalescent density: piecewise-log-constant N(t) with ONE
    field element per coalescent interval — the population size governing
    an inter-event interval is that of the next coalescent event looking
    back in time (ref: GMRFSkyrideLikelihood.java:57
    calculateLogCoalescentLikelihood: per-interval
    -gamma_k - C(k,2) dt exp(-gamma_k), the event term only at
    coalescences)."""
    dt = heights.dtype
    times, lineages, is_coal = coalescent_intervals(heights, n_taxa)
    coal_before = prefix_sum(is_coal.astype(jnp.int32))
    next_event = jnp.minimum(coal_before[:-1], n_taxa - 2)
    gamma = log_pops[next_event]
    k = lineages[:-1]
    choose2 = (k * (k - 1) / 2.0).astype(dt)
    interval_term = -jnp.sum(choose2 * jnp.diff(times) * jnp.exp(-gamma))
    event_idx = jnp.maximum(coal_before - 1, 0)
    event_term = -jnp.sum(jnp.where(is_coal, log_pops[event_idx], 0.0))
    return interval_term + event_term


def skyride_coalescent_midpoints(heights: jnp.ndarray, n_taxa: int):
    """Coalescent event times [n_taxa-1], sorted ascending — the knots of
    the skyride field (used for the time-aware GMRF weights)."""
    internal = jnp.sort(heights[n_taxa:])
    return internal


def gmrf_skyride_time_aware_prior(
    heights: jnp.ndarray,
    n_taxa: int,
    log_pops: jnp.ndarray,
    precision,
) -> jnp.ndarray:
    """Time-aware GMRF smoothing prior on the skyride field (ref:
    GMRFSkyrideLikelihood.java setupGMRFWeights — off-diagonal weights
    2/(delta_i + delta_{i+1}) where delta_i is the i-th coalescent
    interval duration):
      log p = (n-1)/2 log tau - tau/2 * sum_i (g_{i+1}-g_i)^2 * w_i
    up to the field's improper flat level (the reference uses the
    degenerate GMRF with rank n-2)."""
    dt = heights.dtype
    tau = jnp.asarray(precision, dt)
    knots = skyride_coalescent_midpoints(heights, n_taxa)
    t0 = jnp.max(heights[:n_taxa] * 0.0)  # field starts at first event
    starts = jnp.concatenate([t0[None], knots[:-1]])
    delta = knots - starts  # coalescent interval durations
    w = 2.0 / (delta[:-1] + delta[1:] + 1e-300)
    diff = log_pops[1:] - log_pops[:-1]
    quad = jnp.sum(diff * diff * w)
    n_field = log_pops.shape[0]
    return 0.5 * (n_field - 1) * jnp.log(tau) - 0.5 * tau * quad


def gmrf_skyride_uniform_prior(log_pops: jnp.ndarray, precision) -> jnp.ndarray:
    """Uniform-weight (non-time-aware) GMRF variant (timeAwareSmoothing
    off): first-difference penalty with unit weights."""
    dt = log_pops.dtype
    tau = jnp.asarray(precision, dt)
    diff = log_pops[1:] - log_pops[:-1]
    n_field = log_pops.shape[0]
    return 0.5 * (n_field - 1) * jnp.log(tau) - 0.5 * tau * jnp.sum(diff * diff)


def piecewise_exponential_loglik(
    heights,
    n_taxa: int,
    thetas: jnp.ndarray,  # [K] epoch-start sizes, or [1] (N0 only)
    lambdas: jnp.ndarray,  # [1] shared rate, or [K] per-epoch rates
    widths: jnp.ndarray,  # [K-1] epoch durations (last epoch infinite)
) -> jnp.ndarray:
    """Piecewise-exponential demographic (ref:
    PiecewiseExponentialPopulation.java:83-118 getDemographic: with a
    theta vector, epoch e restarts at N=theta_e and decays at the shared
    lambda within the epoch; with a single theta, the rates chain)."""
    dt = heights.dtype
    thetas = jnp.atleast_1d(jnp.asarray(thetas, dt))
    lambdas = jnp.atleast_1d(jnp.asarray(lambdas, dt))
    widths = jnp.asarray(widths, dt)
    k = max(thetas.shape[0], lambdas.shape[0])
    starts = jnp.concatenate([jnp.zeros(1, dt), prefix_sum(widths)])
    lam = jnp.broadcast_to(lambdas, (k,))
    if thetas.shape[0] == 1:
        # chained: N at epoch start = N0 * exp(-sum lam_j w_j)
        decay = jnp.concatenate([jnp.zeros(1, dt),
                                 prefix_sum(lam[:-1] * widths)])
        th = thetas[0] * jnp.exp(-decay)
    else:
        th = jnp.broadcast_to(thetas, (k,))

    def safe_expm1_over(lam_, x):
        return jnp.where(jnp.abs(lam_) < 1e-12, x, jnp.expm1(lam_ * x) / lam_)

    # full-epoch intensities for epochs 0..K-2
    full = safe_expm1_over(lam[:-1], widths) / th[:-1]
    cum_full = jnp.concatenate([jnp.zeros(1, dt), prefix_sum(full)])

    def epoch_of(t):
        return jnp.clip(
            jnp.searchsorted(starts[1:], t, side="right"), 0, k - 1
        )

    def log_pop(t):
        e = epoch_of(t)
        return jnp.log(th[e]) - lam[e] * (t - starts[e])

    def intensity(t):
        e = epoch_of(t)
        return cum_full[e] + safe_expm1_over(lam[e], t - starts[e]) / th[e]

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def cataclysm_loglik(
    heights, n_taxa: int, pop_size, growth_rate, spike_factor, cat_time
) -> jnp.ndarray:
    """Cataclysmic demographic (ref: CataclysmicDemographic.java:
    getDemographic/getIntensity): backwards in time the population GROWS
    at decline-rate d = log(spikeFactor)/catTime up to the cataclysm,
    then declines at growth_rate; spike height = N0 * spikeFactor."""
    dt = heights.dtype
    n0 = jnp.asarray(pop_size, dt)
    r = jnp.asarray(growth_rate, dt)
    tc = jnp.asarray(cat_time, dt)
    d = jnp.log(jnp.asarray(spike_factor, dt)) / tc
    spike = n0 * jnp.exp(tc * d)
    i_spike = (jnp.exp(-d * tc) - 1.0) / n0 / (-d)

    def log_pop(t):
        before = jnp.log(n0) + t * d
        after = jnp.log(spike) - (t - tc) * r
        return jnp.where(t < tc, before, after)

    def intensity(t):
        before = (jnp.exp(-d * t) - 1.0) / n0 / (-d)
        u = jnp.maximum(t - tc, 0.0)
        after = i_spike + jnp.where(
            jnp.abs(r) < 1e-12, u / spike, jnp.expm1(r * u) / (spike * r)
        )
        return jnp.where(t < tc, before, after)

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def bayesian_skyline_linear_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    pop_sizes: jnp.ndarray,  # [K+1] sizes at group boundaries
    group_sizes: jnp.ndarray,  # int[K]
) -> jnp.ndarray:
    """Piecewise-LINEAR Bayesian skyline (ref:
    BayesianSkylineLikelihood.java LINEAR_TYPE:87,187-210): group k spans
    the coalescent events (cum_{k-1}, cum_k]; N(t) interpolates linearly
    from pop_sizes[k] at the group's start time to pop_sizes[k+1] at its
    end time (group boundaries are coalescent events; group 0 starts at
    the first sampling time). Per-interval intensity for linear N:
    dt * log(N_end/N_start) / (N_end - N_start)."""
    dt_ = heights.dtype
    times, lineages, is_coal = coalescent_intervals(heights, n_taxa)
    n_events = n_taxa - 1
    coal_times = jnp.sort(heights[n_taxa:])
    cum = prefix_sum(group_sizes)  # [K]
    k_groups = group_sizes.shape[0]
    t0 = jnp.min(heights[:n_taxa])
    # group boundary times: starts[k] (k=0 -> t0), ends[k] = coal time of
    # event cum[k]-1
    ends = coal_times[jnp.clip(cum - 1, 0, n_events - 1)]
    starts = jnp.concatenate([jnp.asarray([t0], dt_), ends[:-1]])

    def n_of(t):
        # group of time t: first k with ends[k] >= t
        g = jnp.clip(jnp.searchsorted(ends, t, side="left"), 0, k_groups - 1)
        span = jnp.maximum(ends[g] - starts[g], 1e-300)
        frac = jnp.clip((t - starts[g]) / span, 0.0, 1.0)
        return pop_sizes[g] * (1.0 - frac) + pop_sizes[g + 1] * frac

    ta = times[:-1]
    tb = times[1:]
    ns = n_of(ta)
    ne = n_of(tb)
    d = tb - ta
    # intensity over the interval; stable when ns ~ ne
    diff = ne - ns
    near = jnp.abs(diff) < 1e-9 * jnp.maximum(ns, 1e-300)
    safe_diff = jnp.where(near, 1.0, diff)  # avoid where-NaN grads
    intensity = jnp.where(
        near,
        d / ns,
        d * (jnp.log(jnp.maximum(ne, 1e-300))
             - jnp.log(jnp.maximum(ns, 1e-300))) / safe_diff,
    )
    k = lineages[:-1]
    choose2 = (k * (k - 1) / 2.0).astype(dt_)
    interval_term = -jnp.sum(choose2 * intensity)
    event_term = -jnp.sum(
        jnp.where(is_coal, jnp.log(jnp.maximum(n_of(times), 1e-300)), 0.0)
    )
    return interval_term + event_term


# ---------------------------------------------------------------------------
# extended Bayesian skyline (EBSP) — ref: VariableDemographicModel.java /
# VDdemographicFunction (dr.evomodel.coalescent); multilocus
# indicator-selected change points over the merged coalescent event grid
# ---------------------------------------------------------------------------


def _ebsp_pop_at(t, knot_times, values, active):
    """Ne(t) for the EBSP field: linear interpolation between ACTIVE
    knots (active[0] is always on); constant beyond the last active knot.
    Vectorized over t with dynamic active sets (jit-safe)."""
    j = jnp.arange(knot_times.shape[0])
    # prev_active[k] = last active index <= k ; next_active[k] = first
    # active index >= k (or last index when none)
    prev_active = jax.lax.associative_scan(
        jnp.maximum, jnp.where(active, j, -1)
    )
    next_active = jax.lax.associative_scan(
        jnp.minimum, jnp.where(active, j, knot_times.shape[0]), reverse=True
    )
    idx = jnp.clip(
        jnp.searchsorted(knot_times, t, side="right") - 1,
        0, knot_times.shape[0] - 1,
    )
    lo = jnp.maximum(prev_active[idx], 0)
    hi_raw = next_active[jnp.minimum(idx + 1, knot_times.shape[0] - 1)]
    has_hi = (hi_raw < knot_times.shape[0]) & (idx + 1 < knot_times.shape[0])
    hi = jnp.where(has_hi, jnp.minimum(hi_raw, knot_times.shape[0] - 1), lo)
    t_lo = knot_times[lo]
    t_hi = knot_times[hi]
    span_raw = t_hi - t_lo
    degenerate = (hi == lo) | (span_raw <= 0)
    safe_span = jnp.where(degenerate, 1.0, span_raw)
    frac = jnp.clip((t - t_lo) / safe_span, 0.0, 1.0)
    frac = jnp.where(degenerate, 0.0, frac)
    return values[lo] * (1.0 - frac) + values[hi] * frac


def ebsp_knots(all_coal_times: jnp.ndarray, use_midpoints: bool = True):
    """Knot times of the EBSP field over the merged, sorted coalescent
    event times of all loci (ref: VDdemographicFunction — with
    useMidpoints the change points sit between events)."""
    e = jnp.sort(all_coal_times)
    if use_midpoints:
        mids = 0.5 * (e[:-1] + e[1:])
        return jnp.concatenate([jnp.zeros((1,), e.dtype), mids])
    return jnp.concatenate([jnp.zeros((1,), e.dtype), e[:-1]])


def ebsp_coalescent_loglik(
    trees_heights,  # list of [M_i] height arrays
    trees_n_taxa,  # list of ints
    ploidies,  # list of floats
    pop_values: jnp.ndarray,  # [K] sizes at knots
    indicators: jnp.ndarray,  # [K-1] 0/1 change-point selectors
    use_midpoints: bool = True,
) -> jnp.ndarray:
    """Sum over loci of the coalescent density under the shared
    indicator-selected piecewise-linear Ne(t) (scaled by each locus'
    ploidy). Each locus integrates over its own inter-event intervals
    split at every knot time, where Ne is exactly linear (the
    log-ratio closed form applies)."""
    all_coal = jnp.concatenate(
        [h[n:] for h, n in zip(trees_heights, trees_n_taxa)]
    )
    dt = all_coal.dtype
    knots = ebsp_knots(all_coal, use_midpoints)
    active = jnp.concatenate(
        [jnp.ones((1,), bool), indicators > 0.5]
    )

    def pop(t):
        return _ebsp_pop_at(t, knots, pop_values, active)

    total = jnp.asarray(0.0, dt)
    for heights, n_taxa, ploidy in zip(trees_heights, trees_n_taxa,
                                       ploidies):
        times, lineages, is_coal = coalescent_intervals(heights, n_taxa)
        # subgrid: this locus' event times + every knot, sorted
        grid = jnp.sort(jnp.concatenate([times, knots]))
        k_at = lineages[
            jnp.clip(jnp.searchsorted(times, grid[:-1], side="right") - 1,
                     0, times.shape[0] - 1)
        ]
        # clamp outside the locus' observation window
        inside = (grid[:-1] >= times[0]) & (grid[1:] <= times[-1])
        ta, tb = grid[:-1], grid[1:]
        ns = ploidy * pop(ta)
        ne = ploidy * pop(tb)
        d = tb - ta
        diff = ne - ns
        near = jnp.abs(diff) < 1e-9 * jnp.maximum(ns, 1e-300)
        safe_diff = jnp.where(near, 1.0, diff)  # avoid where-NaN grads
        lin = d * (jnp.log(jnp.maximum(ne, 1e-300))
                   - jnp.log(jnp.maximum(ns, 1e-300))) / safe_diff
        intensity = jnp.where(near, d / jnp.maximum(ns, 1e-300), lin)
        choose2 = (k_at * (k_at - 1) / 2.0).astype(dt)
        total = total - jnp.sum(
            jnp.where(inside, choose2 * intensity, 0.0)
        )
        total = total - jnp.sum(
            jnp.where(is_coal, jnp.log(ploidy * pop(times)), 0.0)
        )
    return total


def grouped_skyride_loglik(
    heights, n_taxa: int, log_pops: jnp.ndarray, group_sizes: jnp.ndarray
) -> jnp.ndarray:
    """Grouped skyride coalescent density: log-space field with one value
    per GROUP of coalescent events (ref: GMRFSkyrideLikelihood.java with
    groupSizes — the BSP group mapping over an exp-field)."""
    return bayesian_skyline_loglik(
        heights, n_taxa, jnp.exp(log_pops), group_sizes
    )


def grouped_skyride_gmrf_prior(
    heights, n_taxa: int, log_pops: jnp.ndarray, group_sizes: jnp.ndarray,
    precision, covariates=None, beta=None, lam=1.0,
) -> jnp.ndarray:
    """GMRF smoothing prior over the grouped field with optional fixed
    effects (ref: GMRFSkyrideLikelihood.java setupGMRFWeights +
    skygridWithCovariates of Gill et al.): the penalized residual is
    gamma - Z beta; off-diagonal weights 2/(delta_i + delta_{i+1}) from
    the group interval durations, mixed with uniform weights by lambda."""
    dt = heights.dtype
    tau = jnp.asarray(precision, dt)
    resid = log_pops
    if covariates is not None:
        resid = resid - covariates @ beta
    coal = jnp.sort(heights[n_taxa:])
    cum = prefix_sum(group_sizes)
    n_events = n_taxa - 1
    ends = coal[jnp.clip(cum - 1, 0, n_events - 1)]
    t0 = jnp.min(heights[:n_taxa])
    starts = jnp.concatenate([jnp.asarray([t0], dt), ends[:-1]])
    delta = jnp.maximum(ends - starts, 1e-300)
    w_time = 2.0 / (delta[:-1] + delta[1:])
    lam = jnp.asarray(lam, dt)
    w = lam * w_time + (1.0 - lam)
    diff = resid[1:] - resid[:-1]
    n_field = log_pops.shape[0]
    return 0.5 * (n_field - 1) * jnp.log(tau) - 0.5 * tau * jnp.sum(
        diff * diff * w
    )


# ---------------------------------------------------------------------------
# Smooth skygrid: globally sigmoid-smoothed lineage counts and population
# trajectory (ref: dr.evomodel.coalescent.smooth.SmoothSkygridLikelihood
# .java:427-459 + GlobalSigmoidSmoothFunction.java:32-35). The reference
# evaluates the intensity integral in closed form via sigmoid partial-
# fraction identities (single/double/triple product integrations); here the
# same smooth integrand is integrated by Gauss-Legendre quadrature on
# panels split at every event/grid time — one [panels*nodes, events]
# einsum (MXU-shaped), exact to quadrature tolerance on the smooth
# integrand, and jax.grad replaces the hand-derived gradient stacks
# (SmoothSkygridGradient.java).
# ---------------------------------------------------------------------------

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(8)


def smooth_skygrid_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    log_pop_sizes: jnp.ndarray,  # gamma[K]: log N per grid cell
    cut_points: jnp.ndarray,     # [K-1] interior grid boundaries
    smooth_rate,                 # sigmoid steepness (ref smoothRate)
) -> jnp.ndarray:
    """Smooth-skygrid coalescent log density.

    Lineage count and inverse population size are sums of global
    sigmoids sigma(r (t - step)) (GlobalSigmoidSmoothFunction.getSmoothValue):
      k(t)    = sum_tips sigma(r(t-h_tip)) - sum_internal sigma(r(t-h_int))
      invN(t) = e^{-g_0} + sum_k (e^{-g_{k+1}} - e^{-g_k}) sigma(r(t-x_k))
    logL = sum_internal log invN(h_i) - int_0^root k(k-1)/2 invN dt
    (SmoothSkygridLikelihood.calculateLogLikelihood: the
    logPopulationSizeInverse event term plus the single/double/triple
    integration sums, which are exactly this integral expanded).
    """
    fdt = heights.dtype
    m = heights.shape[0]
    r = jnp.asarray(smooth_rate, fdt)
    root_h = jnp.max(heights)
    tip_h = heights[:n_taxa]
    int_h = heights[n_taxa:]
    inv_pops = jnp.exp(-log_pop_sizes)
    steps = inv_pops[1:] - inv_pops[:-1]

    def k_smooth(t):  # t: [...]; smooth lineage count
        up = jax.nn.sigmoid(r * (t[..., None] - tip_h))
        down = jax.nn.sigmoid(r * (t[..., None] - int_h))
        return jnp.sum(up, -1) - jnp.sum(down, -1)

    def inv_n(t):
        s = jax.nn.sigmoid(r * (t[..., None] - cut_points))
        return inv_pops[0] + jnp.sum(steps * s, -1)

    # panels at every height + grid point, clipped to [0, root]
    breaks = jnp.sort(jnp.concatenate([
        jnp.zeros((1,), fdt),
        jnp.clip(heights, 0.0, root_h),
        jnp.clip(cut_points.astype(fdt), 0.0, root_h),
    ]))
    lo, hi = breaks[:-1], breaks[1:]
    half = 0.5 * (hi - lo)
    mid = 0.5 * (hi + lo)
    nodes = jnp.asarray(_GL_NODES, fdt)
    wts = jnp.asarray(_GL_WEIGHTS, fdt)
    t_eval = mid[:, None] + half[:, None] * nodes[None, :]  # [P, Q]
    k = k_smooth(t_eval)
    integrand = 0.5 * k * (k - 1.0) * inv_n(t_eval)
    integral = jnp.sum(half[:, None] * wts[None, :] * integrand)

    event_term = jnp.sum(jnp.log(inv_n(int_h)))
    return event_term - integral


# ---------------------------------------------------------------------------
# Round-2 parametric demographic breadth (ref:
# src/dr/evolution/coalescent/*.java — per-family citations below). Two
# generic engines: closed-form interval integrals where the reference has
# them, and Gauss-Legendre panel quadrature where the reference itself
# integrates numerically (ExponentialLogistic.getIntegral).
# ---------------------------------------------------------------------------


def coalescent_loglik_integral(
    heights: jnp.ndarray,
    n_taxa: int,
    log_pop: Callable[[jnp.ndarray], jnp.ndarray],
    integral: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Generic coalescent density from per-interval integrals
    integral(t0, t1) = int_{t0}^{t1} dt/N(t) — the engine for
    demographics whose intensity-from-zero diverges (ref:
    LinearGrowth.java getIntegral / DemographicFunction.getIntegral)."""
    times, lineages, is_coal = coalescent_intervals(heights, n_taxa)
    dt_intensity = integral(times[:-1], times[1:])
    k = lineages[:-1]
    choose2 = (k * (k - 1) / 2.0).astype(heights.dtype)
    # k=1 intervals contribute nothing even when the demographic's
    # integral diverges there (e.g. linear growth N(0)=0 below the
    # youngest tip) — mask before multiplying to avoid 0 * inf = NaN
    interval_term = -jnp.sum(jnp.where(choose2 > 0,
                                       choose2 * dt_intensity, 0.0))
    event_term = -jnp.sum(jnp.where(is_coal, log_pop(times), 0.0))
    return interval_term + event_term


def quad_interval_integral(log_pop: Callable, quad: int = 16) -> Callable:
    """Build integral(t0, t1) ≈ int 1/N dt by Gauss-Legendre quadrature —
    the vectorized analog of the reference's trapezoid fallback
    (ExponentialLogistic.java getIntegral 'numerically integrate')."""
    nodes, wts = np.polynomial.legendre.leggauss(quad)

    def integral(t0, t1):
        fdt = jnp.result_type(t0)
        half = 0.5 * (t1 - t0)
        mid = 0.5 * (t1 + t0)
        t = mid[..., None] + half[..., None] * jnp.asarray(nodes, fdt)
        inv_n = jnp.exp(-log_pop(t))
        return half * jnp.sum(jnp.asarray(wts, fdt) * inv_n, axis=-1)

    return integral


def const_exponential_loglik(heights, n_taxa: int, n0, n1, growth_rate):
    """Exponential decline to an ancestral constant N1 (ref:
    ConstExponential.java:getDemographic — N0 e^{-rt} until
    T = log(N0/N1)/r, then N1)."""
    fdt = heights.dtype
    n0 = jnp.asarray(n0, fdt)
    n1 = jnp.asarray(n1, fdt)
    r = jnp.asarray(growth_rate, fdt)
    t_switch = jnp.log(n0 / n1) / r

    def log_pop(t):
        return jnp.where(t < t_switch, jnp.log(n0) - r * t, jnp.log(n1))

    def intensity(t):
        exp_part = jnp.expm1(r * jnp.minimum(t, t_switch)) / (r * n0)
        const_part = jnp.maximum(t - t_switch, 0.0) / n1
        return exp_part + const_part

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def exp_constant_loglik(heights, n_taxa: int, n0, growth_rate, change_time):
    """Recent plateau then exponential growth (ref: ExpConstant.java:
    getDemographic — N0 e^{-r T} for t < T, N0 e^{-rt} after)."""
    fdt = heights.dtype
    n0 = jnp.asarray(n0, fdt)
    r = jnp.asarray(growth_rate, fdt)
    tc = jnp.asarray(change_time, fdt)
    plateau = n0 * jnp.exp(-r * tc)

    def log_pop(t):
        return jnp.where(t < tc, jnp.log(plateau), jnp.log(n0) - r * t)

    def intensity(t):
        flat = jnp.minimum(t, tc) / plateau
        te = jnp.maximum(t, tc)
        grow = (jnp.expm1(r * te) - jnp.expm1(r * tc)) / (r * n0)
        return flat + grow

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def const_logistic_loglik(heights, n_taxa: int, n0, n1, growth_rate, shape):
    """Logistic growth from an ancestral constant N1 (ref:
    ConstLogistic.java:getDemographic —
    N(t) = N1 + (N0-N1)(1+c) e^{-rt} / (c + e^{-rt}); closed intensity
    per its getIntensity partial fractions)."""
    fdt = heights.dtype
    n0 = jnp.asarray(n0, fdt)
    n1 = jnp.asarray(n1, fdt)
    r = jnp.asarray(growth_rate, fdt)
    c = jnp.asarray(shape, fdt)

    def log_pop(t):
        e = jnp.exp(-r * t)
        return jnp.log(n1 + (n0 - n1) * (1.0 + c) * e / (c + e))

    aa = n1 + (n0 - n1) * (1.0 + c)
    bb = n1 * c

    def intensity(t):
        e = jnp.exp(-r * t)
        v1 = jnp.log(bb + aa * e) / (-aa * r)
        v2 = c * jnp.log(aa + bb / e) / (bb * r)
        return v1 + v2

    # intensity above is an antiderivative (unnormalized at 0): difference
    return coalescent_loglik(
        heights, n_taxa, log_pop,
        intensity=lambda t: intensity(t) - intensity(jnp.zeros_like(t)))


def linear_growth_loglik(heights, n_taxa: int, slope):
    """N(t) = slope * t growing into the past from zero (ref:
    LinearGrowth.java — negative-time convention flipped to forward
    heights; getIntegral = log(t1/t0)/N0). Requires every event time > 0."""
    fdt = heights.dtype
    n0 = jnp.asarray(slope, fdt)

    def log_pop(t):
        return jnp.log(n0) + jnp.log(t)

    def integral(t0, t1):
        return jnp.where(t1 > t0, (jnp.log(t1) - jnp.log(t0)) / n0, 0.0)

    return coalescent_loglik_integral(heights, n_taxa, log_pop, integral)


def power_law_growth_loglik(heights, n_taxa: int, n0, power):
    """N(t) = N0 t^r, r > 1 (ref: PowerLawGrowth.java:getIntegral —
    (t0^{1-r} - t1^{1-r}) ... flipped to forward heights)."""
    fdt = heights.dtype
    n0 = jnp.asarray(n0, fdt)
    r = jnp.asarray(power, fdt)

    def log_pop(t):
        return jnp.log(n0) + r * jnp.log(t)

    def integral(t0, t1):
        return jnp.where(
            t1 > t0,
            (jnp.power(t0, 1.0 - r) - jnp.power(t1, 1.0 - r))
            / (n0 * (r - 1.0)),
            0.0)

    return coalescent_loglik_integral(heights, n_taxa, log_pop, integral)


def flexible_growth_loglik(heights, n_taxa: int, n0, k, power):
    """N(t) = N0 K t^r / (1 + K t^{r-1}) (ref: FlexibleGrowth.java:
    getDemographic/getIntegral, forward-height convention)."""
    fdt = heights.dtype
    n0 = jnp.asarray(n0, fdt)
    kk = jnp.asarray(k, fdt)
    r = jnp.asarray(power, fdt)

    def log_pop(t):
        return (jnp.log(n0) + jnp.log(kk) + r * jnp.log(t)
                - jnp.log1p(kk * jnp.power(t, r - 1.0)))

    def integral(t0, t1):
        term = (jnp.power(t0, 1.0 - r) - jnp.power(t1, 1.0 - r)) / (
            (r - 1.0) * kk)
        return jnp.where(
            t1 > t0, (term + jnp.log(t1 / t0)) / n0, 0.0)

    return coalescent_loglik_integral(heights, n_taxa, log_pop, integral)


def multi_epoch_exponential_loglik(heights, n_taxa: int, n0,
                                   rates, transition_times):
    """Piecewise exponential in log N with per-epoch rates (ref:
    MultiEpochExponential.java:getDemographic/getIntensity). rates[K],
    transition_times[K-1] ascending; epoch K-1 extends to infinity.
    Vectorized: per-epoch closed-form expm1 intensity increments, masked
    overlap sum (no data-dependent control flow)."""
    fdt = heights.dtype
    n0 = jnp.asarray(n0, fdt)
    rates = jnp.asarray(rates, fdt)
    tt = jnp.asarray(transition_times, fdt)
    k_ep = rates.shape[0]
    lo = jnp.concatenate([jnp.zeros((1,), fdt), tt])
    hi = jnp.concatenate([tt, jnp.full((1,), jnp.inf, fdt)])
    # log N at epoch starts
    log_n_start = jnp.concatenate([
        jnp.zeros((1,), fdt),
        prefix_sum(-rates[:-1] * (hi[:-1] - lo[:-1]))]) + jnp.log(n0)

    def log_pop(t):
        te = t[..., None]
        inside = (te >= lo) & (te < hi)
        ln = log_n_start - rates * (te - lo)
        return jnp.sum(jnp.where(inside, ln, 0.0), -1)

    def intensity(t):
        te = t[..., None]
        # overlap of [0,t] with each epoch
        a = jnp.clip(te, lo, hi) - lo          # time spent in epoch
        a = jnp.where(te > lo, a, 0.0)
        # int_0^a e^{r x} dx / N_start = expm1(r a)/(r N_start), r->0: a/N
        inv_nstart = jnp.exp(-log_n_start)
        inc = jnp.where(
            jnp.abs(rates) < 1e-12,
            a * inv_nstart,
            jnp.expm1(rates * a) / rates * inv_nstart)
        return jnp.sum(inc, -1)

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def exponential_sawtooth_loglik(heights, n_taxa: int, n0, growth_rate,
                                wavelength, offset, n_cycles_max: int = 64):
    """Periodic exponential-growth sawtooth (ref:
    ExponentialSawtooth.java:getDemographic — t shifted by
    offset*wavelength, wrapped mod wavelength, exponential within each
    cycle). Intensity by full-cycle counting, jit-safe."""
    fdt = heights.dtype
    n0 = jnp.asarray(n0, fdt)
    r = jnp.asarray(growth_rate, fdt)
    wl = jnp.asarray(wavelength, fdt)
    off = jnp.asarray(offset, fdt) * wl

    def base_intensity(t):  # exponential within [0, wavelength)
        return jnp.expm1(r * t) / (r * n0)

    def log_pop(t):
        tw = jnp.mod(t + off, wl)
        return jnp.log(n0) - r * tw

    def intensity(t):
        ts = t + off
        cycles = jnp.floor(ts / wl)
        frac = ts - cycles * wl
        full = cycles * base_intensity(wl)
        return (full + base_intensity(frac)
                - base_intensity(off))  # normalize to intensity(0)=0

    return coalescent_loglik(heights, n_taxa, log_pop, intensity)


def exponential_logistic_loglik(heights, n_taxa: int, n0, growth_rate,
                                t50, ancestral_rate, transition_time,
                                quad: int = 32):
    """Logistic recent phase switching to exponential decline at
    transition_time (ref: ExponentialLogistic.java:getDemographic; its
    getIntegral numerically integrates — here GL panel quadrature)."""
    fdt = heights.dtype
    n0 = jnp.asarray(n0, fdt)
    r = jnp.asarray(growth_rate, fdt)
    # ref: ExponentialLogisticModel.java:126 -> LogisticGrowth.setTime50:
    # c = 1/(exp(r t50) - 2) so that N(t50) = N0/2 exactly
    c = 1.0 / (jnp.expm1(r * jnp.asarray(t50, fdt)) - 1.0)
    r1 = jnp.asarray(ancestral_rate, fdt)
    tt = jnp.asarray(transition_time, fdt)

    def logistic_log_pop(t):
        return jnp.log(n0) + jnp.log1p(c) - jnp.log1p(c * jnp.exp(r * t))

    n1_log = logistic_log_pop(tt)

    def log_pop(t):
        return jnp.where(
            t < tt, logistic_log_pop(t), n1_log - r1 * (t - tt))

    # split every interval at the transition time for quadrature accuracy
    base = quad_interval_integral(log_pop, quad)

    def integral(t0, t1):
        ts = jnp.clip(tt, t0, t1)
        return base(t0, ts) + base(ts, t1)

    return coalescent_loglik_integral(heights, n_taxa, log_pop, integral)
