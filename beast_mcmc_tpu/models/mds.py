"""Bayesian multidimensional scaling (antigenic cartography).

Role of the reference's MDS stack (ref:
src/dr/inference/multidimensionalscaling/MultiDimensionalScalingLikelihood
.java:46 and the native mds_jni core, NativeMDSSingleton.java:107; consumed
by the antigenic models, src/dr/evomodel/antigenic/NewAntigenicLikelihood
.java): observed pairwise distances delta_ij are modeled as (optionally
zero-truncated) normals around the latent-location distances ||x_i - x_j||
with global precision.

TPU-native: the whole distance matrix is one [N,N] broadcast op; missing
observations are a mask; gradients for HMC come from jax.grad (the role of
the native gradient kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_distances(locations: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """[N,N] Euclidean distances of latent locations [N,D] (sqrt-safe at
    the diagonal for gradients)."""
    diff = locations[:, None, :] - locations[None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(sq + eps)


def mds_loglikelihood(
    observed: jnp.ndarray,  # [N,N] observed distances (symmetric)
    mask: jnp.ndarray,  # bool[N,N] True where observed (use upper triangle)
    locations: jnp.ndarray,  # [N,D]
    precision,
    truncated: bool = True,
) -> jnp.ndarray:
    """Sum over observed pairs of logN(delta; d, 1/prec), minus the
    zero-truncation normalizer log Phi(d sqrt(prec)) when truncated
    (ref: MultiDimensionalScalingLikelihood ObservationType.POINT +
    mdsTruncation)."""
    dt = locations.dtype
    prec = jnp.asarray(precision, dt)
    d = pairwise_distances(locations)
    resid = observed - d
    ll = 0.5 * (jnp.log(prec) - jnp.log(2 * jnp.pi)) - 0.5 * prec * resid * resid
    if truncated:
        # P(delta > 0) = Phi(d * sqrt(prec))
        z = d * jnp.sqrt(prec)
        ll = ll - jax.scipy.stats.norm.logcdf(z)
    return jnp.sum(jnp.where(mask, ll, 0.0))


def mds_location_gradient(observed, mask, locations, precision,
                          truncated: bool = True):
    """Gradient wrt locations (the native getLocationGradient surface)."""
    return jax.grad(
        lambda x: mds_loglikelihood(observed, mask, x, precision, truncated)
    )(locations)


# ---------------------------------------------------------------------------
# full antigenic likelihood — serum/virus effects + drift + measurement
# types (ref: src/dr/evomodel/antigenic/AntigenicLikelihood.java:520-545,
# 578-660; NewAntigenicLikelihood.java:53 is the mds_jni-accelerated
# refactor of the same density)
# ---------------------------------------------------------------------------

MEASUREMENT_POINT = 0
MEASUREMENT_LOWER_THRESHOLD = 1
MEASUREMENT_UPPER_THRESHOLD = 2
MEASUREMENT_INTERVAL = 3


def antigenic_distance(
    virus_locations: jnp.ndarray,  # [V, D]
    serum_locations: jnp.ndarray,  # [S, D]
    virus_idx: jnp.ndarray,  # int[M]
    serum_idx: jnp.ndarray,  # int[M]
    location_drift=None,
    virus_offsets=None,  # [V] (dates)
    serum_offsets=None,  # [S]
) -> jnp.ndarray:
    """Per-measurement antigenic distance; the FIRST map dimension is
    drift-shifted by offset*drift (ref: AntigenicLikelihood.java:578-600
    computeDistance)."""
    v = virus_locations[virus_idx]
    s = serum_locations[serum_idx]
    if location_drift is not None:
        v = v.at[:, 0].add(location_drift * virus_offsets[virus_idx])
        s = s.at[:, 0].add(location_drift * serum_offsets[serum_idx])
    d = v - s
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)


def antigenic_loglikelihood(
    log2_titres: jnp.ndarray,  # [M]
    measurement_types: jnp.ndarray,  # int[M] (constants above)
    virus_idx: jnp.ndarray,
    serum_idx: jnp.ndarray,
    virus_locations: jnp.ndarray,
    serum_locations: jnp.ndarray,
    serum_potencies: jnp.ndarray,  # [S]
    mds_precision,
    virus_avidities=None,  # [V] or None
    location_drift=None,
    virus_offsets=None,
    serum_offsets=None,
    interval_width: float = 1.0,
) -> jnp.ndarray:
    """The full HI-assay likelihood (ref: AntigenicLikelihood.java:
    520-545): expectation = potency[serum] (+ avidity[virus]) - distance;
    POINT -> Normal pdf, LOWER/UPPER THRESHOLD -> Normal cdf tails,
    INTERVAL -> cdf(max)-cdf(min); branchless via type masks."""
    from jax.scipy.stats import norm

    dt = virus_locations.dtype
    sd = 1.0 / jnp.sqrt(jnp.asarray(mds_precision, dt))
    dist = antigenic_distance(
        virus_locations, serum_locations, virus_idx, serum_idx,
        location_drift, virus_offsets, serum_offsets,
    )
    baseline = serum_potencies[serum_idx]
    if virus_avidities is not None:
        baseline = baseline + virus_avidities[virus_idx]
    expect = baseline - dist

    y = log2_titres
    point = norm.logpdf(y, expect, sd)
    lower = norm.logcdf(y, expect, sd)
    upper = norm.logsf(y, expect, sd)
    hi = norm.cdf(y + interval_width, expect, sd)
    lo = norm.cdf(y, expect, sd)
    interval = jnp.log(jnp.maximum(hi - lo, 1e-300))

    t = measurement_types
    ll = jnp.where(
        t == MEASUREMENT_POINT, point,
        jnp.where(t == MEASUREMENT_LOWER_THRESHOLD, lower,
                  jnp.where(t == MEASUREMENT_UPPER_THRESHOLD, upper,
                            interval)),
    )
    return jnp.sum(ll)


def antigenic_drift_prior(
    locations: jnp.ndarray,  # [N, D]
    offsets: jnp.ndarray,  # [N] dates
    drift_rate,
    precision,
) -> jnp.ndarray:
    """Diffusion prior tying locations to a drifting mean along dim 0
    (ref: the antigenic drift prior of Bedford et al. 2014 as used by
    the antigenic XMLs: x_i ~ N(drift*offset_i e_1, 1/prec I))."""
    dt = locations.dtype
    prec = jnp.asarray(precision, dt)
    mean = jnp.zeros_like(locations).at[:, 0].set(drift_rate * offsets)
    d = locations - mean
    n = locations.size
    return 0.5 * n * (jnp.log(prec) - jnp.log(2 * jnp.pi)) - 0.5 * prec * jnp.sum(d * d)
