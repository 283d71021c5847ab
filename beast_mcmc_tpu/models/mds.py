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
