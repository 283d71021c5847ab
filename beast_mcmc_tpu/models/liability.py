"""Ordered latent liability: discrete traits from thresholded latent
Brownian variables.

Role of the reference's OrderedLatentLiabilityLikelihood (ref:
src/dr/evomodel/continuous/OrderedLatentLiabilityLikelihood.java — binary
or ordinal tip data are deterministic threshold functions of latent
continuous traits that diffuse on the tree; the latent values are sampled
by MCMC). Here the latent tip matrix is a regular parameter; this module
supplies the data-consistency likelihood (0 or -inf, plus a smooth
penalty option for HMC) to pair with the Brownian/OU engines.
"""

from __future__ import annotations

import jax.numpy as jnp


def liability_consistency_loglik(
    latent: jnp.ndarray,  # [N, D] latent tip values (sampled)
    data: jnp.ndarray,  # int[N, D] observed ordinal category per dim
    thresholds: jnp.ndarray,  # [D, K-1] ascending cut points per dim
    smooth: float = 0.0,
) -> jnp.ndarray:
    """log P(data | latent): 0 when every latent value lies in its
    category's threshold interval, else -inf (or a smooth hinge penalty
    of scale `smooth` for gradient-based samplers)."""
    dt = latent.dtype
    d = latent.shape[1]
    neg_inf = jnp.asarray(-jnp.inf, dt)
    lo_pad = jnp.full((d, 1), -jnp.inf, dt)
    hi_pad = jnp.full((d, 1), jnp.inf, dt)
    cuts = jnp.concatenate([lo_pad, thresholds.astype(dt), hi_pad], axis=1)
    lo = cuts[jnp.arange(d)[None, :], data]  # [N, D]
    hi = cuts[jnp.arange(d)[None, :], data + 1]
    if smooth > 0:
        s = jnp.asarray(smooth, dt)
        pen = jnp.maximum(lo - latent, 0.0) + jnp.maximum(latent - hi, 0.0)
        return -jnp.sum(pen * pen) / (2.0 * s * s)
    ok = jnp.all((latent >= lo) & (latent <= hi))
    return jnp.where(ok, jnp.asarray(0.0, dt), neg_inf)


def binary_liability_data(tip_states: jnp.ndarray) -> jnp.ndarray:
    """Binary data as ordinal categories with a single threshold at 0
    (the reference's binary latent-liability convention)."""
    return tip_states.astype(jnp.int32)
