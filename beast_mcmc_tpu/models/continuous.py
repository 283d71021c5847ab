"""Continuous multivariate trait evolution on trees (Brownian diffusion).

TPU-native replacement of the reference's continuous-data pipeline (ref:
src/dr/evomodel/treedatalikelihood/continuous/
ContinuousDataLikelihoodDelegate.java:70 and the native CDI integrator,
cdi/ContinuousDiffusionIntegrator.java, cdi/CDIJNIWrapper.java:88): the
likelihood of D-dimensional tip traits under Brownian motion with
diffusion precision Lambda [D,D], integrated over internal node states by
Gaussian belief propagation (Felsenstein pruning for Gaussians).

With a shared Lambda and scalar branch variances t_i (time x branch rate),
the propagation factors into a scalar precision recursion plus D-dim
mean updates — one lax.scan over the height-sorted internal nodes, same
schedule machinery as the discrete peeling kernel. Dense Lambda work is
batched matmul (MXU).

Covers: continuous phylogeography (relaxed random walk via per-branch
rate scalars, ref: continuous/MultivariateDiffusionModel.java), conjugate
root prior (ContinuousTraitDataModel root prior), REML mode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.ops.peeling import peel_order_from_heights


def brownian_loglikelihood(
    tip_traits: jnp.ndarray,  # [N, D]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    precision: jnp.ndarray,  # [D, D] diffusion precision (Lambda)
    branch_rate_scalars=1.0,  # [M] or scalar; variance = t * scalar
    root_prior_mean: Optional[jnp.ndarray] = None,  # [D]
    root_prior_sample_size: Optional[float] = None,  # kappa0 (pseudo-obs)
    tip_sampling_variance: float = 0.0,
) -> jnp.ndarray:
    """Log-likelihood of tip traits, internal states integrated out.

    root_prior: conjugate N(mean, (kappa0 Lambda)^-1). If None, REML —
    the root state is not penalized (likelihood of contrasts only).
    """
    n, d = tip_traits.shape
    m = parent.shape[0]
    dt = tip_traits.dtype

    pidx = jnp.maximum(parent, 0)
    bl = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
    bl = bl * jnp.broadcast_to(jnp.asarray(branch_rate_scalars, dt), (m,))

    sign, logdet_prec = jnp.linalg.slogdet(precision)

    # per-node message: (mu [D], v scalar "variance mass" at node)
    mu = jnp.zeros((m, d), dt).at[:n].set(tip_traits)
    v = jnp.full((m,), jnp.inf, dt).at[:n].set(tip_sampling_variance)

    order = peel_order_from_heights(heights, n)

    def step(carry, node):
        mu, v, logrem = carry
        l = children[node, 0]
        r = children[node, 1]
        vl = v[l] + bl[l]
        vr = v[r] + bl[r]
        diff = mu[l] - mu[r]
        vs = vl + vr
        quad = diff @ precision @ diff
        logrem = logrem - 0.5 * (
            d * jnp.log(2 * jnp.pi) + d * jnp.log(vs) - logdet_prec
            + quad / vs
        )
        new_mu = (vr * mu[l] + vl * mu[r]) / vs
        new_v = vl * vr / vs
        mu = mu.at[node].set(new_mu)
        v = v.at[node].set(new_v)
        return (mu, v, logrem), None

    (mu, v, logrem), _ = jax.lax.scan(
        step, (mu, v, jnp.asarray(0.0, dt)), order)

    if root_prior_sample_size is None:
        return logrem
    # conjugate root prior: one more Gaussian "branch" of variance 1/kappa0
    k0 = jnp.asarray(root_prior_sample_size, dt)
    mean0 = (jnp.zeros((d,), dt) if root_prior_mean is None
             else jnp.asarray(root_prior_mean, dt))
    v_root = v[root] + 1.0 / k0
    diff = mu[root] - mean0
    quad = diff @ precision @ diff
    return logrem - 0.5 * (
        d * jnp.log(2 * jnp.pi) + d * jnp.log(v_root) - logdet_prec
        + quad / v_root
    )


def brownian_tip_covariance(
    parent, children, heights, root, n_taxa: int,
    branch_rate_scalars=1.0, root_prior_sample_size: Optional[float] = None,
):
    """Host-side oracle: the [N,N] shared-path 'phylogenetic' covariance
    (per trait dimension, to be scaled by Lambda^{-1}): Sigma_ij = variance
    mass from root to MRCA(i,j) (+ 1/kappa0 under the conjugate root
    prior). Used by tests to compare against the dense MVN density."""
    import numpy as np

    parent = np.asarray(parent)
    heights = np.asarray(heights)
    m = parent.shape[0]
    scal = np.broadcast_to(np.asarray(branch_rate_scalars, np.float64), (m,))
    bl = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0) * scal

    def path(i):
        out = []
        while parent[i] >= 0:
            out.append(i)
            i = parent[i]
        return out

    paths = [path(i) for i in range(n_taxa)]
    sigma = np.zeros((n_taxa, n_taxa))
    base = 0.0 if root_prior_sample_size is None else 1.0 / root_prior_sample_size
    for i in range(n_taxa):
        for j in range(n_taxa):
            shared = set(paths[i]) & set(paths[j])
            sigma[i, j] = base + sum(bl[k] for k in shared)
    return sigma
