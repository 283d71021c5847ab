"""Phylogenetic factor analysis with analytically integrated factors.

TPU-native replacement for the reference's integrated factor model (ref:
src/dr/evomodel/treedatalikelihood/continuous/
IntegratedFactorAnalysisLikelihood.java): P observed traits per tip are a
linear map of K latent factors, y_i | f_i ~ N(L^T f_i, Gamma^-1) with
diagonal trait precision Gamma; the factors evolve on the tree as a
K-dimensional Brownian diffusion with precision Lambda. The factors are
integrated out in closed form: each tip contributes a canonical-form
Gaussian potential on the FACTOR scale,

    P_i = L_obs Gamma_obs L_obs^T      (precision, rank <= #observed)
    b_i = L_obs Gamma_obs y_obs
    g_i = -1/2 (n_obs log 2pi - sum log gamma_obs + y^T Gamma y)

and the tree marginal is the same singularity-safe canonical belief
propagation used for the Brownian missing-data path
(models/continuous.py). Per-trait missing data costs nothing extra: a
missing trait simply drops out of the three sums above.

Gradients wrt loadings / trait precisions / diffusion / heights come from
jax.grad through the scan — the role of the reference's bespoke
FactorAnalysisOperatorAdaptor + loadings Gibbs/HMC machinery (ref:
src/dr/inference/operators/factorAnalysis/) is played by generic HMC on
this differentiable likelihood.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.models.continuous import _push_canonical
from beast_mcmc_tpu.ops.peeling import peel_order_from_heights


def factor_tip_potentials(
    tip_data: jnp.ndarray,      # [N, P] (missing entries arbitrary)
    tip_missing: jnp.ndarray,   # bool [N, P]
    loadings: jnp.ndarray,      # [K, P]
    trait_precision: jnp.ndarray,  # [P] diagonal of Gamma
):
    """Canonical Gaussian potentials on the factor scale, one per tip.

    Returns (P [N,K,K], b [N,K], g [N])."""
    dt = tip_data.dtype
    obs = (~tip_missing).astype(dt)                      # [N, P]
    gam = trait_precision[None, :] * obs                 # [N, P] masked
    y = jnp.where(obs > 0, tip_data, 0.0)                # [N, P]

    lg = jnp.einsum("kp,np->nkp", loadings, gam)         # L Gamma_obs
    p_tip = jnp.einsum("nkp,jp->nkj", lg, loadings)      # [N, K, K]
    p_tip = 0.5 * (p_tip + jnp.swapaxes(p_tip, 1, 2))
    b_tip = jnp.einsum("nkp,np->nk", lg, y)              # [N, K]

    n_obs = jnp.sum(obs, axis=1)
    log_gam = jnp.where(obs > 0, jnp.log(trait_precision)[None, :], 0.0)
    g_tip = -0.5 * (
        n_obs * jnp.log(2 * jnp.pi)
        - jnp.sum(log_gam, axis=1)
        + jnp.einsum("np,np->n", y * gam, y)
    )
    return p_tip, b_tip, g_tip


def integrated_factor_loglikelihood(
    tip_data: jnp.ndarray,      # [N, P]
    tip_missing: jnp.ndarray,   # bool [N, P]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    loadings: jnp.ndarray,      # [K, P]
    trait_precision: jnp.ndarray,  # [P]
    factor_precision: Optional[jnp.ndarray] = None,  # [K, K] Lambda; I if None
    branch_rate_scalars=1.0,
    root_prior_mean: Optional[jnp.ndarray] = None,   # [K]
    root_prior_sample_size: float = 1.0,
) -> jnp.ndarray:
    """log p(observed tip data | tree, L, Gamma, Lambda), latent factors
    and internal node states integrated out; conjugate factor root prior
    N(mean0, (k0 Lambda)^-1).

    (ref: IntegratedFactorAnalysisLikelihood.java — standard BEAST usage
    fixes Lambda = I and lets the loadings carry the scale.)
    """
    n, p = tip_data.shape
    k = loadings.shape[0]
    m = parent.shape[0]
    dt = tip_data.dtype
    parent = jnp.asarray(parent)
    children = jnp.asarray(children)

    pidx = jnp.maximum(parent, 0)
    bl = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
    bl = bl * jnp.broadcast_to(jnp.asarray(branch_rate_scalars, dt), (m,))

    if factor_precision is None:
        lam_inv = jnp.eye(k, dtype=dt)
    else:
        lam_inv = jnp.linalg.inv(factor_precision)

    p0, b0, g0 = factor_tip_potentials(
        tip_data, tip_missing, loadings, trait_precision)

    return canonical_bp_loglikelihood(
        p0, b0, g0, parent, children, heights, root, lam_inv,
        branch_rate_scalars=branch_rate_scalars,
        root_prior_mean=root_prior_mean,
        root_prior_sample_size=root_prior_sample_size,
    )


def canonical_bp_loglikelihood(
    p0: jnp.ndarray,   # [N, K, K] tip potential precisions
    b0: jnp.ndarray,   # [N, K]
    g0: jnp.ndarray,   # [N]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    lam_inv: jnp.ndarray,  # [K, K] per-unit-time diffusion covariance
    branch_rate_scalars=1.0,
    root_prior_mean: Optional[jnp.ndarray] = None,
    root_prior_sample_size: float = 1.0,
) -> jnp.ndarray:
    """Marginal log-likelihood of ARBITRARY canonical Gaussian tip
    potentials propagated up a Brownian tree (the generalized engine
    behind the integrated factor model; also serves repeated-measures
    replicates and jointPartialsProvider compositions — ref:
    ContinuousTraitPartialsProvider implementations)."""
    n, k = b0.shape
    m = parent.shape[0]
    dt = b0.dtype
    parent = jnp.asarray(parent)
    children = jnp.asarray(children)
    eye = jnp.eye(k, dtype=dt)

    pidx = jnp.maximum(parent, 0)
    bl = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
    bl = bl * jnp.broadcast_to(jnp.asarray(branch_rate_scalars, dt), (m,))

    p_arr = jnp.zeros((m, k, k), dt).at[:n].set(p0)
    b_arr = jnp.zeros((m, k), dt).at[:n].set(b0)
    g_arr = jnp.zeros((m,), dt).at[:n].set(g0)

    order = peel_order_from_heights(heights, n)

    def step(carry, node):
        p_a, b_a, g_a = carry
        acc = (jnp.zeros((k, k), dt), jnp.zeros((k,), dt), jnp.zeros((), dt))
        for ci in range(2):
            c = children[node, ci]
            pc, bc, gc = _push_canonical(
                p_a[c], b_a[c], g_a[c], bl[c], lam_inv, eye)
            acc = (acc[0] + pc, acc[1] + bc, acc[2] + gc)
        return (p_a.at[node].set(acc[0]),
                b_a.at[node].set(acc[1]),
                g_a.at[node].set(acc[2])), None

    (p_arr, b_arr, g_arr), _ = jax.lax.scan(step, (p_arr, b_arr, g_arr), order)

    k0 = jnp.asarray(root_prior_sample_size, dt)
    mean0 = (jnp.zeros((k,), dt) if root_prior_mean is None
             else jnp.asarray(root_prior_mean, dt))
    p_r, b_r, g_r = _push_canonical(
        p_arr[root], b_arr[root], g_arr[root], 1.0 / k0, lam_inv, eye)
    return g_r - 0.5 * (mean0 @ (p_r @ mean0)) + b_r @ mean0


def factor_marginal_mvn(
    tip_cov: jnp.ndarray,       # [N, N] tree covariance (incl. root 1/k0)
    loadings: jnp.ndarray,      # [K, P]
    trait_precision: jnp.ndarray,  # [P]
    factor_covariance: Optional[jnp.ndarray] = None,  # [K, K] Sigma
):
    """Dense marginal covariance of vec(tip data) — the oracle identity
    Cov(y_i, y_j) = L^T Cov(f_i, f_j) L + delta_ij Gamma^-1 used by the
    tests; O(N^2 P^2), never on the sampling path."""
    k, p = loadings.shape
    sig = jnp.eye(k, dtype=loadings.dtype) if factor_covariance is None \
        else factor_covariance
    lsl = loadings.T @ sig @ loadings                   # [P, P]
    cov = jnp.kron(tip_cov, lsl)
    noise = jnp.kron(jnp.eye(tip_cov.shape[0], dtype=loadings.dtype),
                     jnp.diag(1.0 / trait_precision))
    return cov + noise
