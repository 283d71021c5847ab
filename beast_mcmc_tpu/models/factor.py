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


def _push_canonical_delta(p, b, g, o_mask, y, t, lam_inv, eye,
                          cov_extra=None):
    """Push a tip potential that ALSO carries exact (delta) observations
    on the masked dims through its branch: message(x_parent) =
    ∫ δ(x_O − y_O) exp(−½x'Px + b'x + g) N(x; x_p, tΣ) dx, integrated
    in closed form (the composable-model generalization of the exact-tip
    conditioning in models/continuous.py)."""
    dt = b.dtype
    k = b.shape[0]
    o = o_mask.astype(dt)
    u = 1.0 - o
    cov = t * lam_inv
    if cov_extra is not None:
        # independent observation noise folded into the branch (exact
        # for y = x + e: the delta-observed variable is x + e whose
        # path covariance gains the noise block)
        cov = cov + cov_extra
    # J = C^-1 (guard t=0 with a tiny ridge; corpus branches are > 0)
    j_mat = jnp.linalg.inv(cov + 1e-30 * eye)
    a_mat = p + j_mat
    # W = inv(A_UU) lifted; log|A_UU|
    uu = jnp.outer(u, u)
    a_uu = a_mat * uu + jnp.diag(o)
    w = jnp.linalg.inv(a_uu) * uu
    sign, ld_auu = jnp.linalg.slogdet(a_uu)
    y_o = jnp.where(o > 0, y, 0.0)
    c0 = (b - a_mat @ y_o) * u
    ju = j_mat * u[:, None]          # rows masked to U
    p_out = j_mat - ju.T @ (w @ ju)
    b_out = j_mat @ y_o + ju.T @ (w @ c0)
    sign2, ld_c = jnp.linalg.slogdet(cov + 1e-30 * eye)
    g_out = (g - 0.5 * (k * jnp.log(2 * jnp.pi) + ld_c)
             - 0.5 * (y_o @ (a_mat @ y_o)) + b @ y_o
             + 0.5 * jnp.sum(u) * jnp.log(2 * jnp.pi)
             - 0.5 * ld_auu + 0.5 * (c0 @ (w @ c0)))
    return p_out, b_out, g_out


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
    tip_delta_mask: Optional[jnp.ndarray] = None,   # [N, K] exact dims
    tip_delta_values: Optional[jnp.ndarray] = None,  # [N, K]
    tip_cov_extra: Optional[jnp.ndarray] = None,    # [N, K, K] obs noise
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
    dmask = (jnp.zeros((m, k), dt) if tip_delta_mask is None
             else jnp.zeros((m, k), dt).at[:n].set(
                 tip_delta_mask.astype(dt)))
    dvals = (jnp.zeros((m, k), dt) if tip_delta_values is None
             else jnp.zeros((m, k), dt).at[:n].set(
                 tip_delta_values.astype(dt)))
    cextra = (None if tip_cov_extra is None
              else jnp.zeros((m, k, k), dt).at[:n].set(
                  tip_cov_extra.astype(dt)))

    order = peel_order_from_heights(heights, n, parent)

    def step(carry, node):
        p_a, b_a, g_a = carry
        acc = (jnp.zeros((k, k), dt), jnp.zeros((k,), dt), jnp.zeros((), dt))
        for ci in range(2):
            c = children[node, ci]
            if tip_delta_mask is None and tip_cov_extra is None:
                pc, bc, gc = _push_canonical(
                    p_a[c], b_a[c], g_a[c], bl[c], lam_inv, eye)
            else:
                pc, bc, gc = _push_canonical_delta(
                    p_a[c], b_a[c], g_a[c], dmask[c], dvals[c], bl[c],
                    lam_inv, eye,
                    None if cextra is None else cextra[c])
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


def factor_tip_potentials_cov(
    tip_data: jnp.ndarray,      # [N, P]
    tip_missing: jnp.ndarray,   # bool [N, P]
    loadings: jnp.ndarray,      # [K, P]
    noise_cov: jnp.ndarray,     # [P, P] full residual covariance
):
    """Factor-scale canonical tip potentials with a FULL residual
    covariance (integrated factors + repeated-measures noise: V =
    Γ⁻¹ + S_rm; ref: RepeatedMeasures wrapping
    IntegratedFactorAnalysisLikelihood). Missing dims are marginalized
    exactly via masked conditioning."""
    dt = tip_data.dtype
    p = tip_data.shape[1]

    def one(y, miss):
        o = (~miss).astype(dt)
        mask = jnp.outer(o, o)
        c_mat = noise_cov * mask + jnp.diag(1.0 - o)
        j_mat = jnp.linalg.inv(c_mat) * mask
        j_mat = 0.5 * (j_mat + j_mat.T)
        yv = jnp.where(o > 0, y, 0.0)
        lo = loadings * o[None, :]
        p_tip = lo @ j_mat @ lo.T
        b_tip = lo @ (j_mat @ yv)
        sign, ld = jnp.linalg.slogdet(j_mat + jnp.diag(1.0 - o))
        g_tip = -0.5 * (jnp.sum(o) * jnp.log(2 * jnp.pi) - ld
                        + yv @ (j_mat @ yv))
        return p_tip, b_tip, g_tip

    return jax.vmap(one)(tip_data, tip_missing)


def canonical_bp_loglikelihood_np(
    p0, b0, g0, parent, children, heights, root, lam_inv,
    root_prior_mean=None, root_prior_sample_size=1.0,
    tip_delta_mask=None, tip_delta_values=None, dtype=None,
):
    """Host-side long-double mirror of canonical_bp_loglikelihood —
    the high-precision oracle used by the report/assert path when the
    tip potentials are ill-conditioned (near-singular sampling
    precisions; the f64 BP carries ~1e-9 of rounding there)."""
    import numpy as np

    ld = dtype or np.longdouble
    n, k = np.shape(b0)
    parent = np.asarray(parent)
    children = np.asarray(children)
    heights = np.asarray(heights, ld)
    m = parent.shape[0]
    P = np.zeros((m, k, k), ld)
    b = np.zeros((m, k), ld)
    g = np.zeros((m,), ld)
    P[:n] = np.asarray(p0, ld)
    b[:n] = np.asarray(b0, ld)
    g[:n] = np.asarray(g0, ld)
    dmask = np.zeros((m, k), ld)
    dvals = np.zeros((m, k), ld)
    if tip_delta_mask is not None:
        dmask[:n] = np.asarray(tip_delta_mask, ld)
        dvals[:n] = np.asarray(tip_delta_values, ld)
    lam_inv = np.asarray(lam_inv, ld)
    eye = np.eye(k, dtype=ld)

    def push(node, t):
        o = dmask[node]
        u = 1.0 - o
        cov = t * lam_inv
        j_mat = np.linalg.inv(cov.astype(float)).astype(ld)
        # refine the f64 inverse by one Newton step in long double
        j_mat = j_mat @ (2 * eye - cov @ j_mat)
        a_mat = P[node] + j_mat
        uu = np.outer(u, u)
        a_uu = a_mat * uu + np.diag(o)
        w = np.linalg.inv(a_uu.astype(float)).astype(ld)
        w = w @ (2 * eye - a_uu @ w)
        w = w * uu
        sign, ld_auu = np.linalg.slogdet(a_uu.astype(float))
        sign2, ld_c = np.linalg.slogdet(cov.astype(float))
        y_o = np.where(o > 0, dvals[node], 0.0)
        c0 = (b[node] - a_mat @ y_o) * u
        ju = j_mat * u[:, None]
        p_out = j_mat - ju.T @ (w @ ju)
        b_out = j_mat @ y_o + ju.T @ (w @ c0)
        g_out = (g[node] - 0.5 * (k * np.log(2 * np.pi) + ld_c)
                 - 0.5 * (y_o @ (a_mat @ y_o)) + b[node] @ y_o
                 + 0.5 * np.sum(u) * np.log(2 * np.pi)
                 - 0.5 * ld_auu + 0.5 * (c0 @ (w @ c0)))
        return p_out, b_out, g_out

    order = [i for i in np.argsort(heights[n:].astype(float)) + n]
    for node in order:
        for c in children[node]:
            t = heights[node] - heights[c]
            pc, bc, gc = push(int(c), t)
            P[node] += pc
            b[node] += bc
            g[node] += gc
    mean0 = (np.zeros(k, ld) if root_prior_mean is None
             else np.asarray(root_prior_mean, ld))
    k0 = ld(root_prior_sample_size)
    dmask[root] = 0.0
    p_r, b_r, g_r = push(int(root), 1.0 / k0)
    return float(g_r - 0.5 * (mean0 @ (p_r @ mean0)) + b_r @ mean0)
