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


# ---------------------------------------------------------------------------
# Drift diffusion (ref: continuous/DriftDiffusionModelDelegate.java —
# Brownian motion with a per-branch deterministic drift vector)
# ---------------------------------------------------------------------------


def drift_brownian_loglikelihood(
    tip_traits: jnp.ndarray,  # [N, D]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    precision: jnp.ndarray,  # [D, D]
    drift: jnp.ndarray,  # [M, D] or [D] per-branch drift velocity
    branch_rate_scalars=1.0,
    root_prior_mean: Optional[jnp.ndarray] = None,
    root_prior_sample_size: Optional[float] = None,
) -> jnp.ndarray:
    """Brownian likelihood with x_child ~ N(x_parent + drift_b * t_b,
    t_b s_b Lambda^-1): the upward message mean is shifted by the branch's
    accumulated drift, everything else is the Brownian recursion."""
    n, d = tip_traits.shape
    m = parent.shape[0]
    dt = tip_traits.dtype
    pidx = jnp.maximum(parent, 0)
    t_raw = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
    drift = jnp.broadcast_to(jnp.asarray(drift, dt), (m, d))
    shift = drift * t_raw[:, None]  # [M, D] mean displacement along branch
    # fold the shift into effective tip observations of the root-relative
    # process: subtracting each branch's drift as the message passes up is
    # equivalent to shifting tips by the total path drift — done in-scan.
    bl = t_raw * jnp.broadcast_to(jnp.asarray(branch_rate_scalars, dt), (m,))
    sign, logdet_prec = jnp.linalg.slogdet(precision)

    mu = jnp.zeros((m, d), dt).at[:n].set(tip_traits)
    v = jnp.full((m,), jnp.inf, dt).at[:n].set(0.0)
    order = peel_order_from_heights(heights, n)

    def step(carry, node):
        mu, v, logrem = carry
        l = children[node, 0]
        r = children[node, 1]
        vl = v[l] + bl[l]
        vr = v[r] + bl[r]
        mul = mu[l] - shift[l]
        mur = mu[r] - shift[r]
        diff = mul - mur
        vs = vl + vr
        quad = diff @ precision @ diff
        logrem = logrem - 0.5 * (
            d * jnp.log(2 * jnp.pi) + d * jnp.log(vs) - logdet_prec
            + quad / vs
        )
        mu = mu.at[node].set((vr * mul + vl * mur) / vs)
        v = v.at[node].set(vl * vr / vs)
        return (mu, v, logrem), None

    (mu, v, logrem), _ = jax.lax.scan(
        step, (mu, v, jnp.asarray(0.0, dt)), order)
    if root_prior_sample_size is None:
        return logrem
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


# ---------------------------------------------------------------------------
# Ornstein-Uhlenbeck diffusion (ref: continuous/OUDiffusionModelDelegate
# .java — mean-reverting process with strength alpha toward optimum theta)
# ---------------------------------------------------------------------------


def ou_loglikelihood(
    tip_traits: jnp.ndarray,  # [N, D]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    precision: jnp.ndarray,  # [D, D] diffusion precision
    alpha,  # scalar mean-reversion strength
    theta: jnp.ndarray,  # [D] optimum
    branch_rate_scalars=1.0,
    stationary_root: bool = True,
    root_prior_sample_size: Optional[float] = None,
) -> jnp.ndarray:
    """OU trait likelihood via affine Gaussian belief propagation:

      x_c | x_p ~ N(theta + q (x_p - theta), gamma_t s Lambda^-1),
      q = e^{-alpha t}, gamma_t = (1 - e^{-2 alpha t}) / (2 alpha).

    Each branch transforms the upward message (mu, v) ->
    (theta + (mu-theta)/q, (v+gamma)/q^2) with log-normalizer d*alpha*t;
    node combination is the Brownian product rule. Root integrates against
    the stationary N(theta, Lambda^-1/(2 alpha)) (default) or a conjugate
    N(theta, (k0 Lambda)^-1).
    """
    n, d = tip_traits.shape
    m = parent.shape[0]
    dt = tip_traits.dtype
    a = jnp.asarray(alpha, dt)
    th = jnp.asarray(theta, dt)
    pidx = jnp.maximum(parent, 0)
    t_raw = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
    scal = jnp.broadcast_to(jnp.asarray(branch_rate_scalars, dt), (m,))
    t_eff = t_raw * scal  # rate-scaled branch time (RRW-OU)
    # clamp the attenuation exponent: beyond it the branch is fully
    # decorrelated (correlation e^-cap ~ 0 to machine precision) and the
    # un-clamped q underflows to 0, turning 1/q into inf -> NaN
    cap = jnp.asarray(80.0 if dt == jnp.float64 else 30.0, dt)
    x = jnp.minimum(a * t_eff, cap)
    q = jnp.exp(-x)  # [M]
    gamma = -jnp.expm1(-2.0 * x) / (2.0 * a)
    sign, logdet_prec = jnp.linalg.slogdet(precision)

    mu = jnp.zeros((m, d), dt).at[:n].set(tip_traits)
    v = jnp.full((m,), jnp.inf, dt).at[:n].set(0.0)
    order = peel_order_from_heights(heights, n)

    def branch_transform(mu_c, v_c, node):
        mu_t = th + (mu_c - th) / q[node]
        v_t = (v_c + gamma[node]) / (q[node] * q[node])
        log_norm = -d * jnp.log(q[node])  # = d * alpha * t
        return mu_t, v_t, log_norm

    def step(carry, node):
        mu, v, logrem = carry
        l = children[node, 0]
        r = children[node, 1]
        mul, vl, kl = branch_transform(mu[l], v[l], l)
        mur, vr, kr = branch_transform(mu[r], v[r], r)
        diff = mul - mur
        vs = vl + vr
        quad = diff @ precision @ diff
        logrem = logrem + kl + kr - 0.5 * (
            d * jnp.log(2 * jnp.pi) + d * jnp.log(vs) - logdet_prec
            + quad / vs
        )
        mu = mu.at[node].set((vr * mul + vl * mur) / vs)
        v = v.at[node].set(vl * vr / vs)
        return (mu, v, logrem), None

    (mu, v, logrem), _ = jax.lax.scan(
        step, (mu, v, jnp.asarray(0.0, dt)), order)

    if stationary_root:
        v_root = v[root] + 1.0 / (2.0 * a)
    elif root_prior_sample_size is not None:
        v_root = v[root] + 1.0 / jnp.asarray(root_prior_sample_size, dt)
    else:
        return logrem  # REML
    diff = mu[root] - th
    quad = diff @ precision @ diff
    return logrem - 0.5 * (
        d * jnp.log(2 * jnp.pi) + d * jnp.log(v_root) - logdet_prec
        + quad / v_root
    )


# ---------------------------------------------------------------------------
# Full-precision belief propagation with per-dimension missing tip data
# (the dense generality of the CDI integrator, ref:
# cdi/ContinuousDiffusionIntegrator.java SafeMultivariateIntegrator —
# [D,D] precision per node)
# ---------------------------------------------------------------------------
#
# Messages are canonical Gaussians L(x) = exp(g) exp(-x'Px/2 + b'x), which
# remain valid for singular P (dims with no data below are flat). The
# branch push uses the singularity-safe identities (V = Lambda^-1, A = I +
# t V P):  P' = P A^-1,  b' = A^-T b,  g' = g - log|A|/2 + b'A^-1 tV b/2.
# Tip messages are emitted directly in the parent frame by conditioning
# the branch Gaussian on the observed dims (delta-function tips).


def _push_canonical(p, b, g, t, lam_inv, eye):
    a_mat = eye + t * (lam_inv @ p)
    p_new = jnp.linalg.solve(a_mat.T, p.T).T
    p_new = 0.5 * (p_new + p_new.T)
    b_new = jnp.linalg.solve(a_mat.T, b)
    sign, logdet_a = jnp.linalg.slogdet(a_mat)
    g_new = g - 0.5 * logdet_a + 0.5 * t * (b_new @ (lam_inv @ b))
    return p_new, b_new, g_new


def brownian_loglikelihood_missing(
    tip_traits: jnp.ndarray,  # [N, D] (missing entries arbitrary)
    tip_missing: jnp.ndarray,  # bool[N, D], True where unobserved
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    precision: jnp.ndarray,  # [D, D]
    branch_rate_scalars=1.0,
    root_prior_mean: Optional[jnp.ndarray] = None,
    root_prior_sample_size: float = 1.0,
) -> jnp.ndarray:
    """Brownian tip-trait likelihood with per-dimension missing data,
    integrated over internal states AND the missing dims, with a conjugate
    root prior N(mean0, (k0 Lambda)^-1)."""
    n, d = tip_traits.shape
    m = parent.shape[0]
    dt = tip_traits.dtype
    pidx = jnp.maximum(parent, 0)
    bl = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
    bl = bl * jnp.broadcast_to(jnp.asarray(branch_rate_scalars, dt), (m,))
    lam_inv = jnp.linalg.inv(precision)
    eye = jnp.eye(d, dtype=dt)

    obs = (~tip_missing).astype(dt)  # [N, D]

    def tip_message(i):
        """Tip message already in the PARENT frame: N(y_obs; x_obs, t V_oo)
        as a canonical Gaussian in x (flat on missing dims)."""
        o = obs[i]
        mask = jnp.outer(o, o)
        cov_obs = bl[i] * lam_inv * mask + jnp.diag(1.0 - o)
        p = jnp.linalg.inv(cov_obs) * mask
        p = 0.5 * (p + p.T)
        y = jnp.where(o > 0, tip_traits[i], 0.0)
        b = p @ y
        d_o = jnp.sum(o)
        sign, logdet = jnp.linalg.slogdet(cov_obs)
        g = -0.5 * (d_o * jnp.log(2 * jnp.pi) + logdet + y @ b)
        return p, b, g

    p0, b0, g0 = jax.vmap(tip_message)(jnp.arange(n))
    p_arr = jnp.zeros((m, d, d), dt).at[:n].set(p0)
    b_arr = jnp.zeros((m, d), dt).at[:n].set(b0)
    g_arr = jnp.zeros((m,), dt).at[:n].set(g0)

    order = peel_order_from_heights(heights, n)

    def child_message(p_arr, b_arr, g_arr, c):
        """Child c's message in its parent's frame: tips are stored pushed;
        internal messages are pushed through their branch here."""
        pc, bc, gc = p_arr[c], b_arr[c], g_arr[c]
        pp, bp, gp = _push_canonical(pc, bc, gc, bl[c], lam_inv, eye)
        is_tip = c < n
        sel = lambda a, b_: jnp.where(is_tip, a, b_)
        return sel(pc, pp), sel(bc, bp), sel(gc, gp)

    def step(carry, node):
        p_arr, b_arr, g_arr = carry
        l = children[node, 0]
        r = children[node, 1]
        pl, blv, gl = child_message(p_arr, b_arr, g_arr, l)
        pr, brv, gr = child_message(p_arr, b_arr, g_arr, r)
        p_arr = p_arr.at[node].set(pl + pr)
        b_arr = b_arr.at[node].set(blv + brv)
        g_arr = g_arr.at[node].set(gl + gr)
        return (p_arr, b_arr, g_arr), None

    (p_arr, b_arr, g_arr), _ = jax.lax.scan(
        step, (p_arr, b_arr, g_arr), order)

    # root: integrate against N(mean0, (k0 Lambda)^-1) using the same
    # singularity-safe push with t = 1/k0 then evaluating at mean0
    k0 = jnp.asarray(root_prior_sample_size, dt)
    mean0 = (jnp.zeros((d,), dt) if root_prior_mean is None
             else jnp.asarray(root_prior_mean, dt))
    p_r, b_r, g_r = _push_canonical(
        p_arr[root], b_arr[root], g_arr[root], 1.0 / k0, lam_inv, eye
    )
    return g_r - 0.5 * (mean0 @ (p_r @ mean0)) + b_r @ mean0
