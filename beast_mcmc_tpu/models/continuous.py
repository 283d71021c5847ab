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

    order = peel_order_from_heights(heights, n, parent)

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
    order = peel_order_from_heights(heights, n, parent)

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
    order = peel_order_from_heights(heights, n, parent)

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

    order = peel_order_from_heights(heights, n, parent)

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


# ---------------------------------------------------------------------------
# General affine-Gaussian tree propagation — the full-generality analog of
# the CDI SafeMultivariateIntegrator (ref: src/dr/evomodel/treedatalikelihood/
# continuous/cdi/SafeMultivariateIntegrator.java,
# SafeMultivariateActualizedWithDriftIntegrator.java): every branch is an
# affine Gaussian channel  x_child = Q_b x_parent + r_b + eps_b,
# eps_b ~ N(0, Sigma_b), which covers Brownian (Q=I, Sigma=t Lambda^-1),
# drift (r = v t), and full-matrix OU "actualized" branches
# (Q = e^{-A t}, r = (I - Q) theta, Sigma = integrated stationary noise).
# Missing tip dimensions integrate out exactly (canonical messages stay
# valid for singular precision).
# ---------------------------------------------------------------------------


def _push_canonical_cov(p, b, g, cov):
    """Integrate the canonical message (p, b, g) over x ~ N(m, cov):
    returns the canonical-in-m triple."""
    d = p.shape[0]
    a_mat = jnp.eye(d, dtype=p.dtype) + cov @ p
    p_new = jnp.linalg.solve(a_mat.T, p.T).T
    p_new = 0.5 * (p_new + p_new.T)
    b_new = jnp.linalg.solve(a_mat.T, b)
    sign, logdet_a = jnp.linalg.slogdet(a_mat)
    g_new = g - 0.5 * logdet_a + 0.5 * (b_new @ (cov @ b))
    return p_new, b_new, g_new


def affine_gaussian_tree_loglikelihood(
    tip_traits: jnp.ndarray,   # [N, D] (missing entries arbitrary)
    tip_missing: jnp.ndarray,  # bool [N, D]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    branch_q: jnp.ndarray,      # [M, D, D]
    branch_r: jnp.ndarray,      # [M, D]
    branch_sigma: jnp.ndarray,  # [M, D, D] (root row ignored)
    root_mean: jnp.ndarray,     # [D]
    root_cov: jnp.ndarray,      # [D, D] prior covariance of the root state
) -> jnp.ndarray:
    """Marginal log-likelihood of the tip traits, internal states and
    missing tip dimensions integrated out by canonical-form Gaussian
    belief propagation up the tree."""
    n, d = tip_traits.shape
    m = parent.shape[0]
    dt = tip_traits.dtype

    obs = (~tip_missing).astype(dt)  # [N, D]

    def tip_message(i):
        """Tip i's message about its PARENT state: N(y_o; (Qx+r)_o, S_oo)
        as a canonical Gaussian in x (flat on missing dims)."""
        o = obs[i]
        mask = jnp.outer(o, o)
        c_mat = branch_sigma[i] * mask + jnp.diag(1.0 - o)
        j_mat = jnp.linalg.inv(c_mat) * mask
        j_mat = 0.5 * (j_mat + j_mat.T)
        y = jnp.where(o > 0, tip_traits[i] - branch_r[i], 0.0)
        q = branch_q[i]
        p = q.T @ j_mat @ q
        b = q.T @ (j_mat @ y)
        d_o = jnp.sum(o)
        sign, logdet = jnp.linalg.slogdet(c_mat)
        g = -0.5 * (d_o * jnp.log(2 * jnp.pi) + logdet + y @ (j_mat @ y))
        return 0.5 * (p + p.T), b, g

    p0, b0, g0 = jax.vmap(tip_message)(jnp.arange(n))
    p_arr = jnp.zeros((m, d, d), dt).at[:n].set(p0)
    b_arr = jnp.zeros((m, d), dt).at[:n].set(b0)
    g_arr = jnp.zeros((m,), dt).at[:n].set(g0)

    order = peel_order_from_heights(heights, n, parent)

    def child_message(p_arr, b_arr, g_arr, c):
        """Child c's message in its parent's frame (tips stored pushed)."""
        pc, bc, gc = p_arr[c], b_arr[c], g_arr[c]
        # integrate x_c ~ N(m, Sigma_c), then substitute m = Q x_p + r
        p1, b1, g1 = _push_canonical_cov(pc, bc, gc, branch_sigma[c])
        q, r = branch_q[c], branch_r[c]
        pp = q.T @ p1 @ q
        pp = 0.5 * (pp + pp.T)
        bp = q.T @ (b1 - p1 @ r)
        gp = g1 + b1 @ r - 0.5 * (r @ (p1 @ r))
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

    p_r, b_r, g_r = _push_canonical_cov(
        p_arr[root], b_arr[root], g_arr[root], root_cov)
    mu0 = jnp.asarray(root_mean, dt)
    return g_r - 0.5 * (mu0 @ (p_r @ mu0)) + b_r @ mu0


def affine_gaussian_node_conditionals(
    tip_traits, tip_missing, parent, children, heights, root,
    branch_q, branch_r, branch_sigma, root_mean, root_cov,
):
    """Posterior mean and covariance of EVERY node state given the tips —
    upward canonical pass + downward conditioning pass (the tree-trait
    analog of AncestralStateBeagleTreeLikelihood, ref:
    continuous/TreeTraitProvider via fullConditionalDensity). Returns
    (means [M, D], covs [M, D, D])."""
    n, d = tip_traits.shape
    m = parent.shape[0]
    dt = tip_traits.dtype
    obs = (~tip_missing).astype(dt)

    def tip_self_message(i):
        """Canonical message about the TIP'S OWN state from its observed
        dims: infinite precision replaced by exact conditioning later;
        here: delta handled via large-precision-free route — the tip's own
        posterior is computed by conditioning parent posterior through the
        branch, so only (obs value, mask) are needed."""
        return obs[i]

    # upward pass identical to the likelihood
    def tip_message(i):
        o = obs[i]
        mask = jnp.outer(o, o)
        c_mat = branch_sigma[i] * mask + jnp.diag(1.0 - o)
        j_mat = jnp.linalg.inv(c_mat) * mask
        j_mat = 0.5 * (j_mat + j_mat.T)
        y = jnp.where(o > 0, tip_traits[i] - branch_r[i], 0.0)
        q = branch_q[i]
        p = q.T @ j_mat @ q
        b = q.T @ (j_mat @ y)
        g = jnp.asarray(0.0, dt)
        return 0.5 * (p + p.T), b, g

    p0, b0, g0 = jax.vmap(tip_message)(jnp.arange(n))
    p_up = jnp.zeros((m, d, d), dt).at[:n].set(p0)
    b_up = jnp.zeros((m, d), dt).at[:n].set(b0)

    order = peel_order_from_heights(heights, n, parent)

    def push_up(pc, bc, c):
        p1, b1, _ = _push_canonical_cov(pc, bc, jnp.asarray(0.0, dt),
                                        branch_sigma[c])
        q, r = branch_q[c], branch_r[c]
        pp = q.T @ p1 @ q
        bp = q.T @ (b1 - p1 @ r)
        is_tip = c < n
        sel = lambda a, b_: jnp.where(is_tip, a, b_)
        return sel(pc, 0.5 * (pp + pp.T)), sel(bc, bp)

    def up_step(carry, node):
        p_arr, b_arr = carry
        l = children[node, 0]
        r = children[node, 1]
        pl, blv = push_up(p_arr[l], b_arr[l], l)
        pr, brv = push_up(p_arr[r], b_arr[r], r)
        return (p_arr.at[node].set(pl + pr),
                b_arr.at[node].set(blv + brv)), None

    (p_up, b_up), _ = jax.lax.scan(up_step, (p_up, b_up), order)

    # downward: root posterior, then each child conditions on its parent
    eye = jnp.eye(d, dtype=dt)
    prior_prec = jnp.linalg.inv(root_cov)
    p_root = p_up[root] + prior_prec
    mu_root = jnp.linalg.solve(p_root, b_up[root] + prior_prec @ root_mean)
    cov_root = jnp.linalg.inv(p_root)

    means = jnp.zeros((m, d), dt).at[root].set(mu_root)
    covs = jnp.zeros((m, d, d), dt).at[root].set(cov_root)

    # process nodes root-downward: reverse of (order) then tips
    down_order = jnp.concatenate(
        [order[::-1], jnp.arange(n, dtype=jnp.int32)])

    def down_step(carry, c):
        """Exact marginal for node c = below-evidence canonical (p_up[c])
        + downward message. The downward message is the parent's marginal
        with c's OWN upward contribution removed (else evidence below c is
        double-counted), pushed down through the branch."""
        means, covs = carry
        par = parent[c]
        is_root = par < 0
        pi = jnp.maximum(par, 0)
        mu_p, v_p = means[pi], covs[pi]
        q, r, s = branch_q[c], branch_r[c], branch_sigma[c]
        is_tip = c < n
        ci = jnp.minimum(c, n - 1)

        # what c sent up: tips stored it pre-pushed; internals push now
        pc_up, bc_up = p_up[c], b_up[c]
        p1, b1, _ = _push_canonical_cov(pc_up, bc_up, jnp.asarray(0.0, dt),
                                        s)
        p_sent = jnp.where(is_tip, pc_up, q.T @ p1 @ q)
        b_sent = jnp.where(is_tip, bc_up, q.T @ (b1 - p1 @ r))

        p_full = jnp.linalg.inv(v_p)
        b_full = p_full @ mu_p
        p_ex = p_full - p_sent
        p_ex = 0.5 * (p_ex + p_ex.T) + 1e-10 * eye
        v_ex = jnp.linalg.inv(p_ex)
        mu_ex = v_ex @ (b_full - b_sent)

        # push the c-excluded parent marginal down through the branch
        mu_d = q @ mu_ex + r
        v_d = q @ v_ex @ q.T + s
        p_d = jnp.linalg.inv(0.5 * (v_d + v_d.T))

        # combine with below-evidence at c: internals use their upward
        # canonical; tips condition exactly on observed dims (delta),
        # missing dims follow the downward law
        o = obs[ci] * jnp.where(is_tip, 1.0, 0.0)
        y = jnp.where(o > 0, tip_traits[ci], 0.0)
        big = jnp.asarray(1e12, dt)
        p_below = jnp.where(is_tip, jnp.diag(o * big), pc_up)
        b_below = jnp.where(is_tip, o * big * y, bc_up)

        p_node = p_d + p_below
        p_node = 0.5 * (p_node + p_node.T)
        b_node = p_d @ mu_d + b_below
        v_node = jnp.linalg.inv(p_node)
        mu_node = v_node @ b_node
        sel = lambda a, b_: jnp.where(is_root, a, b_)
        means = means.at[c].set(sel(means[c], mu_node))
        covs = covs.at[c].set(sel(covs[c], v_node))
        return (means, covs), None

    (means, covs), _ = jax.lax.scan(down_step, (means, covs), down_order)
    return means, covs
