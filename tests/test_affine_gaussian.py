"""The general affine-Gaussian tree kernel vs the specialized kernels and
dense-MVN oracles (ref behavior: cdi/SafeMultivariateIntegrator.java,
SafeMultivariateActualizedWithDriftIntegrator.java)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beast_mcmc_tpu.models.continuous import (
    affine_gaussian_tree_loglikelihood,
    affine_gaussian_node_conditionals,
    brownian_loglikelihood,
    brownian_loglikelihood_missing,
    ou_loglikelihood,
)

jax.config.update("jax_enable_x64", True)


def _tree5():
    # ((A:2,(B:1,C:1):1):2,(D:3,E:3):1); tips 0..4, internals 5..8
    parent = np.array([6, 5, 5, 7, 7, 6, 8, 8, -1])
    children = np.array(
        [[-1, -1]] * 5 + [[1, 2], [0, 5], [3, 4], [6, 7]])
    heights = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0, 4.0])
    root = 8
    return parent, children, heights, root


def _branches(parent, heights):
    m = len(parent)
    return np.where(parent >= 0,
                    heights[np.maximum(parent, 0)] - heights, 0.0)


def _bm_qrs(parent, heights, lam, d):
    m = len(parent)
    bl = _branches(parent, heights)
    v = np.linalg.inv(lam)
    q = np.broadcast_to(np.eye(d), (m, d, d))
    r = np.zeros((m, d))
    s = bl[:, None, None] * v[None]
    return jnp.asarray(q), jnp.asarray(r), jnp.asarray(s)


def test_bm_matches_brownian_missing():
    rng = np.random.default_rng(0)
    parent, children, heights, root = _tree5()
    d = 3
    y = rng.normal(size=(5, d))
    miss = np.zeros((5, d), bool)
    miss[1, 0] = miss[3, 2] = True
    a = rng.normal(size=(d, d))
    lam = a @ a.T + d * np.eye(d)
    k0, mu0 = 7.0, np.array([0.3, -0.2, 1.0])

    q, r, s = _bm_qrs(parent, heights, lam, d)
    got = affine_gaussian_tree_loglikelihood(
        jnp.asarray(y), jnp.asarray(miss), jnp.asarray(parent),
        jnp.asarray(children), jnp.asarray(heights), root,
        q, r, s, jnp.asarray(mu0), jnp.linalg.inv(jnp.asarray(lam)) / k0)
    want = brownian_loglikelihood_missing(
        jnp.asarray(y), jnp.asarray(miss), jnp.asarray(parent),
        jnp.asarray(children), jnp.asarray(heights), root,
        jnp.asarray(lam), root_prior_mean=jnp.asarray(mu0),
        root_prior_sample_size=k0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_bm_complete_matches_scalar_kernel():
    rng = np.random.default_rng(1)
    parent, children, heights, root = _tree5()
    d = 2
    y = rng.normal(size=(5, d))
    a = rng.normal(size=(d, d))
    lam = a @ a.T + d * np.eye(d)
    k0, mu0 = 3.0, np.array([0.1, 0.2])
    q, r, s = _bm_qrs(parent, heights, lam, d)
    got = affine_gaussian_tree_loglikelihood(
        jnp.asarray(y), jnp.zeros((5, d), bool), jnp.asarray(parent),
        jnp.asarray(children), jnp.asarray(heights), root,
        q, r, s, jnp.asarray(mu0), jnp.linalg.inv(jnp.asarray(lam)) / k0)
    want = brownian_loglikelihood(
        jnp.asarray(y), jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, jnp.asarray(lam),
        root_prior_mean=jnp.asarray(mu0), root_prior_sample_size=k0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_ou_scalar_matches_ou_kernel():
    rng = np.random.default_rng(2)
    parent, children, heights, root = _tree5()
    d = 2
    y = rng.normal(size=(5, d))
    a = rng.normal(size=(d, d))
    lam = a @ a.T + d * np.eye(d)
    v = np.linalg.inv(lam)
    alpha = 0.7
    theta = np.array([0.5, -1.0])
    bl = _branches(parent, heights)
    m = len(parent)
    qs = np.exp(-alpha * bl)
    gam = (1.0 - np.exp(-2 * alpha * bl)) / (2 * alpha)
    q = qs[:, None, None] * np.eye(d)[None]
    r = (1.0 - qs)[:, None] * theta[None]
    s = gam[:, None, None] * v[None]
    got = affine_gaussian_tree_loglikelihood(
        jnp.asarray(y), jnp.zeros((5, d), bool), jnp.asarray(parent),
        jnp.asarray(children), jnp.asarray(heights), root,
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(s),
        jnp.asarray(theta), jnp.asarray(v / (2 * alpha)))
    want = ou_loglikelihood(
        jnp.asarray(y), jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, jnp.asarray(lam), alpha,
        jnp.asarray(theta), stationary_root=True)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-9)


def _dense_joint(parent, heights, root, q, r, s, mu0, v0, n, d):
    """Host oracle: propagate exact joint mean/cov of all node states
    root-down, then read the tip block."""
    m = len(parent)
    order = [root]
    # root-down order
    kids = {i: [] for i in range(m)}
    for i in range(m):
        if parent[i] >= 0:
            kids[parent[i]].append(i)
    stack = [root]
    topo = []
    while stack:
        x = stack.pop()
        topo.append(x)
        stack.extend(kids[x])
    mean = np.zeros((m, d))
    cov = np.zeros((m, m, d, d))  # cross-node covariance blocks
    mean[root] = mu0
    cov[root, root] = v0
    for x in topo:
        if x == root:
            continue
        p = parent[x]
        mean[x] = q[x] @ mean[p] + r[x]
        for yz in topo:
            if yz == x:
                continue
            cov[x, yz] = q[x] @ cov[p, yz]
            cov[yz, x] = cov[x, yz].T
        cov[x, x] = q[x] @ cov[p, p] @ q[x].T + s[x]
    mu_t = mean[:n].reshape(-1)
    sig = np.zeros((n * d, n * d))
    for i in range(n):
        for j in range(n):
            sig[i * d:(i + 1) * d, j * d:(j + 1) * d] = cov[i, j]
    return mu_t, sig, mean, cov


def test_general_affine_vs_dense_mvn():
    """Random per-branch (Q, r, Sigma) — no special structure at all."""
    rng = np.random.default_rng(3)
    parent, children, heights, root = _tree5()
    n, d, m = 5, 2, 9
    y = rng.normal(size=(n, d))
    q = rng.normal(size=(m, d, d)) * 0.4 + np.eye(d)
    r = rng.normal(size=(m, d)) * 0.3
    s = np.zeros((m, d, d))
    for i in range(m):
        a = rng.normal(size=(d, d)) * 0.5
        s[i] = a @ a.T + 0.2 * np.eye(d)
    mu0 = rng.normal(size=d)
    a = rng.normal(size=(d, d)) * 0.5
    v0 = a @ a.T + 0.5 * np.eye(d)

    mu_t, sig, _, _ = _dense_joint(
        parent, heights, root, q, r, s, mu0, v0, n, d)
    from scipy.stats import multivariate_normal
    want = multivariate_normal.logpdf(y.reshape(-1), mu_t, sig)

    got = affine_gaussian_tree_loglikelihood(
        jnp.asarray(y), jnp.zeros((n, d), bool), jnp.asarray(parent),
        jnp.asarray(children), jnp.asarray(heights), root,
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(s),
        jnp.asarray(mu0), jnp.asarray(v0))
    np.testing.assert_allclose(float(got), want, rtol=1e-9)


def test_node_conditionals_vs_dense():
    """Posterior node means/covs against the dense-Gaussian conditional."""
    rng = np.random.default_rng(4)
    parent, children, heights, root = _tree5()
    n, d, m = 5, 2, 9
    y = rng.normal(size=(n, d))
    miss = np.zeros((n, d), bool)
    miss[2, 1] = True
    q = rng.normal(size=(m, d, d)) * 0.3 + np.eye(d)
    r = rng.normal(size=(m, d)) * 0.2
    s = np.zeros((m, d, d))
    for i in range(m):
        a = rng.normal(size=(d, d)) * 0.4
        s[i] = a @ a.T + 0.3 * np.eye(d)
    mu0 = rng.normal(size=d)
    v0 = 0.8 * np.eye(d)

    # dense joint over ALL nodes
    _, _, mean_all, cov_all = _dense_joint(
        parent, heights, root, q, r, s, mu0, v0, n, d)
    flat_idx = [(i, k) for i in range(n) for k in range(d)
                if not miss[i, k]]
    obs_vec = np.array([y[i, k] for i, k in flat_idx])
    mu_o = np.array([mean_all[i][k] for i, k in flat_idx])
    sig_oo = np.array([[cov_all[i1, i2][k1, k2]
                        for i2, k2 in flat_idx] for i1, k1 in flat_idx])

    means, covs = affine_gaussian_node_conditionals(
        jnp.asarray(y), jnp.asarray(miss), jnp.asarray(parent),
        jnp.asarray(children), jnp.asarray(heights), root,
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(s),
        jnp.asarray(mu0), jnp.asarray(v0))

    sol = np.linalg.solve(sig_oo, obs_vec - mu_o)
    for node in range(m):
        cross = np.array([[cov_all[node, i2][k1, k2]
                           for i2, k2 in flat_idx] for k1 in range(d)])
        want_mean = mean_all[node] + cross @ sol
        np.testing.assert_allclose(
            np.asarray(means)[node], want_mean, rtol=1e-5, atol=1e-6,
            err_msg=f"node {node}")
        want_cov = cov_all[node, node] - cross @ np.linalg.solve(
            sig_oo, cross.T)
        np.testing.assert_allclose(
            np.asarray(covs)[node], want_cov, rtol=1e-4, atol=1e-6,
            err_msg=f"node {node} cov")
