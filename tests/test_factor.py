"""Integrated factor analysis vs dense marginal-MVN oracle.

Oracle: with factors integrated out, vec(Y) is MVN with
Cov(y_ia, y_jb) = Sigma_tree[i,j] * (L^T Lambda^{-1} L)[a,b]
                  + delta_ij delta_ab / gamma_a
and mean_i = L^T mean0 (ref: IntegratedFactorAnalysisLikelihood.java).
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import multivariate_normal

from beast_mcmc_tpu.models.continuous import brownian_tip_covariance
from beast_mcmc_tpu.models.factor import (
    integrated_factor_loglikelihood,
)
from beast_mcmc_tpu.tree.topology import parse_newick

from fixtures import PRIMATE_NEWICK, PRIMATE_TAXA


def _setup(k=2, p=5, seed=0, lam_scale=None):
    parent, children, heights, root, taxa = parse_newick(
        PRIMATE_NEWICK, taxa=PRIMATE_TAXA)
    n = len(taxa)
    rng = np.random.default_rng(seed)
    loadings = rng.normal(size=(k, p))
    gamma = rng.uniform(0.5, 3.0, size=p)
    data = rng.normal(size=(n, p))
    mean0 = rng.normal(size=k) * 0.3
    k0 = 1.7
    if lam_scale is None:
        lam = np.eye(k)
    else:
        a = rng.normal(size=(k, k)) * lam_scale
        lam = a @ a.T + np.eye(k)
    return (parent, children, heights, root, n, loadings, gamma, data,
            mean0, k0, lam)


def _oracle(parent, children, heights, root, n, loadings, gamma, data,
            mean0, k0, lam, missing):
    sig_tree = brownian_tip_covariance(
        parent, children, heights, root, n, root_prior_sample_size=k0)
    lsl = loadings.T @ np.linalg.inv(lam) @ loadings
    cov = np.kron(sig_tree, lsl) + np.kron(np.eye(n), np.diag(1.0 / gamma))
    mean = np.tile(loadings.T @ mean0, n)
    y = data.reshape(-1)
    keep = ~missing.reshape(-1)
    return multivariate_normal.logpdf(
        y[keep], mean[keep], cov[np.ix_(keep, keep)])


def test_factor_loglik_vs_dense_identity_lambda():
    (parent, children, heights, root, n, loadings, gamma, data,
     mean0, k0, lam) = _setup()
    missing = np.zeros_like(data, dtype=bool)
    got = integrated_factor_loglikelihood(
        jnp.asarray(data), jnp.asarray(missing), parent, children,
        jnp.asarray(heights), root, jnp.asarray(loadings),
        jnp.asarray(gamma), root_prior_mean=jnp.asarray(mean0),
        root_prior_sample_size=k0)
    want = _oracle(parent, children, heights, root, n, loadings, gamma,
                   data, mean0, k0, lam, missing)
    np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_factor_loglik_missing_entries_and_dense_lambda():
    (parent, children, heights, root, n, loadings, gamma, data,
     mean0, k0, lam) = _setup(k=3, p=4, seed=3, lam_scale=0.4)
    rng = np.random.default_rng(7)
    missing = rng.uniform(size=data.shape) < 0.3
    missing[0] = False  # keep at least one fully-observed tip
    got = integrated_factor_loglikelihood(
        jnp.asarray(data), jnp.asarray(missing), parent, children,
        jnp.asarray(heights), root, jnp.asarray(loadings),
        jnp.asarray(gamma), factor_precision=jnp.asarray(lam),
        root_prior_mean=jnp.asarray(mean0), root_prior_sample_size=k0)
    want = _oracle(parent, children, heights, root, n, loadings, gamma,
                   data, mean0, k0, lam, missing)
    np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_factor_loadings_gradient_finite_diff():
    (parent, children, heights, root, n, loadings, gamma, data,
     mean0, k0, lam) = _setup(k=2, p=3, seed=5)
    missing = np.zeros_like(data, dtype=bool)

    def f(l):
        return integrated_factor_loglikelihood(
            jnp.asarray(data), jnp.asarray(missing), parent, children,
            jnp.asarray(heights), root, l, jnp.asarray(gamma),
            root_prior_sample_size=k0)

    g = jax.grad(f)(jnp.asarray(loadings))
    eps = 1e-6
    for idx in [(0, 0), (1, 2), (0, 1)]:
        lp = loadings.copy(); lp[idx] += eps
        lm = loadings.copy(); lm[idx] -= eps
        fd = (float(f(jnp.asarray(lp))) - float(f(jnp.asarray(lm)))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), fd, rtol=1e-4)
