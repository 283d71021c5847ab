"""OU / drift / missing-data continuous-trait likelihood tests.

Oracle strategy (same as the reference's DataLikelihoodTester cross-checks
and the existing Brownian tests): every belief-propagation likelihood must
match the dense multivariate-normal density over the tip traits computed
from first principles (Kronecker tree-covariance x diffusion covariance).
"""

import jax.numpy as jnp
import numpy as np
from scipy_free_mvn import mvn_logpdf  # local helper below

from beast_mcmc_tpu.models.continuous import (
    brownian_loglikelihood,
    brownian_loglikelihood_missing,
    brownian_tip_covariance,
    drift_brownian_loglikelihood,
    ou_loglikelihood,
)
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree


def setup_tree(n=6, seed=0):
    rng = np.random.default_rng(seed)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n), 1.0
    )
    return parent, children, heights, root, rng


def random_spd(d, rng):
    a = rng.normal(size=(d, d))
    return a @ a.T + d * np.eye(d)


def kron_mvn_logpdf(y, mean, sigma_tree, lam_inv):
    """Dense MVN over vec(tips) with cov = sigma_tree (x) lam_inv."""
    cov = np.kron(sigma_tree, lam_inv)
    return mvn_logpdf(y.reshape(-1), mean.reshape(-1), cov)


def test_drift_matches_dense_oracle():
    n, d = 6, 3
    parent, children, heights, root, rng = setup_tree(n)
    prec = random_spd(d, rng)
    lam_inv = np.linalg.inv(prec)
    k0 = 2.0
    mean0 = rng.normal(size=d)
    drift = rng.normal(size=(2 * n - 1, d)) * 0.5
    traits = rng.normal(size=(n, d))

    got = float(
        drift_brownian_loglikelihood(
            jnp.asarray(traits), jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), root, jnp.asarray(prec), jnp.asarray(drift),
            root_prior_mean=jnp.asarray(mean0), root_prior_sample_size=k0,
        )
    )
    # oracle: mean_i = mean0 + sum of drift*t along root->tip path
    sigma = brownian_tip_covariance(
        parent, children, heights, root, n, root_prior_sample_size=k0
    )
    bl = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0)
    means = np.zeros((n, d))
    for i in range(n):
        j = i
        mu = mean0.copy()
        while parent[j] >= 0:
            mu += drift[j] * bl[j]
            j = parent[j]
        means[i] = mu
    ref = kron_mvn_logpdf(traits, means, sigma, lam_inv)
    np.testing.assert_allclose(got, ref, rtol=1e-8)


def test_ou_matches_stationary_dense_oracle():
    n, d = 6, 2
    parent, children, heights, root, rng = setup_tree(n, seed=3)
    prec = random_spd(d, rng)
    lam_inv = np.linalg.inv(prec)
    alpha = 0.8
    theta = rng.normal(size=d)
    traits = rng.normal(size=(n, d))

    got = float(
        ou_loglikelihood(
            jnp.asarray(traits), jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), root, jnp.asarray(prec), alpha,
            jnp.asarray(theta), stationary_root=True,
        )
    )
    # stationary OU: cov(x_i, x_j) = exp(-alpha * d_ij) / (2 alpha) * lam_inv
    def depth_to(i):
        path = {}
        t = 0.0
        j = i
        while parent[j] >= 0:
            path[j] = t
            t += heights[parent[j]] - heights[j]
            j = parent[j]
        path[j] = t
        return path

    # patristic distance via heights: d_ij = (h_a - h_i) + (h_a - h_j),
    # a = MRCA
    def ancestors(i):
        out = []
        j = i
        while j >= 0:
            out.append(j)
            j = parent[j]
        return out

    sigma = np.zeros((n, n))
    for i in range(n):
        ai = ancestors(i)
        for j in range(n):
            aj = set(ancestors(j))
            mrca = next(a for a in ai if a in aj)
            dij = (heights[mrca] - heights[i]) + (heights[mrca] - heights[j])
            sigma[i, j] = np.exp(-alpha * dij) / (2 * alpha)
    ref = kron_mvn_logpdf(
        traits, np.tile(theta, (n, 1)), sigma, lam_inv
    )
    np.testing.assert_allclose(got, ref, rtol=1e-8)


def test_ou_small_alpha_approaches_brownian_contrasts():
    """alpha -> 0 with a matching root prior: OU(k0 = 2 alpha weight) and
    Brownian agree in the limit (sanity, loose tolerance)."""
    n, d = 5, 2
    parent, children, heights, root, rng = setup_tree(n, seed=9)
    prec = random_spd(d, rng)
    traits = rng.normal(size=(n, d))
    alpha = 1e-5
    got = float(
        ou_loglikelihood(
            jnp.asarray(traits), jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), root, jnp.asarray(prec), alpha,
            jnp.zeros(d), stationary_root=False, root_prior_sample_size=3.0,
        )
    )
    ref = float(
        brownian_loglikelihood(
            jnp.asarray(traits), jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), root, jnp.asarray(prec),
            root_prior_mean=jnp.zeros(d), root_prior_sample_size=3.0,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3)


def test_missing_none_matches_scalar_path():
    n, d = 6, 3
    parent, children, heights, root, rng = setup_tree(n, seed=5)
    prec = random_spd(d, rng)
    traits = rng.normal(size=(n, d))
    k0 = 1.5
    mean0 = rng.normal(size=d)
    got = float(
        brownian_loglikelihood_missing(
            jnp.asarray(traits), jnp.zeros((n, d), bool),
            jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights),
            root, jnp.asarray(prec),
            root_prior_mean=jnp.asarray(mean0), root_prior_sample_size=k0,
        )
    )
    ref = float(
        brownian_loglikelihood(
            jnp.asarray(traits), jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), root, jnp.asarray(prec),
            root_prior_mean=jnp.asarray(mean0), root_prior_sample_size=k0,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_missing_matches_marginalized_dense_oracle():
    n, d = 6, 3
    parent, children, heights, root, rng = setup_tree(n, seed=7)
    prec = random_spd(d, rng)
    lam_inv = np.linalg.inv(prec)
    traits = rng.normal(size=(n, d))
    missing = rng.random((n, d)) < 0.3
    missing[0] = [True, True, True]  # a fully missing tip
    missing[1] = [False, False, False]
    k0 = 2.0
    mean0 = rng.normal(size=d)

    got = float(
        brownian_loglikelihood_missing(
            jnp.asarray(traits), jnp.asarray(missing),
            jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights),
            root, jnp.asarray(prec),
            root_prior_mean=jnp.asarray(mean0), root_prior_sample_size=k0,
        )
    )
    sigma = brownian_tip_covariance(
        parent, children, heights, root, n, root_prior_sample_size=k0
    )
    cov = np.kron(sigma, lam_inv)
    mean = np.tile(mean0, n)
    keep = (~missing).reshape(-1)
    ref = mvn_logpdf(
        traits.reshape(-1)[keep], mean[keep], cov[np.ix_(keep, keep)]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-8)
