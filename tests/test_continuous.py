"""Continuous-trait (Brownian) likelihood vs dense matrix-normal oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.continuous import (
    brownian_loglikelihood,
    brownian_tip_covariance,
)
from beast_mcmc_tpu.tree.topology import parse_newick, simulate_coalescent_tree

from fixtures import PRIMATE_NEWICK, PRIMATE_TAXA


def dense_mvn_loglik(x, mean, sigma, precision):
    """Matrix-normal density: vec(X) ~ N(mean, Sigma kron Lambda^{-1})."""
    n, d = x.shape
    diff = x - mean
    sinv = np.linalg.inv(sigma)
    _, logdet_s = np.linalg.slogdet(sigma)
    _, logdet_p = np.linalg.slogdet(precision)
    quad = np.trace(precision @ diff.T @ sinv @ diff)
    return -0.5 * (n * d * np.log(2 * np.pi) + d * logdet_s - n * logdet_p + quad)


def setup_tree():
    return parse_newick(PRIMATE_NEWICK, taxa=PRIMATE_TAXA)


def test_brownian_conjugate_root_vs_dense():
    parent, children, heights, root, taxa = setup_tree()
    rng = np.random.default_rng(0)
    d = 3
    traits = rng.normal(size=(6, d))
    a = rng.normal(size=(d, d))
    precision = a @ a.T + np.eye(d)
    mean0 = np.array([0.3, -0.2, 0.1])
    k0 = 2.5

    ll = brownian_loglikelihood(
        jnp.asarray(traits), jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, jnp.asarray(precision),
        root_prior_mean=jnp.asarray(mean0), root_prior_sample_size=k0)

    sigma = brownian_tip_covariance(parent, children, heights, root, 6,
                                    root_prior_sample_size=k0)
    expected = dense_mvn_loglik(traits, mean0, sigma, precision)
    np.testing.assert_allclose(float(ll), expected, rtol=1e-10)


def test_brownian_relaxed_random_walk_scalars():
    """Per-branch rate scalars (relaxed random walk) change the covariance
    consistently with the dense oracle."""
    parent, children, heights, root, taxa = setup_tree()
    rng = np.random.default_rng(1)
    m = len(parent)
    scalars = rng.uniform(0.5, 2.0, size=m)
    traits = rng.normal(size=(6, 2))
    precision = np.eye(2) * 1.7
    ll = brownian_loglikelihood(
        jnp.asarray(traits), jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, jnp.asarray(precision),
        branch_rate_scalars=jnp.asarray(scalars),
        root_prior_mean=jnp.zeros(2), root_prior_sample_size=1.0)
    sigma = brownian_tip_covariance(parent, children, heights, root, 6,
                                    branch_rate_scalars=scalars,
                                    root_prior_sample_size=1.0)
    expected = dense_mvn_loglik(traits, np.zeros(2), sigma, precision)
    np.testing.assert_allclose(float(ll), expected, rtol=1e-10)


def test_brownian_gradients():
    """Gradients wrt heights and precision (for HMC on diffusion params)."""
    parent, children, heights, root, taxa = setup_tree()
    rng = np.random.default_rng(2)
    traits = jnp.asarray(rng.normal(size=(6, 2)))

    def ll_h(h):
        return brownian_loglikelihood(
            traits, jnp.asarray(parent), jnp.asarray(children), h, root,
            jnp.eye(2) * 2.0, root_prior_mean=jnp.zeros(2),
            root_prior_sample_size=1.0)

    h0 = jnp.asarray(heights)
    g = jax.grad(ll_h)(h0)
    eps = 1e-6
    for i in [7, 9]:
        fd = (ll_h(h0.at[i].add(eps)) - ll_h(h0.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-5)


def test_brownian_big_tree_runs():
    parent, children, heights, root = simulate_coalescent_tree(
        np.random.default_rng(3), np.zeros(200), 1.0)
    traits = np.random.default_rng(4).normal(size=(200, 2))
    ll = jax.jit(lambda t, h: brownian_loglikelihood(
        t, jnp.asarray(parent), jnp.asarray(children), h, root,
        jnp.eye(2), root_prior_mean=jnp.zeros(2),
        root_prior_sample_size=0.5))(jnp.asarray(traits), jnp.asarray(heights))
    assert np.isfinite(float(ll))
