"""Oracle tests for the round-4 distribution additions (VERDICT r3
item 10 — distribution breadth with scipy/quad oracles)."""

import numpy as np
import pytest
from scipy import integrate, stats

import jax.numpy as jnp

from beast_mcmc_tpu.models.priors import (
    frechet_logpdf,
    kumaraswamy_logpdf,
    marginalized_alpha_stable_logpdf,
    multivariate_lognormal_logpdf,
    multivariate_t_logpdf,
    point_mass_mixture_logpmf,
)


def test_multivariate_t_matches_scipy():
    rng = np.random.default_rng(0)
    d = 3
    a = rng.normal(size=(d, d))
    sig = a @ a.T + d * np.eye(d)
    mu = rng.normal(size=d)
    x = rng.normal(size=d)
    want = stats.multivariate_t(loc=mu, shape=sig, df=4.5).logpdf(x)
    got = float(multivariate_t_logpdf(jnp.asarray(x), mu, sig, 4.5))
    assert abs(got - want) < 1e-5


def test_multivariate_lognormal_change_of_variables():
    rng = np.random.default_rng(1)
    d = 2
    prec = np.array([[2.0, 0.3], [0.3, 1.5]])
    mu = np.array([0.1, -0.2])
    x = np.abs(rng.normal(size=d)) + 0.5
    want = (stats.multivariate_normal(
        mean=mu, cov=np.linalg.inv(prec)).logpdf(np.log(x))
        - np.sum(np.log(x)))
    got = float(multivariate_lognormal_logpdf(jnp.asarray(x), mu, prec))
    assert abs(got - want) < 1e-5


def test_kumaraswamy_normalizes_and_matches_formula():
    a, b = 2.0, 3.0
    z, _ = integrate.quad(
        lambda x: np.exp(float(kumaraswamy_logpdf(jnp.asarray(x), a, b))),
        0.0, 1.0)
    assert abs(z - 1.0) < 1e-6
    # closed-form check at a point
    x = 0.37
    want = np.log(a * b) + (a - 1) * np.log(x) + (b - 1) * np.log1p(
        -x ** a)
    assert abs(float(kumaraswamy_logpdf(jnp.asarray(x), a, b)) - want) < 1e-9


def test_marginalized_alpha_stable_formula():
    # ref: MarginalizedAlphaStableDistribution.java:81-83
    x, scale, alpha = 1.3, 0.7, 1.2
    want = -np.log(scale) - (abs(x) / scale) ** alpha
    got = float(marginalized_alpha_stable_logpdf(
        jnp.asarray(x), scale, alpha))
    assert abs(got - want) < 1e-9


def test_point_mass_mixture():
    values = np.array([[1.0, 2.0], [3.0, 4.0], [1.0, 2.0]])
    probs = np.array([0.2, 0.5, 0.3])
    got = float(point_mass_mixture_logpmf(
        jnp.asarray([1.0, 2.0]), probs, values))
    assert abs(np.exp(got) - 0.5) < 1e-12
    got2 = float(point_mass_mixture_logpmf(
        jnp.asarray([3.0, 4.0]), probs, values))
    assert abs(np.exp(got2) - 0.5) < 1e-12
    assert float(point_mass_mixture_logpmf(
        jnp.asarray([9.0, 9.0]), probs, values)) < -600


def test_frechet_matches_scipy():
    a, s = 2.5, 1.7
    x = 2.2
    want = stats.invweibull(c=a, scale=s).logpdf(x)
    got = float(frechet_logpdf(jnp.asarray(x), a, s))
    assert abs(got - want) < 1e-6
