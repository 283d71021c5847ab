"""GLM regression likelihoods (ref: LinearRegression.java:53-66,
LogisticRegression.java:64-77, LogLinearModel.java, RegressionJNIWrapper
.java BSCCS role) and the smooth skygrid (SmoothSkygridLikelihood
.java:427-459) against hand/brute-force oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.models.coalescent import (
    skygrid_loglik,
    smooth_skygrid_loglik,
)
from beast_mcmc_tpu.models.regression import (
    glm_loglik,
    linear_regression_loglik,
    log_linear_loglik,
    logistic_regression_loglik,
    sccs_conditional_loglik,
)

RNG = np.random.default_rng(11)
N, P = 40, 3
X = jnp.asarray(RNG.normal(size=(N, P)))
BETA = jnp.asarray([0.5, -1.2, 0.3])


def test_linear_regression_matches_normal_logpdf():
    prec = 2.5
    y = np.asarray(X @ BETA) + RNG.normal(size=N) / np.sqrt(prec)
    mu = np.asarray(X @ BETA)
    oracle = np.sum(
        0.5 * np.log(prec) - 0.5 * np.log(2 * np.pi)
        - 0.5 * prec * (y - mu) ** 2)
    ll = linear_regression_loglik(jnp.asarray(y), X, BETA, prec)
    assert float(ll) == pytest.approx(oracle, rel=1e-6)


def test_linear_regression_log_transform_jacobian():
    prec = 1.7
    y = np.exp(np.asarray(X @ BETA) + RNG.normal(size=N))
    mu = np.asarray(X @ BETA)
    ly = np.log(y)
    oracle = np.sum(
        -ly + 0.5 * np.log(prec) - 0.5 * np.log(2 * np.pi)
        - 0.5 * prec * (ly - mu) ** 2)
    ll = linear_regression_loglik(
        jnp.asarray(y), X, BETA, prec, log_transform=True)
    assert float(ll) == pytest.approx(oracle, rel=1e-6)


def test_logistic_regression_matches_bernoulli():
    eta = np.asarray(X @ BETA)
    p = 1 / (1 + np.exp(-eta))
    y = (RNG.uniform(size=N) < p).astype(float)
    oracle = np.sum(y * np.log(p) + (1 - y) * np.log1p(-p))
    ll = logistic_regression_loglik(jnp.asarray(y), X, BETA)
    assert float(ll) == pytest.approx(oracle, rel=1e-6)


def test_log_linear_matches_poisson():
    from math import lgamma

    eta = np.asarray(X @ BETA) * 0.4
    lam = np.exp(eta)
    y = RNG.poisson(lam).astype(float)
    oracle = np.sum(
        y * np.log(lam) - lam - np.array([lgamma(v + 1) for v in y]))
    ll = log_linear_loglik(jnp.asarray(y), X, 0.4 * BETA)
    assert float(ll) == pytest.approx(oracle, rel=1e-6)


def test_glm_dispatch_and_gradient():
    y = jnp.asarray((RNG.uniform(size=N) < 0.5).astype(float))
    ll = glm_loglik("logistic", y, X, BETA)
    g = jax.grad(lambda b: glm_loglik("logistic", y, X, b))(BETA)
    # logistic score: X^T (y - sigmoid(Xb))
    resid = np.asarray(y) - 1 / (1 + np.exp(-np.asarray(X @ BETA)))
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(X).T @ resid, rtol=1e-5)
    with pytest.raises(ValueError):
        glm_loglik("nope", y, X, BETA)


def test_sccs_conditional_is_multinomial():
    """2 cases x 3 intervals: the conditional likelihood must equal the
    multinomial over intervals with probs tau*e^{xb} / sum."""
    counts = np.array([[2.0, 1.0, 0.0], [0.0, 3.0, 1.0]])
    design = RNG.normal(size=(2, 3, 2))
    beta = np.array([0.7, -0.4])
    tau = np.array([[1.0, 2.0, 0.5], [1.5, 1.0, 1.0]])
    eta = design @ beta + np.log(tau)
    probs = np.exp(eta) / np.exp(eta).sum(axis=1, keepdims=True)
    oracle = np.sum(counts * np.log(probs))
    ll = sccs_conditional_loglik(
        jnp.asarray(counts), jnp.asarray(design), jnp.asarray(beta),
        jnp.asarray(np.log(tau)))
    assert float(ll) == pytest.approx(oracle, rel=1e-6)


# ---------------------------------------------------------------------------
# smooth skygrid
# ---------------------------------------------------------------------------

HEIGHTS = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.5, 1.0, 2.0])
GAMMA = jnp.asarray([0.1, -0.3, 0.5])
CUTS = jnp.asarray([0.7, 1.5])


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -500, 500)))


def test_smooth_skygrid_sharp_limit_is_classic_skygrid():
    ll_sharp = smooth_skygrid_loglik(HEIGHTS, 4, GAMMA, CUTS, 4000.0)
    ll_classic = skygrid_loglik(HEIGHTS, 4, GAMMA, CUTS)
    assert float(ll_sharp) == pytest.approx(float(ll_classic), abs=5e-4)


@pytest.mark.parametrize("rate", [2.0, 5.0, 20.0])
def test_smooth_skygrid_vs_bruteforce_integral(rate):
    t = np.linspace(0.0, 2.0, 400001)
    tips = np.zeros(4)
    ints = np.array([0.5, 1.0, 2.0])
    k = (_sigmoid(rate * (t[:, None] - tips)).sum(1)
         - _sigmoid(rate * (t[:, None] - ints)).sum(1))
    invp = np.exp(-np.asarray(GAMMA))
    steps = invp[1:] - invp[:-1]
    invn = invp[0] + (steps * _sigmoid(
        rate * (t[:, None] - np.asarray(CUTS)))).sum(1)
    integral = np.trapezoid(0.5 * k * (k - 1) * invn, t)
    ev = np.sum(np.log(invp[0] + (steps * _sigmoid(
        rate * (ints[:, None] - np.asarray(CUTS)))).sum(1)))
    oracle = ev - integral
    ll = smooth_skygrid_loglik(HEIGHTS, 4, GAMMA, CUTS, rate)
    assert float(ll) == pytest.approx(oracle, abs=2e-5)


def test_smooth_skygrid_gradients_finite():
    def f(gam, heights):
        return smooth_skygrid_loglik(heights, 4, gam, CUTS, 8.0)

    g_gam = jax.grad(f, argnums=0)(GAMMA, HEIGHTS)
    g_h = jax.grad(f, argnums=1)(GAMMA, HEIGHTS)
    assert bool(jnp.all(jnp.isfinite(g_gam)))
    assert bool(jnp.all(jnp.isfinite(g_h)))
    # FD check on gamma[1]
    eps = 1e-5
    gp = GAMMA.at[1].add(eps)
    gm = GAMMA.at[1].add(-eps)
    fd = (float(f(gp, HEIGHTS)) - float(f(gm, HEIGHTS))) / (2 * eps)
    assert float(g_gam[1]) == pytest.approx(fd, rel=1e-3, abs=1e-6)
