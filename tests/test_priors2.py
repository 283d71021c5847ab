"""Round-2 distribution breadth vs scipy.stats oracles (ref:
src/dr/math/distributions/*.java — each repo function cites its class).
scipy is the independent implementation the reference's own unit tests
compare against (MathUtils-based tables)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import beast_mcmc_tpu.models.priors as P

X = np.array([0.3, 1.2, 2.7])


def s(v):
    return float(np.sum(v))


def test_chi_square():
    assert float(P.chi_square_logpdf(X, 3.0)) == pytest.approx(
        s(st.chi2.logpdf(X, 3.0)), rel=1e-6)


def test_student_t_loc_scale():
    assert float(P.t_logpdf(X, 4.0, loc=0.5, scale=2.0)) == pytest.approx(
        s(st.t.logpdf(X, 4.0, loc=0.5, scale=2.0)), rel=1e-6)


def test_cauchy():
    assert float(P.cauchy_logpdf(X, 0.2, 1.5)) == pytest.approx(
        s(st.cauchy.logpdf(X, 0.2, 1.5)), rel=1e-6)


def test_logistic():
    assert float(P.logistic_logpdf(X, 0.5, 1.3)) == pytest.approx(
        s(st.logistic.logpdf(X, 0.5, 1.3)), rel=1e-6)


def test_weibull():
    assert float(P.weibull_logpdf(X, 1.7, 2.2)) == pytest.approx(
        s(st.weibull_min.logpdf(X, 1.7, scale=2.2)), rel=1e-6)


def test_gumbel2():
    # Gumbel-II(a, b) == invweibull(c=a, scale=b^(1/a))
    a, b = 2.0, 1.5
    assert float(P.gumbel2_logpdf(X, a, b)) == pytest.approx(
        s(st.invweibull.logpdf(X, a, scale=b ** (1 / a))), rel=1e-6)


def test_half_normal():
    assert float(P.half_normal_logpdf(X, 1.4)) == pytest.approx(
        s(st.halfnorm.logpdf(X, scale=1.4)), rel=1e-6)


def test_pareto():
    assert float(P.pareto_logpdf(X + 1.0, 0.5, 2.5)) == pytest.approx(
        s(st.pareto.logpdf(X + 1.0, 2.5, scale=0.5)), rel=1e-6)
    assert float(P.pareto_logpdf(0.2, 0.5, 2.5)) == -np.inf


def test_inverse_gaussian():
    mu, lam = 1.3, 2.0
    assert float(P.inverse_gaussian_logpdf(X, mu, lam)) == pytest.approx(
        s(st.invgauss.logpdf(X, mu / lam, scale=lam)), rel=1e-6)


def test_truncated_normal():
    lo, hi = 0.5, 3.0
    a, b = (lo - 1.0) / 0.8, (hi - 1.0) / 0.8
    assert float(
        P.truncated_normal_logpdf(X, 1.0, 0.8, lo, hi)
    ) == pytest.approx(
        s(st.truncnorm.logpdf(X, a, b, loc=1.0, scale=0.8)), rel=1e-5)
    assert float(P.truncated_normal_logpdf(0.1, 1.0, 0.8, lo, hi)) == -np.inf


def test_reflected_normal_integrates_to_one():
    lo, hi = -1.0, 2.0
    t = np.linspace(lo, hi, 20001)
    dens = np.exp([
        float(P.reflected_normal_logpdf(v, 0.7, 0.9, lo, hi)) for v in t])
    assert np.trapezoid(dens, t) == pytest.approx(1.0, abs=1e-4)


def test_negative_binomial():
    k = np.array([0.0, 2.0, 7.0])
    mu, alpha = 3.0, 0.5
    r = 1.0 / alpha
    p = r / (r + mu)
    assert float(P.negative_binomial_logpmf(k, mu, alpha)) == pytest.approx(
        s(st.nbinom.logpmf(k, r, p)), rel=1e-6)


def test_geometric():
    k = np.array([0.0, 1.0, 5.0])
    # scipy geom counts trials (k>=1); shift
    assert float(P.geometric_logpmf(k, 0.3)) == pytest.approx(
        s(st.geom.logpmf(k + 1, 0.3)), rel=1e-6)


def test_binomial():
    k = np.array([0.0, 3.0, 10.0])
    assert float(P.binomial_logpmf(k, 10, 0.35)) == pytest.approx(
        s(st.binom.logpmf(k, 10, 0.35)), rel=1e-6)


def test_discrete_uniform():
    assert float(P.discrete_uniform_logpmf(3, 1, 6)) == pytest.approx(
        np.log(1 / 6), rel=1e-6)
    assert float(P.discrete_uniform_logpmf(7, 1, 6)) == -np.inf


def test_ar1_normal_vs_dense_mvn():
    n, s_, rho = 6, 1.3, 0.6
    idx = np.arange(n)
    cov = s_ ** 2 * rho ** np.abs(idx[:, None] - idx[None, :])
    x = np.array([0.3, -0.5, 1.2, 0.1, -1.0, 0.7])
    oracle = st.multivariate_normal.logpdf(x, mean=np.zeros(n), cov=cov)
    assert float(P.ar1_normal_logpdf(x, s_, rho)) == pytest.approx(
        oracle, rel=1e-6)


def test_normal_kde_vs_scipy():
    rng = np.random.default_rng(5)
    samples = rng.normal(1.0, 2.0, size=400)
    h = 1.06 * samples.std() * 400 ** (-0.2)
    kde = st.gaussian_kde(samples, bw_method=h / samples.std(ddof=1))
    ours = float(P.normal_kde_logpdf(X, samples, h))
    assert ours == pytest.approx(s(kde.logpdf(X)), rel=1e-4)


def test_log_transformed_kde_integrates_to_one():
    rng = np.random.default_rng(6)
    samples = np.exp(rng.normal(0.0, 0.5, size=300))
    t = np.linspace(1e-3, 15.0, 30001)
    dens = np.exp(np.asarray(
        [float(P.log_transformed_normal_kde_logpdf(v, samples))
         for v in t[::100]]))
    # coarse check: density positive and finite
    assert np.all(np.isfinite(dens)) and np.all(dens >= 0)
    full = np.exp([
        float(P.log_transformed_normal_kde_logpdf(v, samples))
        for v in np.linspace(0.05, 8.0, 400)])
    area = np.trapezoid(full, np.linspace(0.05, 8.0, 400))
    assert area == pytest.approx(1.0, abs=0.05)


def test_logit_transformed_kde_integrates_to_one():
    rng = np.random.default_rng(7)
    samples = 1 / (1 + np.exp(-rng.normal(0.3, 0.8, size=300)))
    t = np.linspace(0.01, 0.99, 400)
    dens = np.exp([
        float(P.logit_transformed_normal_kde_logpdf(v, samples))
        for v in t])
    assert np.trapezoid(dens, t) == pytest.approx(1.0, abs=0.05)
