"""Model-layer tests with analytic oracles: coalescent densities,
birth-death, priors vs scipy, clock models, gamma discretization."""

import jax.numpy as jnp
import numpy as np
import scipy.stats as sps
from scipy.special import gammaln

from beast_mcmc_tpu.models import priors
from beast_mcmc_tpu.models.clock import (
    discretized_lognormal_rates,
    rate_epoch_rates,
    strict_clock_rates,
)
from beast_mcmc_tpu.models.coalescent import (
    coalescent_intervals,
    constant_coalescent_loglik,
    exponential_growth_loglik,
    gmrf_log_prior,
    skygrid_loglik,
)
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates, gamma_quantile
from beast_mcmc_tpu.models.speciation import birth_death_loglik, yule_loglik
from beast_mcmc_tpu.tree.topology import parse_newick


def three_taxon_tree():
    # ((a:1,b:1):1,c:2);  heights: a=b=c=0, internal=1, root=2
    return parse_newick("((a:1.0,b:1.0):1.0,c:2.0);")


def test_coalescent_intervals():
    parent, children, heights, root, taxa = three_taxon_tree()
    times, lineages, is_coal = coalescent_intervals(jnp.asarray(heights), 3)
    np.testing.assert_allclose(times, [0, 0, 0, 1, 2])
    np.testing.assert_array_equal(lineages, [1, 2, 3, 2, 1])
    np.testing.assert_array_equal(is_coal, [False, False, False, True, True])


def test_constant_coalescent_analytic():
    """Hand-computed: 3 lineages for t in [0,1] (rate 3/theta), 2 for
    [1,2] (rate 1/theta), 2 coalescent events."""
    parent, children, heights, root, taxa = three_taxon_tree()
    theta = 5.0
    ll = constant_coalescent_loglik(jnp.asarray(heights), 3, theta)
    expected = -(3.0 / theta) * 1.0 - (1.0 / theta) * 1.0 - 2 * np.log(theta)
    np.testing.assert_allclose(float(ll), expected, rtol=1e-12)


def test_exponential_growth_reduces_to_constant():
    parent, children, heights, root, taxa = three_taxon_tree()
    h = jnp.asarray(heights)
    ll0 = constant_coalescent_loglik(h, 3, 5.0)
    ll1 = exponential_growth_loglik(h, 3, 5.0, 0.0)
    np.testing.assert_allclose(float(ll0), float(ll1), rtol=1e-10)


def test_exponential_growth_analytic():
    parent, children, heights, root, taxa = three_taxon_tree()
    n0, r = 5.0, 0.5
    ll = exponential_growth_loglik(jnp.asarray(heights), 3, n0, r)
    lam = lambda t: (np.exp(r * t) - 1) / (r * n0)
    expected = (
        -3.0 * (lam(1) - lam(0))
        - 1.0 * (lam(2) - lam(1))
        - (np.log(n0) - r * 1.0)
        - (np.log(n0) - r * 2.0)
    )
    np.testing.assert_allclose(float(ll), expected, rtol=1e-10)


def test_skygrid_matches_constant_when_flat():
    parent, children, heights, root, taxa = three_taxon_tree()
    h = jnp.asarray(heights)
    theta = 5.0
    gammas = jnp.full(4, np.log(theta))
    cuts = jnp.array([0.5, 1.2, 1.7])
    ll_grid = skygrid_loglik(h, 3, gammas, cuts)
    ll_const = constant_coalescent_loglik(h, 3, theta)
    np.testing.assert_allclose(float(ll_grid), float(ll_const), rtol=1e-10)


def test_skygrid_piecewise_analytic():
    parent, children, heights, root, taxa = three_taxon_tree()
    h = jnp.asarray(heights)
    g = jnp.log(jnp.array([2.0, 8.0]))
    cuts = jnp.array([1.5])
    # intervals: [0,1] k=3 N=2; [1,1.5] k=2 N=2; [1.5,2] k=2 N=8
    expected = (
        -3.0 * 1.0 / 2.0
        - 1.0 * 0.5 / 2.0
        - 1.0 * 0.5 / 8.0
        - np.log(2.0)  # coal at t=1 in cell 0
        - np.log(8.0)  # coal at t=2 in cell 1
    )
    np.testing.assert_allclose(float(skygrid_loglik(h, 3, g, cuts)), expected, rtol=1e-10)


def test_gmrf_prior():
    g = jnp.array([1.0, 2.0, 4.0])
    tau = 3.0
    expected = 0.5 * 2 * (np.log(tau) - np.log(2 * np.pi)) - 0.5 * tau * (1 + 4)
    np.testing.assert_allclose(float(gmrf_log_prior(g, tau)), expected, rtol=1e-12)


def test_yule_analytic():
    """Yule on 3-taxon tree vs hand expansion of the Gernhard08 density
    (a=0, rho=1): logL = (n-1)log(r) + sum_internal(-r h) + (-r h_root)
    + labeled coeff 2^(n-1)/(n-1)!... with n! denominator."""
    parent, children, heights, root, taxa = three_taxon_tree()
    lam = 2.0
    ll = yule_loglik(jnp.asarray(heights), 3, root, lam, labeled=True)
    n = 3
    coeff = (n - 1) * np.log(2.0) - gammaln(n)
    expected = coeff + (n - 1) * np.log(lam) + (-lam * 1.0) + (-lam * 2.0) + (-lam * 2.0)
    np.testing.assert_allclose(float(ll), expected, rtol=1e-10)


def test_birth_death_finite_and_ordering():
    parent, children, heights, root, taxa = three_taxon_tree()
    h = jnp.asarray(heights)
    ll = birth_death_loglik(h, 3, root, 1.5, 0.4, 0.9)
    assert np.isfinite(float(ll))
    # Yule limit: a->0, rho->1 equals yule
    np.testing.assert_allclose(
        float(birth_death_loglik(h, 3, root, 2.0, 0.0, 1.0)),
        float(yule_loglik(h, 3, root, 2.0)),
        rtol=1e-12,
    )


def test_priors_vs_scipy():
    x = np.array([0.3, 1.7, 2.2])
    np.testing.assert_allclose(
        float(priors.normal_logpdf(x, 1.0, 2.0)),
        sps.norm.logpdf(x, 1, 2).sum(), rtol=1e-10)
    np.testing.assert_allclose(
        float(priors.lognormal_logpdf(x, 0.5, 1.2)),
        sps.lognorm.logpdf(x, 1.2, scale=np.exp(0.5)).sum(), rtol=1e-10)
    np.testing.assert_allclose(
        float(priors.gamma_logpdf(x, 2.0, 3.0)),
        sps.gamma.logpdf(x, 2.0, scale=3.0).sum(), rtol=1e-10)
    np.testing.assert_allclose(
        float(priors.exponential_logpdf(x, 2.5)),
        sps.expon.logpdf(x, scale=2.5).sum(), rtol=1e-10)
    np.testing.assert_allclose(
        float(priors.beta_logpdf(np.array([0.3]), 2.0, 5.0)),
        sps.beta.logpdf(0.3, 2, 5), rtol=1e-10)
    np.testing.assert_allclose(
        float(priors.inverse_gamma_logpdf(x, 3.0, 2.0)),
        sps.invgamma.logpdf(x, 3.0, scale=2.0).sum(), rtol=1e-10)
    np.testing.assert_allclose(
        float(priors.laplace_logpdf(x, 1.0, 0.7)),
        sps.laplace.logpdf(x, 1.0, 0.7).sum(), rtol=1e-10)
    np.testing.assert_allclose(
        float(priors.dirichlet_logpdf(np.array([0.2, 0.3, 0.5]), np.array([1.0, 2.0, 3.0]))),
        sps.dirichlet.logpdf([0.2, 0.3, 0.5], [1, 2, 3]), rtol=1e-10)
    np.testing.assert_allclose(
        float(priors.poisson_logpmf(np.array([3.0]), 2.0)),
        sps.poisson.logpmf(3, 2.0), rtol=1e-10)
    # out of support
    assert float(priors.gamma_logpdf(np.array([-1.0]), 2.0, 3.0)) == -np.inf
    assert float(priors.uniform_logpdf(np.array([5.0]), 0.0, 1.0)) == -np.inf


def test_gamma_quantile_vs_scipy():
    p = jnp.array([0.125, 0.375, 0.625, 0.875])
    for a in [0.05, 0.137064, 0.5, 1.0, 2.0, 10.0]:
        q = gamma_quantile(p, a, 1.0 / a)
        expected = sps.gamma.ppf(np.asarray(p), a, scale=1.0 / a)
        np.testing.assert_allclose(np.asarray(q), expected, rtol=1e-9)


def test_gamma_rates_mean_one():
    rates, weights = discrete_gamma_rates(0.3, 4)
    np.testing.assert_allclose(float(jnp.dot(rates, weights)), 1.0, rtol=1e-12)
    rates, weights = discrete_gamma_rates(0.7, 4, p_invariant=0.3)
    np.testing.assert_allclose(float(jnp.dot(rates, weights)), 1.0, rtol=1e-12)
    assert float(rates[0]) == 0.0
    np.testing.assert_allclose(float(weights.sum()), 1.0, rtol=1e-12)


def test_clock_models():
    rates = strict_clock_rates(0.003, 9)
    np.testing.assert_allclose(rates, 0.003)

    cats = jnp.array([0, 1, 2, 3, 4, 5, 6, 7, 0], jnp.int32)
    r = discretized_lognormal_rates(cats, mean=1.0, stdev=0.5, n_categories=8)
    assert r.shape == (9,)
    # rates increase with category; lognormal quantiles are ordered
    assert np.all(np.diff(np.asarray(r[:8])) > 0)
    # mean of discretized distribution approximates real-space mean
    big = discretized_lognormal_rates(jnp.arange(1000, dtype=jnp.int32), 1.0, 0.5)
    np.testing.assert_allclose(float(big.mean()), 1.0, rtol=1e-3)


def test_epoch_clock():
    parent, children, heights, root, taxa = three_taxon_tree()
    # epochs: rate 1 for t<1.5, rate 3 after
    r = rate_epoch_rates(
        jnp.asarray(heights), jnp.asarray(parent),
        jnp.array([1.5]), jnp.array([1.0, 3.0]),
    )
    # tip c: branch 0->2 spans [0,2]: avg = (1.5*1 + 0.5*3)/2 = 1.5
    np.testing.assert_allclose(float(r[2]), 1.5, rtol=1e-12)
    # tips a,b: [0,1] rate 1
    np.testing.assert_allclose(float(r[0]), 1.0, rtol=1e-12)
    # the (a,b) ancestor spans [1,2]: avg = (0.5*1+0.5*3)/1 = 2
    ab_anc = int(parent[0])
    np.testing.assert_allclose(float(r[ab_anc]), 2.0, rtol=1e-12)
