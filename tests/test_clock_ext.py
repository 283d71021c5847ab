"""Clock-model breadth: local clocks, autocorrelated/shrinkage priors,
mixture rates, latent-state occupancy (ref: dr.evomodel.branchratemodel —
RandomLocalClockModel, AutoCorrelatedBranchRatesDistribution,
shrinkage/AutoCorrelatedRatesWithBayesianBridge, MixtureModelBranchRates,
LatentStateBranchRateModel)."""

import numpy as np
import jax.numpy as jnp
import pytest

from beast_mcmc_tpu.models.clock import (
    ancestor_or_self_mask,
    autocorrelated_rates_log_density,
    latent_state_branch_rates,
    local_clock_rates,
    lognormal_mixture_cdf,
    lognormal_quantile,
    mixture_model_rates,
    random_local_clock_rates,
    shrinkage_local_clock_log_density,
    two_state_occupancy_log_density,
)
from beast_mcmc_tpu.models.priors import (
    bayesian_bridge_logpdf,
    half_t_logpdf,
    inverse_wishart_logpdf,
    lkj_logpdf,
    multivariate_normal_logpdf,
    wishart_logpdf,
)
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree


def _random_tree(n_taxa, seed=0):
    rng = np.random.default_rng(seed)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n_taxa), pop_size=1.0
    )
    return np.asarray(parent), np.asarray(heights), int(root)


def _rlc_oracle(parent, heights, indicators, rates, mean_rate, multipliers,
                threshold=0.5):
    """Direct reimplementation of the reference recursion
    (RandomLocalClockModel.java:179-240) as a numpy oracle."""
    m = len(parent)
    children = [[] for _ in range(m)]
    root = -1
    for i, p in enumerate(parent):
        if p < 0:
            root = i
        else:
            children[p].append(i)
    unscaled = np.zeros(m)

    def rec(node, rate):
        if parent[node] >= 0 and indicators[node] > threshold:
            rate = rate * rates[node] if multipliers else rates[node]
        unscaled[node] = rate
        for c in children[node]:
            rec(c, rate)

    rec(root, 1.0)
    t = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0)
    scale = t.sum() / (t * unscaled).sum() * mean_rate
    return unscaled * scale


@pytest.mark.parametrize("multipliers", [False, True])
def test_random_local_clock_matches_recursion(multipliers):
    parent, heights, root = _random_tree(20, seed=1)
    m = len(parent)
    rng = np.random.default_rng(2)
    indicators = (rng.random(m) < 0.3).astype(float)
    rates = rng.lognormal(0.0, 0.5, m)
    got = random_local_clock_rates(
        jnp.asarray(parent), jnp.asarray(heights), jnp.asarray(indicators),
        jnp.asarray(rates), mean_rate=1.7,
        rates_are_multipliers=multipliers,
    )
    want = _rlc_oracle(parent, heights, indicators, rates, 1.7, multipliers)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_random_local_clock_all_off_is_strict():
    parent, heights, root = _random_tree(12, seed=3)
    m = len(parent)
    got = random_local_clock_rates(
        jnp.asarray(parent), jnp.asarray(heights), jnp.zeros(m),
        jnp.ones(m) * 5.0, mean_rate=2.5,
    )
    t = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0)
    np.testing.assert_allclose(np.asarray(got), 2.5, rtol=1e-12)


def test_local_clock_clade_assignment():
    parent, heights, root = _random_tree(10, seed=4)
    m = len(parent)
    # pick an internal node, give its subtree clock 1
    internal = [i for i in range(m) if i != root and (np.asarray(parent) == i).any()]
    mrca = internal[0]
    mask = np.asarray(ancestor_or_self_mask(jnp.asarray(parent), mrca))
    assert mask[mrca]
    # every masked node's path hits mrca
    for i in np.where(mask)[0]:
        j, seen = int(i), False
        while j >= 0:
            if j == mrca:
                seen = True
            j = parent[j]
        assert seen
    assignment = mask.astype(int)
    rates = local_clock_rates(jnp.asarray(assignment), jnp.asarray([1.0, 3.0]))
    np.testing.assert_allclose(np.asarray(rates), np.where(mask, 3.0, 1.0))


def test_autocorrelated_density_matches_manual():
    parent, heights, root = _random_tree(8, seed=5)
    m = len(parent)
    rng = np.random.default_rng(6)
    log_rates = rng.normal(0, 0.3, m)
    prec = 4.0
    got = autocorrelated_rates_log_density(
        jnp.asarray(parent), jnp.asarray(heights), jnp.asarray(log_rates), prec
    )
    want = 0.0
    for i in range(m):
        if parent[i] < 0:
            continue
        t = heights[parent[i]] - heights[i]
        var = t / prec
        inc = log_rates[i] - log_rates[parent[i]]
        want += -0.5 * (np.log(2 * np.pi * var) + inc * inc / var)
    np.testing.assert_allclose(float(got), want, rtol=1e-10)


def test_bayesian_bridge_normalises():
    # 1-D numeric integral of exp(logpdf) over a wide grid ~ 1
    x = np.linspace(-60, 60, 400001)
    lp = np.asarray(bayesian_bridge_logpdf(jnp.asarray(x), 0.7, 0.5,
                                           reduce=False))
    integral = np.trapezoid(np.exp(lp), x)
    assert abs(integral - 1.0) < 1e-3


def test_shrinkage_local_clock_density_finite_and_peaked_at_zero():
    parent, heights, root = _random_tree(10, seed=7)
    m = len(parent)
    flat = shrinkage_local_clock_log_density(
        jnp.asarray(parent), jnp.asarray(heights), jnp.zeros(m), 0.1
    )
    bumpy = shrinkage_local_clock_log_density(
        jnp.asarray(parent), jnp.asarray(heights),
        jnp.asarray(np.random.default_rng(8).normal(0, 1, m)), 0.1
    )
    assert np.isfinite(float(flat)) and float(flat) > float(bumpy)


def test_mixture_rates_single_component_matches_lognormal_quantile():
    q = jnp.asarray([0.1, 0.5, 0.9])
    got = mixture_model_rates(q, jnp.asarray([1.0]), jnp.asarray([2.0]),
                              jnp.asarray([0.6]))
    want = lognormal_quantile(q, 2.0, 0.6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-8)


def test_mixture_rates_inverts_cdf():
    q = jnp.asarray([0.05, 0.3, 0.5, 0.77, 0.99])
    w = jnp.asarray([0.3, 0.7])
    means = jnp.asarray([0.5, 4.0])
    sds = jnp.asarray([0.4, 0.8])
    r = mixture_model_rates(q, w, means, sds)
    c = lognormal_mixture_cdf(r, w, means, sds)
    np.testing.assert_allclose(np.asarray(c), np.asarray(q), atol=1e-9)


def test_latent_rates():
    r = latent_state_branch_rates(jnp.asarray([2.0, 3.0]),
                                  jnp.asarray([0.5, 0.0]))
    np.testing.assert_allclose(np.asarray(r), [1.0, 3.0])


def test_two_state_occupancy_normalises():
    # atom + integral of density over proportion in (0,1) == 1
    a, b, t = 0.8, 1.3, 2.0
    p = np.linspace(1e-6, 1 - 1e-6, 20001)
    lp = [
        float(two_state_occupancy_log_density(
            jnp.asarray([t]), jnp.asarray([pi]), a, b,
            condition_on_active_end=False))
        for pi in p[:: 400]
    ]
    # fine grid via vectorised call
    lps = np.asarray([
        float(two_state_occupancy_log_density(
            jnp.asarray([t]), jnp.asarray([pi]), a, b,
            condition_on_active_end=False))
        for pi in p[::100]
    ])
    grid = p[::100]
    integral = np.trapezoid(np.exp(lps), grid)
    atom = np.exp(-a * t)
    assert abs(integral + atom - 1.0) < 2e-3


def test_two_state_occupancy_matches_monte_carlo():
    a, b, t = 0.9, 1.1, 1.5
    rng = np.random.default_rng(11)
    n = 200_000
    occ = np.zeros(n)
    for i in range(n):
        time, state, v = 0.0, 0, 0.0
        while True:
            rate = a if state == 0 else b
            dt = rng.exponential(1.0 / rate)
            if time + dt >= t:
                if state == 1:
                    v += t - time
                break
            if state == 1:
                v += dt
            state ^= 1
            time += dt
        occ[i] = v / t
    # compare density in a few bins
    bins = np.asarray([0.1, 0.3, 0.5, 0.7])
    width = 0.05
    for c in bins:
        emp = np.mean((occ > c - width / 2) & (occ < c + width / 2)) / width
        model = np.exp(float(two_state_occupancy_log_density(
            jnp.asarray([t]), jnp.asarray([c]), a, b,
            condition_on_active_end=False)))
        assert abs(emp - model) < 0.12 * max(model, 0.3), (c, emp, model)


def test_wishart_matches_scipy():
    from scipy.stats import invwishart, wishart

    rng = np.random.default_rng(12)
    A = rng.normal(size=(3, 3))
    w = A @ A.T + 3 * np.eye(3)
    S = np.eye(3) * 0.8
    got = float(wishart_logpdf(jnp.asarray(w), 5.0, jnp.asarray(S)))
    want = wishart.logpdf(w, df=5, scale=S)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    got_iw = float(inverse_wishart_logpdf(jnp.asarray(w), 5.0, jnp.asarray(S)))
    want_iw = invwishart.logpdf(w, df=5, scale=S)
    np.testing.assert_allclose(got_iw, want_iw, rtol=1e-9)


def test_mvn_and_lkj_and_half_t():
    from tests.scipy_free_mvn import mvn_logpdf as oracle

    rng = np.random.default_rng(13)
    A = rng.normal(size=(4, 4))
    cov = A @ A.T + 4 * np.eye(4)
    x = rng.normal(size=4)
    mean = rng.normal(size=4)
    got = float(multivariate_normal_logpdf(jnp.asarray(x), jnp.asarray(mean),
                                           covariance=jnp.asarray(cov)))
    np.testing.assert_allclose(got, oracle(x, mean, cov), rtol=1e-10)
    got_p = float(multivariate_normal_logpdf(
        jnp.asarray(x), jnp.asarray(mean),
        precision=jnp.asarray(np.linalg.inv(cov))))
    np.testing.assert_allclose(got_p, got, rtol=1e-8)

    # LKJ: shape=1 is uniform over correlation matrices -> logdet term 0
    corr = np.eye(3)
    assert float(lkj_logpdf(jnp.asarray(corr), 1.0)) == 0.0

    # half-Cauchy normalises on [0, inf)
    x = np.linspace(1e-9, 4000, 2000001)
    lp = np.asarray([0.0])
    from scipy.stats import halfcauchy
    got_ht = float(half_t_logpdf(jnp.asarray([1.3]), 2.0, df=1.0))
    np.testing.assert_allclose(got_ht, halfcauchy.logpdf(1.3, scale=2.0),
                               rtol=1e-9)
