"""GMRF skyride oracles (VERDICT r1 item 9; ref:
GMRFSkyrideLikelihood.java:57).

  - constant field == constant coalescent (analytic equivalence)
  - hand-computed 3-taxon skyride density
  - time-aware GMRF weights against the hand formula
  - piecewise-exponential and cataclysm demographics vs numerical
    integration of the generic coalescent density
"""

import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.coalescent import (
    cataclysm_loglik,
    constant_coalescent_loglik,
    gmrf_skyride_loglik,
    gmrf_skyride_time_aware_prior,
    gmrf_skyride_uniform_prior,
    piecewise_exponential_loglik,
)


def _tree3():
    # 3 contemporaneous tips; coalescences at 1.0 and 2.5
    heights = jnp.asarray([0.0, 0.0, 0.0, 1.0, 2.5])
    return heights, 3


def test_skyride_constant_field_equals_constant_coalescent():
    heights, n = _tree3()
    pop = 7.3
    lp = gmrf_skyride_loglik(heights, n, jnp.full((n - 1,), np.log(pop)))
    ref = constant_coalescent_loglik(heights, n, pop)
    np.testing.assert_allclose(float(lp), float(ref), rtol=1e-12)


def test_skyride_hand_computed():
    heights, n = _tree3()
    g = np.array([0.4, -0.3])  # log N on (0,1.0] and (1.0,2.5]
    lp = gmrf_skyride_loglik(heights, n, jnp.asarray(g))
    # intervals: k=3 over (0,1) with N=e^g0; k=2 over (1,2.5) with N=e^g1
    want = (
        -3.0 * 1.0 * np.exp(-g[0]) - g[0]
        - 1.0 * 1.5 * np.exp(-g[1]) - g[1]
    )
    np.testing.assert_allclose(float(lp), want, rtol=1e-10)


def test_time_aware_prior_hand_computed():
    heights, n = _tree3()
    g = np.array([0.4, -0.3])
    tau = 2.0
    lp = gmrf_skyride_time_aware_prior(heights, n, jnp.asarray(g), tau)
    # coalescent interval durations: delta = [1.0, 1.5]; w = 2/(1+1.5)
    w = 2.0 / 2.5
    want = 0.5 * (2 - 1) * np.log(tau) - 0.5 * tau * (g[1] - g[0]) ** 2 * w
    np.testing.assert_allclose(float(lp), want, rtol=1e-10)
    lp_u = gmrf_skyride_uniform_prior(jnp.asarray(g), tau)
    want_u = 0.5 * np.log(tau) - 0.5 * tau * (g[1] - g[0]) ** 2
    np.testing.assert_allclose(float(lp_u), want_u, rtol=1e-10)


def _numeric_coalescent(heights, n_taxa, pop_fn):
    """Numerical-integration reference for any N(t)."""
    hs = np.asarray(heights)
    events = np.sort(hs)  # all tips zero here
    coal = np.sort(hs[n_taxa:])
    logl = -np.sum(np.log(pop_fn(coal)))
    # integrate C(k,2)/N over time by fine quadrature
    grid_end = coal[-1]
    ts = np.linspace(0, grid_end, 400001)
    k = np.array([n_taxa - np.searchsorted(coal, t, side="right")
                  for t in ts]) + 0  # lineages after passing coal events
    kk = np.maximum(k, 1)
    integrand = kk * (kk - 1) / 2.0 / pop_fn(ts)
    logl -= np.trapezoid(integrand, ts)
    return logl


def test_piecewise_exponential_vs_numeric():
    heights = jnp.asarray([0.0, 0.0, 0.0, 0.0, 3.0, 11.0, 26.0])
    n = 4
    thetas = np.array([5.0, 9.0, 4.0])
    lam = 0.05
    widths = np.array([8.0, 10.0])

    def pop_fn(t):
        t = np.asarray(t, float)
        starts = np.array([0.0, 8.0, 18.0])
        e = np.clip(np.searchsorted(starts[1:], t, side="right"), 0, 2)
        return thetas[e] * np.exp(-lam * (t - starts[e]))

    lp = piecewise_exponential_loglik(
        heights, n, jnp.asarray(thetas), jnp.asarray([lam]),
        jnp.asarray(widths),
    )
    want = _numeric_coalescent(heights, n, pop_fn)
    np.testing.assert_allclose(float(lp), want, rtol=1e-5)


def test_cataclysm_vs_numeric():
    heights = jnp.asarray([0.0, 0.0, 0.0, 0.0, 2.0, 6.0, 14.0])
    n = 4
    n0, r, spike, tc = 10.0, 0.15, 3.0, 5.0
    d = np.log(spike) / tc

    def pop_fn(t):
        t = np.asarray(t, float)
        before = n0 * np.exp(t * d)
        after = (n0 * spike) * np.exp(-(t - tc) * r)
        return np.where(t < tc, before, after)

    lp = cataclysm_loglik(heights, n, n0, r, spike, tc)
    want = _numeric_coalescent(heights, n, pop_fn)
    np.testing.assert_allclose(float(lp), want, rtol=1e-5)


def test_linear_skyline_vs_numeric():
    """Piecewise-linear BSP against numerical integration (ref:
    BayesianSkylineLikelihood.java LINEAR_TYPE)."""
    from beast_mcmc_tpu.models.coalescent import (
        bayesian_skyline_linear_loglik,
    )

    heights = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 2.0, 5.0, 9.0, 14.0])
    n = 5
    pops = np.array([4.0, 9.0, 6.0])  # K=2 groups -> K+1 sizes
    groups = np.array([2, 2])
    # group 0 spans events (0, 5]; group 1 spans (5, 14]
    starts = np.array([0.0, 5.0])
    ends = np.array([5.0, 14.0])

    def pop_fn(t):
        t = np.atleast_1d(np.asarray(t, float))
        g = np.clip(np.searchsorted(ends, t, side="left"), 0, 1)
        frac = np.clip((t - starts[g]) / (ends[g] - starts[g]), 0, 1)
        return pops[g] * (1 - frac) + pops[g + 1] * frac

    lp = bayesian_skyline_linear_loglik(
        heights, n, jnp.asarray(pops), jnp.asarray(groups)
    )
    want = _numeric_coalescent(heights, n, pop_fn)
    np.testing.assert_allclose(float(lp), want, rtol=1e-5)


def test_ebsp_constant_equivalence_and_gradient():
    """EBSP field oracles (ref: VariableDemographicModel.java): all
    indicators off + equal knot values == independent constant
    coalescents; ploidy scales Ne; gradients finite."""
    import jax

    from beast_mcmc_tpu.models.coalescent import ebsp_coalescent_loglik

    h1 = jnp.asarray([0.0, 0.0, 0.0, 1.0, 2.5])
    h2 = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.7, 1.9, 4.0])
    pop = 6.0
    vals = jnp.full((5,), pop)
    ind = jnp.zeros((4,))
    got = float(ebsp_coalescent_loglik([h1, h2], [3, 4], [1.0, 1.0],
                                       vals, ind))
    want = float(
        constant_coalescent_loglik(h1, 3, pop)
        + constant_coalescent_loglik(h2, 4, pop)
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)
    got2 = float(ebsp_coalescent_loglik([h1], [3], [2.0],
                                        jnp.full((2,), pop), jnp.zeros(1)))
    want2 = float(constant_coalescent_loglik(h1, 3, 2 * pop))
    np.testing.assert_allclose(got2, want2, rtol=1e-10)
    # indicator-selected linear segment changes the density smoothly
    g = jax.grad(
        lambda v: ebsp_coalescent_loglik([h1, h2], [3, 4], [1.0, 1.0],
                                         v, jnp.asarray([1.0, 0, 0, 1.0]))
    )(vals * jnp.asarray([1.0, 2.0, 1.0, 0.5, 1.0]))
    assert np.all(np.isfinite(np.asarray(g)))
