"""Round-2 parametric demographics vs brute-force oracles.

Each oracle evaluates the REFERENCE's N(t) definition (getDemographic,
cited per test) with scipy.integrate.quad for the intensity integral and
builds the coalescent log density directly:
  logL = -sum_k C(k,2) int_{t_i}^{t_{i+1}} dt/N(t) - sum_coal log N(t_c),
so any disagreement is a bug in the family's closed form, not in the
test. Tree: 4 serially-sampled taxa (tips at 0.1..0.4 so linear/power-law
N(0)=0 singularities are avoided), coalescences at 0.6, 1.1, 2.3.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad

from beast_mcmc_tpu.models import coalescent as C

HEIGHTS = jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.6, 1.1, 2.3])
N_TAXA = 4


def oracle_loglik(pop_fn):
    """Direct numeric coalescent density for any N(t)."""
    times = np.asarray([0.1, 0.2, 0.3, 0.4, 0.6, 1.1, 2.3])
    deltas = np.asarray([1, 1, 1, 1, -1, -1, -1])
    order = np.argsort(times, kind="stable")
    times, deltas = times[order], deltas[order]
    lineages = np.cumsum(deltas)
    ll = 0.0
    for i in range(len(times) - 1):
        k = lineages[i]
        integ, _ = quad(lambda t: 1.0 / pop_fn(t), times[i], times[i + 1],
                        limit=200)
        ll -= k * (k - 1) / 2.0 * integ
    for t, d in zip(times, deltas):
        if d < 0:
            ll -= np.log(pop_fn(t))
    return ll


def check(ll, pop_fn, tol=1e-5):
    assert float(ll) == pytest.approx(oracle_loglik(pop_fn), abs=tol)


def test_const_exponential():
    """ref: ConstExponential.java:getDemographic."""
    n0, n1, r = 3.0, 0.8, 1.2
    t_sw = np.log(n0 / n1) / r

    def pop(t):
        return n0 * np.exp(-r * t) if t < t_sw else n1

    check(C.const_exponential_loglik(HEIGHTS, N_TAXA, n0, n1, r), pop)


def test_exp_constant():
    """ref: ExpConstant.java:getDemographic."""
    n0, r, tc = 2.0, 0.9, 0.7

    def pop(t):
        return n0 * np.exp(-r * tc) if t < tc else n0 * np.exp(-r * t)

    check(C.exp_constant_loglik(HEIGHTS, N_TAXA, n0, r, tc), pop)


def test_const_logistic():
    """ref: ConstLogistic.java:getDemographic."""
    n0, n1, r, c = 3.0, 0.5, 1.5, 0.2

    def pop(t):
        e = np.exp(-r * t)
        return n1 + (n0 - n1) * (1 + c) * e / (c + e)

    check(C.const_logistic_loglik(HEIGHTS, N_TAXA, n0, n1, r, c), pop)


def test_linear_growth():
    """ref: LinearGrowth.java (negative-time convention flipped)."""
    slope = 2.5
    check(C.linear_growth_loglik(HEIGHTS, N_TAXA, slope),
          lambda t: slope * t)


def test_power_law_growth():
    """ref: PowerLawGrowth.java:getDemographic/getIntegral."""
    n0, r = 1.8, 1.6
    check(C.power_law_growth_loglik(HEIGHTS, N_TAXA, n0, r),
          lambda t: n0 * t ** r)


def test_flexible_growth():
    """ref: FlexibleGrowth.java:getDemographic/getIntegral."""
    n0, kk, r = 1.5, 2.0, 1.8

    def pop(t):
        return n0 * kk * t ** r / (1 + kk * t ** (r - 1))

    check(C.flexible_growth_loglik(HEIGHTS, N_TAXA, n0, kk, r), pop)


def test_multi_epoch_exponential():
    """ref: MultiEpochExponential.java:getDemographic."""
    n0 = 2.0
    rates = np.array([1.0, -0.5, 0.8])
    tts = np.array([0.5, 1.2])

    def pop(t):
        logd, last, ep = 0.0, 0.0, 0
        while ep < len(tts) and t > tts[ep]:
            logd += -rates[ep] * (tts[ep] - last)
            last = tts[ep]
            ep += 1
        logd += -rates[ep] * (t - last)
        return n0 * np.exp(logd)

    check(C.multi_epoch_exponential_loglik(HEIGHTS, N_TAXA, n0, rates, tts),
          pop)


def test_multi_epoch_zero_rate_limit():
    n0 = 2.0
    rates = np.array([0.0, 0.7])
    tts = np.array([0.8])

    def pop(t):
        if t <= 0.8:
            return n0
        return n0 * np.exp(-0.7 * (t - 0.8))

    check(C.multi_epoch_exponential_loglik(HEIGHTS, N_TAXA, n0, rates, tts),
          pop)


def test_exponential_sawtooth():
    """ref: ExponentialSawtooth.java:getDemographic (t + offset*wl,
    wrapped mod wl, exponential within each cycle)."""
    n0, r, wl, off = 2.0, 1.1, 0.9, 0.3

    def pop(t):
        ts = (t + off * wl) % wl
        return n0 * np.exp(-r * ts)

    check(C.exponential_sawtooth_loglik(HEIGHTS, N_TAXA, n0, r, wl, off),
          pop)


def test_exponential_logistic():
    """ref: ExponentialLogistic.java:getDemographic (logistic recent,
    exponential decline past the transition; the reference integrates
    numerically too)."""
    n0, r, t50, r1, tt = 2.5, 1.3, 0.9, 0.6, 1.0
    # ref setTime50 mapping: c = 1/(exp(r t50) - 2); N(t50) = N0/2 exactly
    c = 1.0 / (np.exp(r * t50) - 2.0)

    def logistic(t):
        return n0 * (1 + c) / (1 + c * np.exp(r * t))

    def pop(t):
        return logistic(t) if t < tt else logistic(tt) * np.exp(
            -r1 * (t - tt))

    check(C.exponential_logistic_loglik(
        HEIGHTS, N_TAXA, n0, r, t50, r1, tt), pop, tol=1e-4)


def test_generic_quad_engine_matches_closed_form():
    """quad_interval_integral on the exponential family must agree with
    the closed-form exponential_growth_loglik."""
    n0, r = 2.0, 0.8

    def log_pop(t):
        return jnp.log(n0) - r * t

    ll_quad = C.coalescent_loglik_integral(
        HEIGHTS, N_TAXA, log_pop, C.quad_interval_integral(log_pop))
    ll_closed = C.exponential_growth_loglik(HEIGHTS, N_TAXA, n0, r)
    assert float(ll_quad) == pytest.approx(float(ll_closed), abs=1e-8)
