"""Full antigenic (HI-assay) likelihood oracles (VERDICT r1 missing #10b;
ref: AntigenicLikelihood.java:520-660, NewAntigenicLikelihood.java:53)."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.mds import (
    MEASUREMENT_INTERVAL,
    MEASUREMENT_LOWER_THRESHOLD,
    MEASUREMENT_POINT,
    MEASUREMENT_UPPER_THRESHOLD,
    antigenic_drift_prior,
    antigenic_loglikelihood,
)


def _erf(x):
    return np.vectorize(lambda v: float(jax.scipy.special.erf(v)))(x)


def _cdf(x, m, s):
    return 0.5 * (1 + _erf((x - m) / (s * np.sqrt(2))))


def test_antigenic_point_threshold_interval_oracle():
    rng = np.random.default_rng(0)
    V, S, D, M = 4, 3, 2, 12
    vloc = rng.normal(size=(V, D))
    sloc = rng.normal(size=(S, D))
    vi = rng.integers(0, V, M)
    si = rng.integers(0, S, M)
    pot = rng.normal(8.0, 1.0, S)
    avi = rng.normal(0.0, 0.5, V)
    drift, prec = 0.3, 2.0
    voff = rng.uniform(0, 5, V)
    soff = rng.uniform(0, 5, S)
    y = rng.normal(6.0, 2.0, M)
    types = np.array([MEASUREMENT_POINT, MEASUREMENT_LOWER_THRESHOLD,
                      MEASUREMENT_UPPER_THRESHOLD, MEASUREMENT_INTERVAL] * 3)

    got = float(antigenic_loglikelihood(
        jnp.asarray(y), jnp.asarray(types), jnp.asarray(vi), jnp.asarray(si),
        jnp.asarray(vloc), jnp.asarray(sloc), jnp.asarray(pot), prec,
        jnp.asarray(avi), drift, jnp.asarray(voff), jnp.asarray(soff),
        interval_width=1.0,
    ))

    # independent numpy reference
    sd = 1.0 / np.sqrt(prec)
    want = 0.0
    for k in range(M):
        v = vloc[vi[k]].copy()
        s = sloc[si[k]].copy()
        v[0] += drift * voff[vi[k]]
        s[0] += drift * soff[si[k]]
        dist = np.sqrt(((v - s) ** 2).sum() + 1e-12)
        e = pot[si[k]] + avi[vi[k]] - dist
        if types[k] == MEASUREMENT_POINT:
            want += -0.5 * np.log(2 * np.pi * sd**2) - (y[k] - e) ** 2 / (2 * sd**2)
        elif types[k] == MEASUREMENT_LOWER_THRESHOLD:
            want += np.log(_cdf(y[k], e, sd))
        elif types[k] == MEASUREMENT_UPPER_THRESHOLD:
            want += np.log(1 - _cdf(y[k], e, sd))
        else:
            want += np.log(_cdf(y[k] + 1.0, e, sd) - _cdf(y[k], e, sd))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_antigenic_mcmc_recovers_distance():
    """2-virus/1-serum point measurements: the posterior distance between
    virus and serum locations must concentrate near potency - titre."""
    from beast_mcmc_tpu.inference.mcmc import (
        init_mcmc_state, make_mcmc_step, run_chain,
    )
    from beast_mcmc_tpu.inference.operators import RandomWalkOperator
    from beast_mcmc_tpu.tree.topology import make_tree_state

    y = jnp.asarray([5.0, 5.0, 5.0, 5.0])  # potency 8 -> distance 3
    types = jnp.zeros(4, jnp.int32)
    vi = jnp.zeros(4, jnp.int32)
    si = jnp.zeros(4, jnp.int32)

    def log_post(params, tree):
        vloc = params["vloc"].reshape(1, 2)
        sloc = jnp.zeros((1, 2))
        return antigenic_loglikelihood(
            y, types, vi, si, vloc, sloc, jnp.asarray([8.0]), 4.0,
        ) - 0.5 * 0.01 * jnp.sum(params["vloc"] ** 2)

    tree = make_tree_state([2, 2, -1], [[-1, -1], [-1, -1], [0, 1]],
                           [0.0, 0.0, 1.0], 2)
    ops = [RandomWalkOperator(parameter="vloc", window=0.8, weight=1.0)]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({"vloc": jnp.asarray([1.0, 0.0])}, tree,
                            jax.random.PRNGKey(0), ops, log_post)
    state, trace = jax.jit(
        lambda s: run_chain(step, s, 20000, 10,
                            lambda st: {"d": jnp.linalg.norm(st.params["vloc"])})
    )(state)
    d = np.asarray(trace["d"])[500:]
    assert abs(d.mean() - 3.0) < 0.2, d.mean()


def test_drift_prior_gradient_finite():
    loc = jnp.asarray(np.random.default_rng(1).normal(size=(5, 2)))
    off = jnp.arange(5.0)
    g = jax.grad(lambda l: antigenic_drift_prior(l, off, 0.5, 2.0))(loc)
    assert np.all(np.isfinite(np.asarray(g)))
