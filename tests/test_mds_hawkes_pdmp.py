"""MDS / Hawkes likelihoods and PDMP (Zig-Zag, Bouncy Particle) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain
from beast_mcmc_tpu.inference.pdmp import BouncyParticleOperator, ZigZagOperator
from beast_mcmc_tpu.models.hawkes import hawkes_event_rates, hawkes_loglikelihood
from beast_mcmc_tpu.models.mds import mds_loglikelihood, pairwise_distances
from beast_mcmc_tpu.tree.topology import make_tree_state


def dummy_tree():
    return make_tree_state(
        parent=[2, 2, -1], children=[[-1, -1], [-1, -1], [0, 1]],
        heights=[0.0, 0.0, 1.0], root=2,
    )


# -------------------------------------------------------------- MDS


def numpy_mds(observed, mask, locations, prec, truncated):
    from math import erf, log, pi, sqrt

    n = len(locations)
    total = 0.0
    for i in range(n):
        for j in range(n):
            if not mask[i][j]:
                continue
            d = np.sqrt(np.sum((locations[i] - locations[j]) ** 2) + 1e-12)
            r = observed[i][j] - d
            ll = 0.5 * (log(prec) - log(2 * pi)) - 0.5 * prec * r * r
            if truncated:
                phi = 0.5 * (1 + erf(d * sqrt(prec) / sqrt(2)))
                ll -= log(phi)
            total += ll
    return total


def test_mds_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    n, d = 8, 2
    locs = rng.normal(size=(n, d))
    obs = np.abs(rng.normal(2.0, 1.0, size=(n, n)))
    obs = 0.5 * (obs + obs.T)
    mask = np.triu(np.ones((n, n), bool), k=1)
    for trunc in (False, True):
        got = float(mds_loglikelihood(
            jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(locs), 1.7,
            truncated=trunc,
        ))
        ref = numpy_mds(obs, mask, locs, 1.7, trunc)
        np.testing.assert_allclose(got, ref, rtol=1e-7)


def test_mds_gradient_recovers_configuration():
    """Gradient ascent on noiseless distances recovers the geometry
    (end-to-end usefulness check of the gradient surface)."""
    rng = np.random.default_rng(1)
    n, d = 10, 2
    true = rng.normal(size=(n, d))
    obs = np.asarray(pairwise_distances(jnp.asarray(true)))
    mask = jnp.asarray(np.triu(np.ones((n, n), bool), k=1))
    x = jnp.asarray(true + 0.3 * rng.normal(size=(n, d)))
    grad = jax.jit(jax.grad(
        lambda x: mds_loglikelihood(jnp.asarray(obs), mask, x, 100.0,
                                    truncated=False)
    ))
    for _ in range(200):
        x = x + 1e-3 * grad(x)
    got = np.asarray(pairwise_distances(x))
    np.testing.assert_allclose(got[np.triu_indices(n, 1)],
                               obs[np.triu_indices(n, 1)], atol=0.05)


# -------------------------------------------------------------- Hawkes


def numpy_hawkes(locs, times, sx, tx, tt, om, th, mu):
    n, d = locs.shape

    def phi(sq, prec, dims):
        return (prec / (2 * np.pi)) ** (dims / 2.0) * np.exp(-0.5 * prec * sq)

    ll = 0.0
    for i in range(n):
        bg = 0.0
        ex = 0.0
        for j in range(n):
            sq = np.sum((locs[i] - locs[j]) ** 2)
            dtv = times[i] - times[j]
            if j != i:
                bg += phi(sq, tx, d) * phi(dtv * dtv, tt, 1)
            if dtv > 0:
                ex += th * om * np.exp(-om * dtv) * phi(sq, sx, d)
        ll += np.log(mu / n * bg + ex)
    comp = mu * (times[-1] - times[0]) + th * np.sum(
        1.0 - np.exp(-om * (times[-1] - times))
    )
    return ll - comp


def test_hawkes_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    n, d = 12, 2
    locs = rng.normal(size=(n, d))
    times = np.sort(rng.uniform(0, 10, n))
    args = (1.5, 0.3, 0.8, 2.0, 0.7, 1.1)
    got = float(hawkes_loglikelihood(
        jnp.asarray(locs), jnp.asarray(times), *args
    ))
    ref = numpy_hawkes(locs, times, *args)
    np.testing.assert_allclose(got, ref, rtol=1e-7)


def test_hawkes_gradients_finite():
    rng = np.random.default_rng(3)
    locs = jnp.asarray(rng.normal(size=(10, 2)))
    times = jnp.asarray(np.sort(rng.uniform(0, 5, 10)))
    g = jax.grad(
        lambda l, th: hawkes_loglikelihood(l, times, 1.0, 0.5, 0.5, 1.0, th, 1.0),
        argnums=(0, 1),
    )(locs, 0.5)
    assert np.all(np.isfinite(np.asarray(g[0])))
    assert np.isfinite(float(g[1]))
    b, e = hawkes_event_rates(locs, times, 1.0, 0.5, 0.5, 1.0, 0.5, 1.0)
    assert np.all(np.asarray(b) >= 0) and np.all(np.asarray(e) >= 0)


# -------------------------------------------------------------- PDMP


def run_pdmp(op, n_steps=4000, seed=0):
    cov = np.array([[1.0, 0.6], [0.6, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray([1.0, -1.0])

    def log_post(params, tree):
        d = params["x"] - mean
        return -0.5 * d @ prec @ d

    ops = [op]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(
        {"x": jnp.zeros(2)}, dummy_tree(), jax.random.PRNGKey(seed), ops,
        log_post,
    )
    collector = lambda s: {"x": s.params["x"]}
    state, trace = jax.jit(
        lambda s: run_chain(step, s, n_steps, 5, collector)
    )(state)
    return np.asarray(trace["x"])[40:]


def test_zigzag_gaussian_moments():
    xs = run_pdmp(ZigZagOperator(
        parameters=["x"], log_transform=False, travel_time=2.0,
        grad_bound=25.0,
    ))
    assert np.allclose(xs.mean(axis=0), [1.0, -1.0], atol=0.25), xs.mean(axis=0)
    assert abs(np.corrcoef(xs.T)[0, 1] - 0.6) < 0.2


def test_bps_gaussian_moments():
    xs = run_pdmp(BouncyParticleOperator(
        parameters=["x"], log_transform=False, travel_time=2.0,
        grad_bound=30.0, refresh_rate=1.0,
    ))
    assert np.allclose(xs.mean(axis=0), [1.0, -1.0], atol=0.25), xs.mean(axis=0)
    assert abs(np.corrcoef(xs.T)[0, 1] - 0.6) < 0.2
