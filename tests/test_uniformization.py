"""Uniformization path sampler vs analytic Minin-Suchard expectations.

The sampled endpoint-conditioned histories must reproduce (by Monte
Carlo) the exact conditional expectations from ops/markov_jumps.py, and
their dwell times must always sum to the branch length exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.ops.eigen import (
    eigen_from_q_reversible,
    transition_probs,
)
from beast_mcmc_tpu.ops.markov_jumps import expected_jumps, expected_reward
from beast_mcmc_tpu.ops.uniformization import (
    labeled_jump_count,
    sample_state_history,
    state_dwell_times,
)


def _hky_q(kappa=3.0, freqs=(0.3, 0.2, 0.25, 0.25)):
    pi = np.asarray(freqs)
    rates = np.ones((4, 4))
    for i, j in [(0, 2), (2, 0), (1, 3), (3, 1)]:  # transitions A<->G, C<->T
        rates[i, j] = kappa
    q = rates * pi[None, :]
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(axis=1))
    q /= -np.dot(pi, np.diag(q))  # one expected sub / unit time
    return q, pi


def _sample_many(q, t, a, b, n_samples, nmax=48):
    keys = jax.random.split(jax.random.PRNGKey(7), n_samples)
    qj = jnp.asarray(q)
    return jax.vmap(
        lambda k: sample_state_history(k, qj, t, a, b, nmax=nmax))(keys)


def test_dwell_partitions_branch_length_and_endpoints_hold():
    q, pi = _hky_q()
    t, a, b = 0.9, 0, 3
    hists = _sample_many(q, t, a, b, 256)
    dwell = jax.vmap(lambda h: state_dwell_times(h, 4))(hists)
    np.testing.assert_allclose(np.asarray(dwell).sum(axis=1), t, rtol=1e-6)
    assert np.all(np.asarray(hists.states[:, 0]) == a)
    # the state at the last valid index is the end state
    last = np.take_along_axis(
        np.asarray(hists.states), np.asarray(hists.n_jumps)[:, None], axis=1)
    assert np.all(last == b)


def test_jump_counts_match_spectral_expectation():
    q, pi = _hky_q()
    eig = eigen_from_q_reversible(jnp.asarray(q), jnp.asarray(pi))
    t = 0.8
    p = transition_probs(eig, jnp.asarray(t))
    label = jnp.ones((4, 4)) - jnp.eye(4)  # count all real substitutions
    want = np.asarray(expected_jumps(eig, jnp.asarray(q), label, t, p))

    n_samples = 6000
    for (a, b) in [(0, 0), (0, 2), (1, 3)]:
        hists = _sample_many(q, t, a, b, n_samples)
        counts = np.asarray(
            jax.vmap(lambda h: labeled_jump_count(h, label))(hists))
        se = counts.std() / np.sqrt(n_samples)
        assert abs(counts.mean() - want[a, b]) < 4 * se + 1e-3, \
            (a, b, counts.mean(), want[a, b])


def test_dwell_times_match_spectral_reward():
    q, pi = _hky_q()
    eig = eigen_from_q_reversible(jnp.asarray(q), jnp.asarray(pi))
    t, a, b = 1.2, 2, 1
    p = transition_probs(eig, jnp.asarray(t))
    reward = jnp.asarray([1.0, 0.0, 0.0, 0.0])  # time spent in state A
    want = np.asarray(expected_reward(eig, reward, t, p))[a, b]

    n_samples = 6000
    hists = _sample_many(q, t, a, b, n_samples)
    dwell = np.asarray(
        jax.vmap(lambda h: state_dwell_times(h, 4))(hists))[:, 0]
    se = dwell.std() / np.sqrt(n_samples)
    assert abs(dwell.mean() - want) < 4 * se + 1e-3, (dwell.mean(), want)
