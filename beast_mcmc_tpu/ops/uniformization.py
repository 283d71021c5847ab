"""Endpoint-conditioned CTMC path sampling by uniformization.

Role of the reference's stochastic-mapping core (ref:
src/dr/inference/markovjumps/UniformizedStateHistory.java,
SubordinatedProcess.java, StateHistory.java; Fearnhead & Sherlock 2006,
Minin & Suchard 2008): sample a full substitution history on a branch of
length t conditional on both endpoint states, by subordinating the chain
to a Poisson(mu t) number of candidate jumps with transition kernel
R = I + Q/mu, mu >= max_i(-q_ii).

TPU-native shape discipline: the number of candidate jumps is bounded by
a static NMAX; R^0..R^NMAX are precomputed with one scan of batched
matmuls (MXU), the jump-count posterior P(N=n|a,b) ~ Poisson(n; mu t) *
[R^n]_ab is a masked categorical, intermediate states are a scan of
forward-filter/backward-sample draws, and jump times are order statistics
via the exponential-spacings construction — no rejection loops, no
dynamic shapes. Complements the analytic expectations in
ops/markov_jumps.py (this module gives exact posterior *samples* of
counts/dwell times, the reference's `<completeHistoryLogger>` role).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from beast_mcmc_tpu.utils.accum import prefix_sum
from jax.scipy.special import gammaln


class StateHistory(NamedTuple):
    """A sampled path on one branch. Arrays have static length NMAX+1;
    entries with index > n_jumps are padding (state=end, dt=0)."""
    n_jumps: jnp.ndarray    # [] int — candidate (incl. virtual) jumps
    states: jnp.ndarray     # [NMAX+1] int — s_0=start, ..., s_n=end, pad=end
    dwell: jnp.ndarray      # [NMAX+1] float — time spent in states[i]


def uniformized_powers(q: jnp.ndarray, nmax: int):
    """(mu, R, R_pows [nmax+1,S,S]) for the subordinated chain."""
    s = q.shape[-1]
    mu = jnp.max(-jnp.diagonal(q)) * (1.0 + 1e-12) + 1e-30
    r = jnp.eye(s, dtype=q.dtype) + q / mu

    def body(p, _):
        return p @ r, p

    _, pows = jax.lax.scan(body, jnp.eye(s, dtype=q.dtype), None,
                           length=nmax + 1)
    return mu, r, pows


def sample_state_history(key, q: jnp.ndarray, t, start, end,
                         nmax: int = 64) -> StateHistory:
    """Draw one path of X on [0,t] given X_0=start, X_t=end. Jittable;
    vmap over (key, t, start, end) for whole-tree mapping."""
    dt_ = q.dtype
    s = q.shape[-1]
    t = jnp.asarray(t, dt_)
    mu, r, pows = uniformized_powers(q, nmax)
    k_n, k_states, k_times = jax.random.split(key, 3)

    # --- number of candidate jumps: P(n) ~ Poisson(n; mu t) [R^n]_ab ---
    ns = jnp.arange(nmax + 1, dtype=dt_)
    log_pois = ns * jnp.log(mu * t) - mu * t - gammaln(ns + 1.0)
    rn_ab = pows[:, start, end]
    logw = log_pois + jnp.log(jnp.maximum(rn_ab, 1e-300))
    logw = jnp.where(rn_ab > 0, logw, -jnp.inf)
    n = jax.random.categorical(k_n, logw)

    # --- intermediate states: P(s_i=c) ~ R[s_{i-1},c] [R^{n-i}]_{c,end} ---
    def state_step(s_prev, xs):
        i, kk = xs
        rem = jnp.maximum(n - i, 0)
        probs = r[s_prev, :] * pows[rem][:, end]
        c = jax.random.categorical(kk, jnp.log(jnp.maximum(probs, 1e-300)))
        s_i = jnp.where(i < n, c, end)
        return s_i, s_i

    idx = jnp.arange(1, nmax + 1)
    _, states_tail = jax.lax.scan(
        state_step, jnp.asarray(start), (idx, jax.random.split(k_states, nmax)))
    states = jnp.concatenate([jnp.asarray(start)[None], states_tail])

    # --- jump times: n sorted uniforms on [0,t] via exponential spacings;
    # dwell_i = time in states[i] (interval i -> i+1, last one ends at t) ---
    e = jax.random.exponential(k_times, (nmax + 1,), dtype=dt_)
    cs = prefix_sum(e)
    denom = cs[n]  # sum of the first n+1 spacings
    jump_t = jnp.where(idx <= n, t * cs[:nmax] / denom, t)  # [nmax]
    bounds = jnp.concatenate(
        [jnp.zeros((1,), dt_), jump_t, t[None]])  # [nmax+2]
    dwell = bounds[1:] - bounds[:-1]  # [nmax+1]
    dwell = jnp.where(jnp.arange(nmax + 1) <= n, dwell, 0.0)

    return StateHistory(n_jumps=n, states=states, dwell=dwell)


def labeled_jump_count(hist: StateHistory, label: jnp.ndarray) -> jnp.ndarray:
    """Number of REAL labeled jumps in the path (virtual self-jumps drop
    out whenever diag(label)=0, the usual convention)."""
    nmax = hist.states.shape[0] - 1
    valid = jnp.arange(1, nmax + 1) <= hist.n_jumps
    return jnp.sum(
        jnp.where(valid, label[hist.states[:-1], hist.states[1:]], 0.0))


def state_dwell_times(hist: StateHistory, n_states: int) -> jnp.ndarray:
    """[S] total time the path spends in each state (sums to t)."""
    onehot = jax.nn.one_hot(hist.states, n_states, dtype=hist.dwell.dtype)
    return onehot.T @ hist.dwell


def sample_branch_histories(key, q, branch_lengths, start_states, end_states,
                            nmax: int = 64) -> StateHistory:
    """Whole-tree stochastic mapping: vmap over branches given sampled
    node states (from ops/ancestral.py joint sampling). Arrays [M, ...]."""
    keys = jax.random.split(key, branch_lengths.shape[0])
    return jax.vmap(
        lambda k, t, a, b: sample_state_history(k, q, t, a, b, nmax=nmax)
    )(keys, branch_lengths, start_states, end_states)
