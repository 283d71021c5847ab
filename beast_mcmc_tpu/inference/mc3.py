"""MC3 — Metropolis-coupled MCMC (parallel tempering).

Redesign of the reference's thread-per-chain MCMCMC (ref:
src/dr/inference/mcmcmc/MCMCMC.java:227-326): chains become ONE vmapped
batch of MCMCState; the swap phase is a random-pair state permutation
decided by the tempered posterior ratio

    log r = (T_i - T_j) * (lp_j - lp_i)        (MCMCMC.java:249-282)

The MODEL state (params/tree/posterior) swaps between temperature
slots; the operator-adaptation statistics and PRNG stream stay WITH the
slot — matching the reference, which swaps temperatures + operator stats
so each slot's tuning is adapted for its own temperature
(MCMCMC.java:289-316). The cold chain stays at batch index 0 (no
cold-chain relocation bookkeeping, MCMCMC.java:195-211). Chains ride the
"chains" mesh axis when sharded.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.mcmc import make_mcmc_step
from beast_mcmc_tpu.inference.state import MCMCState


def mc3_temperatures(n_chains: int, delta: float = 1.0, dtype=jnp.float64):
    """BEAST ladder: T_k = 1/(1 + delta k) (ref: BeastMain -mc3_delta /
    ParallelTempering defaults)."""
    k = jnp.arange(n_chains, dtype=dtype)
    return 1.0 / (1.0 + delta * k)


def swap_states(states: MCMCState, temperatures, key):
    """One random-pair swap attempt over the chain batch. Only the model
    state moves between slots; operator-adaptation stats and the PRNG key
    remain with the temperature slot (ref: MCMCMC.java:289-316 swaps
    temperature + operator stats together, i.e. tuning belongs to the
    temperature, not the wandering state)."""
    n = temperatures.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    i = jax.random.randint(k1, (), 0, n)
    j = (i + 1 + jax.random.randint(k2, (), 0, n - 1)) % n

    lp = states.log_posterior  # [n]
    logr = (temperatures[i] - temperatures[j]) * (lp[j] - lp[i])
    accept = jnp.log(jax.random.uniform(k3, dtype=lp.dtype)) < logr

    idx = jnp.arange(n)
    perm = jnp.where(accept, idx.at[i].set(j).at[j].set(i), idx)
    permute = lambda t: jax.tree_util.tree_map(lambda x: x[perm], t)
    return states.replace(
        params=permute(states.params),
        tree=permute(states.tree),
        log_posterior=lp[perm],
    ), accept


def make_mc3_runner(
    log_posterior,
    operators,
    n_chains: int,
    swap_every: int = 100,
    delta: float = 1.0,
    adaptation: bool = True,
    temperatures=None,
):
    """Returns (run(states, key, n_rounds, collector) -> (states, outputs),
    temperatures). states: a vmapped batch of MCMCState (batch size
    n_chains; chain 0 cold). Each round = swap_every vmapped steps + one
    swap attempt. collector(cold_state_slice) gathers per-round outputs.
    """
    step = make_mcmc_step(log_posterior, operators, adaptation=adaptation)
    temps = (jnp.asarray(temperatures)
             if temperatures is not None
             else mc3_temperatures(n_chains, delta))

    vstep = jax.vmap(step, in_axes=(0, 0))

    def run(states: MCMCState, key, n_rounds: int,
            collector: Optional[Callable[[MCMCState], Dict]] = None):
        def round_fn(carry, _):
            states, key = carry
            key, k_swap = jax.random.split(key)

            def inner(_, s):
                return vstep(s, temps)

            states = jax.lax.fori_loop(0, swap_every, inner, states)
            states, accepted = swap_states(states, temps, k_swap)
            out = {}
            if collector is not None:
                cold = jax.tree_util.tree_map(lambda x: x[0], states)
                out = collector(cold)
            out["swap_accepted"] = accepted
            return (states, key), out

        (states, key), outputs = jax.lax.scan(
            round_fn, (states, key), None, length=n_rounds
        )
        return states, outputs

    return run, temps


def replicate_state(state: MCMCState, n_chains: int, key) -> MCMCState:
    """Tile a single-chain state into an MC3 batch with distinct PRNG keys."""
    keys = jax.random.split(key, n_chains)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), state
    )
    return batched.replace(key=keys)
