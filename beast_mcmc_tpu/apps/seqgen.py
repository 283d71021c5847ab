"""Sequence simulator (role of dr.app.seqgen.SeqGen / dr.app.bss piBUSS,
ref: src/dr/app/seqgen/SeqGen.java:56): evolve states down a time tree
under a substitution/site/clock model and emit an alignment.

Also the engine for simulation-based calibration tests: simulate, infer,
check coverage.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.data.alignment import Alignment
from beast_mcmc_tpu.data.datatype import NUCLEOTIDES, DataType
from beast_mcmc_tpu.models.treelikelihood import branch_transition_matrices
from beast_mcmc_tpu.ops.eigen import EigenSystem
from beast_mcmc_tpu.ops.peeling import peel_order_from_heights


def simulate_states(
    key,
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    eig: EigenSystem,
    freqs: jnp.ndarray,
    category_rates: jnp.ndarray,
    category_weights: jnp.ndarray,
    branch_rates,
    n_sites: int,
) -> jnp.ndarray:
    """Sample states at every node: int32[M, n_sites] (pre-order scan)."""
    m = parent.shape[0]
    n_taxa = (m + 1) // 2
    p_mats = branch_transition_matrices(
        eig, parent, heights, branch_rates, category_rates)  # [M,C,S,S]
    order = peel_order_from_heights(heights, n_taxa)

    k_cat, k_root, k_scan = jax.random.split(key, 3)
    cats = jax.random.categorical(
        k_cat, jnp.log(category_weights)[None, :], shape=(n_sites,))
    root_state = jax.random.categorical(
        k_root, jnp.log(freqs)[None, :], shape=(n_sites,))

    states = jnp.full((m, n_sites), -1, jnp.int32)
    states = states.at[root].set(root_state.astype(jnp.int32))
    sites = jnp.arange(n_sites)

    def step(carry, node):
        states, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        ps = states[node]
        for which, kk in ((0, k1), (1, k2)):
            child = children[node, which]
            pm = p_mats[child]  # [C,S,S]
            probs = pm[cats, ps, :]  # [n_sites, S]
            st = jax.random.categorical(kk, jnp.log(probs + 1e-300), axis=-1)
            states = states.at[child].set(st.astype(jnp.int32))
        return (states, key), None

    (states, _), _ = jax.lax.scan(step, (states, k_scan), order[::-1])
    return states


def simulate_alignment(
    key,
    taxa,
    parent,
    children,
    heights,
    root,
    eig,
    freqs,
    category_rates,
    category_weights,
    branch_rates,
    n_sites: int,
    datatype: DataType = NUCLEOTIDES,
) -> Alignment:
    states = simulate_states(
        key, jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights),
        root, eig, freqs, jnp.asarray(category_rates),
        jnp.asarray(category_weights), branch_rates, n_sites)
    tip_states = np.asarray(states[: len(taxa)], np.int16)
    return Alignment(list(taxa), tip_states, datatype)
