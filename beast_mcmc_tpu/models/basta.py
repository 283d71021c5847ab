"""BASTA structured coalescent (discrete demes).

Role of the reference's BASTA engine and its native BEAGLE extension
(ref: src/dr/evomodel/coalescent/basta/GenericBastaLikelihoodDelegate
.java:813-1008 — peelPartials / reduceWithinInterval /
reduceAcrossIntervals; GPU path BeagleBastaLikelihoodDelegate.java;
JNI surface src/beagle/basta/BeagleBasta.java:32-60).

Model (De Maio et al. 2015): each lineage carries a probability vector
p over K demes; along a coalescent interval of length L the vector is
transported by the backward migration process, p_end = exp(Lam^T L) p;
the probability of no coalescence uses the trapezoid approximation of the
expected pairwise rate,

  logL -= L/4 * sum_k [ (e_k^2 - f_k) + (g_k^2 - h_k) ] / N_k,

with e,f (g,h) the active-lineage sums of p_k and p_k^2 at interval start
(end); a coalescence of lineages a,b contributes
log sum_k p_a(k) p_b(k) / N_k and starts the parent lineage at the
normalized product (peelPartials:855-875).

TPU-native redesign: no per-operation buffers/op-tuples — one lax.scan
over the height-sorted event sequence with a static [M,K] partials tensor
and an active-lineage mask; the within/across-interval reductions are
masked vector ops. The migration matrix exponentials use
jax.scipy.linalg.expm (K is small), replacing the reference's complex
eigendecomposition path (computeTransitionProbabilities:880-935).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def migration_rate_matrix(rates: jnp.ndarray, k: int) -> jnp.ndarray:
    """Build the backward migration rate matrix from the K(K-1) off-
    diagonal rates (row-major, skipping the diagonal), rows summing to 0
    (the reference's SVS-able rate parameterization)."""
    import numpy as _np

    rates = jnp.asarray(rates)
    rows, cols = _np.where(~_np.eye(k, dtype=bool))  # static index pattern
    q = jnp.zeros((k, k), rates.dtype).at[rows, cols].set(rates)
    return q - jnp.diag(jnp.sum(q, axis=1))


def basta_loglikelihood(
    tip_demes: jnp.ndarray,  # int[N] deme of each tip, or float[N,K] probs
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    migration: jnp.ndarray,  # [K,K] backward rate matrix (rows sum to 0)
    pop_sizes: jnp.ndarray,  # [K]
) -> jnp.ndarray:
    """BASTA approximate structured-coalescent log-density of the tree +
    tip demes given migration rates and deme population sizes."""
    m = parent.shape[0]
    n_taxa = (m + 1) // 2
    k = pop_sizes.shape[0]
    dt = heights.dtype

    if tip_demes.ndim == 1:
        tip_p = jax.nn.one_hot(tip_demes, k, dtype=dt)
    else:
        tip_p = tip_demes.astype(dt)

    inv_n = 1.0 / pop_sizes
    qt = migration.T.astype(dt)  # dp/dt = Lam^T p

    # height-sorted event order, tips before coalescences at equal height
    delta = jnp.where(jnp.arange(m) < n_taxa, 1, -1)
    order = jnp.lexsort((-delta, heights))
    times = heights[order]

    p_arr = jnp.zeros((m, k), dt)
    active = jnp.zeros((m,), bool)

    # first event is always a tip (the youngest)
    first = order[0]
    p_arr = p_arr.at[first].set(tip_p[jnp.minimum(first, n_taxa - 1)])
    active = active.at[first].set(True)

    def step(carry, j):
        p_arr, active, logl = carry
        t0 = times[j - 1]
        t1 = times[j]
        length = t1 - t0
        # transport all active lineages across the interval
        trans = jax.scipy.linalg.expm(qt * length)  # [K,K]
        p_end = p_arr @ trans.T  # row l: trans @ p_arr[l]
        a = active.astype(dt)[:, None]
        e = jnp.sum(p_arr * a, axis=0)
        f = jnp.sum(p_arr * p_arr * a, axis=0)
        g = jnp.sum(p_end * a, axis=0)
        h = jnp.sum(p_end * p_end * a, axis=0)
        logl = logl - length / 4.0 * jnp.sum(
            (e * e - f + g * g - h) * inv_n
        )
        p_arr = jnp.where(active[:, None], p_end, p_arr)

        # process the event closing this interval
        node = order[j]
        is_tip = node < n_taxa

        # tip: activate with its deme vector
        p_tip = tip_p[jnp.minimum(node, n_taxa - 1)]
        # coalescence: combine the node's children
        c1 = children[jnp.maximum(node, n_taxa), 0]
        c2 = children[jnp.maximum(node, n_taxa), 1]
        entry = p_arr[c1] * p_arr[c2] * inv_n
        prob = jnp.sum(entry)
        # double-where: tip events and impossible (prob = 0) coalescences
        # must not leak log(0)/0-div into values OR gradients (0 * inf =
        # NaN in the VJP); an impossible coalescence contributes -inf
        ok = (~is_tip) & (prob > 0)
        prob_safe = jnp.where(ok, prob, 1.0)
        p_coal = entry / prob_safe

        p_arr = p_arr.at[node].set(jnp.where(is_tip, p_tip, p_coal))
        logl = logl + jnp.where(
            is_tip, 0.0,
            jnp.where(ok, jnp.log(prob_safe), -jnp.inf),
        )
        active = active.at[node].set(True)
        deact = ~is_tip
        active = active.at[c1].set(jnp.where(deact, False, active[c1]))
        active = active.at[c2].set(jnp.where(deact, False, active[c2]))
        return (p_arr, active, logl), None

    (p_arr, active, logl), _ = jax.lax.scan(
        step, (p_arr, active, jnp.asarray(0.0, dt)), jnp.arange(1, m)
    )
    return logl


def basta_root_deme_distribution(
    tip_demes, parent, children, heights, migration, pop_sizes
):
    """Posterior deme distribution at the root (the reference's ancestral
    reconstruction surface for structured trees). Recomputes the scan and
    returns the root's normalized partial vector."""
    m = parent.shape[0]
    n_taxa = (m + 1) // 2
    k = pop_sizes.shape[0]
    dt = heights.dtype
    if tip_demes.ndim == 1:
        tip_p = jax.nn.one_hot(tip_demes, k, dtype=dt)
    else:
        tip_p = tip_demes.astype(dt)
    # reuse the likelihood scan, capturing the final partials
    # (duplicated small scan; fine for a post-processing query)
    inv_n = 1.0 / pop_sizes
    qt = migration.T.astype(dt)
    delta = jnp.where(jnp.arange(m) < n_taxa, 1, -1)
    order = jnp.lexsort((-delta, heights))
    times = heights[order]
    p_arr = jnp.zeros((m, k), dt)
    active = jnp.zeros((m,), bool)
    first = order[0]
    p_arr = p_arr.at[first].set(tip_p[jnp.minimum(first, n_taxa - 1)])
    active = active.at[first].set(True)

    def step(carry, j):
        p_arr, active = carry
        length = times[j] - times[j - 1]
        trans = jax.scipy.linalg.expm(qt * length)
        p_end = p_arr @ trans.T
        p_arr = jnp.where(active[:, None], p_end, p_arr)
        node = order[j]
        is_tip = node < n_taxa
        p_tip = tip_p[jnp.minimum(node, n_taxa - 1)]
        c1 = children[jnp.maximum(node, n_taxa), 0]
        c2 = children[jnp.maximum(node, n_taxa), 1]
        entry = p_arr[c1] * p_arr[c2] * inv_n
        p_coal = entry / jnp.maximum(jnp.sum(entry), 1e-300)
        p_arr = p_arr.at[node].set(jnp.where(is_tip, p_tip, p_coal))
        active = active.at[node].set(True)
        deact = ~is_tip
        active = active.at[c1].set(jnp.where(deact, False, active[c1]))
        active = active.at[c2].set(jnp.where(deact, False, active[c2]))
        return (p_arr, active), None

    (p_arr, active), _ = jax.lax.scan(
        step, (p_arr, active), jnp.arange(1, m)
    )
    root = jnp.argmax(heights)
    return p_arr[root]
