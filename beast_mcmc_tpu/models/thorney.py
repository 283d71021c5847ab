"""Thorney BEAST: approximate branch-length likelihood for huge trees.

Role of the reference's thorney stack (ref:
src/dr/evomodel/bigfasttree/thorney/PoissonBranchLengthLikelihoodDelegate
.java:39-56 — Poisson probability of the observed per-branch mutation
count given branchLength * scale; ThorneyDataLikelihoodDelegate;
ConstrainedTreeModel). Instead of full site peeling on >=10^4-tip trees,
each branch's reconstructed mutation count is Poisson against the
time-tree's expected substitutions.

TPU-native: the whole tree is one vectorized Poisson logpmf over [M]
branches — no per-branch delegates. Gradients wrt node heights/rates are
exact via jax.grad (the role of getGradientWrtTime:51-56).
"""

from __future__ import annotations

import jax.numpy as jnp




def poisson_branch_length_loglik(
    mutations: jnp.ndarray,  # [M] mutation counts per node's parent branch
    parent: jnp.ndarray,
    heights: jnp.ndarray,
    branch_rates,  # [M] or scalar clock rates
    scale: float = 1.0,  # sites (data scale), ref ctor arg
) -> jnp.ndarray:
    """Sum over non-root branches of logPoisson(k_b; t_b * r_b * scale)."""
    dt = heights.dtype
    pidx = jnp.maximum(parent, 0)
    t = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
    mean = t * jnp.broadcast_to(jnp.asarray(branch_rates, dt), t.shape) * scale
    is_branch = parent >= 0
    tiny = jnp.finfo(dt).tiny
    mean_safe = jnp.where(is_branch, jnp.maximum(mean, tiny), 1.0)
    k = mutations.astype(dt)
    from jax.scipy.special import gammaln

    # k = 0 on a zero-length branch is P = 1, not 0 * log(0) = NaN
    k_term = jnp.where(k > 0, k * jnp.log(mean_safe), 0.0)
    ll = k_term - mean - gammaln(k + 1.0)  # elementwise
    return jnp.sum(jnp.where(is_branch, ll, 0.0))


def mutation_counts_from_branch_lengths(
    genetic_branch_lengths: jnp.ndarray, sequence_length: float
) -> jnp.ndarray:
    """Round substitutions/site branch lengths of a data tree into integer
    mutation counts (the reference's MutationList from a ML divergence
    tree: branchLength * L)."""
    return jnp.round(genetic_branch_lengths * sequence_length)
