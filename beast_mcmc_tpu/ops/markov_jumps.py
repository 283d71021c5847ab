"""Markov-jump expectations: robust counting of substitutions and rewards.

Role of dr.inference.markovjumps.MarkovJumpsCore (ref: MarkovJumpsCore.
java; Minin & Suchard 2008): the expected number of labeled transitions
(or accumulated reward time) on a branch of length t, conditional on the
endpoint states, computed analytically from the eigendecomposition:

  E[N_L | a at 0, b at t] = sum_{ij in L} Q_ij *
      [ U ( (U^-1)_i outer ... ) ... ] / P(t)_ab

with the spectral integral
  I_kl(t) = (e^{lambda_k t} - e^{lambda_l t}) / (lambda_k - lambda_l),
  I_kk(t) = t e^{lambda_k t}.

Used for discrete-trait phylogeography jump counts and dN/dS-style
counting (ref: CodonPartitionedRobustCounting.java).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.ops.eigen import EigenSystem


def _spectral_integral(values: jnp.ndarray, t) -> jnp.ndarray:
    """I_kl = int_0^t e^{l_k s} e^{l_l (t-s)} ds, closed form. [S,S]."""
    lk = values[:, None]
    ll = values[None, :]
    et_k = jnp.exp(lk * t)
    et_l = jnp.exp(ll * t)
    diff = lk - ll
    same = jnp.abs(diff) < 1e-10
    safe = jnp.where(same, 1.0, diff)
    off = (et_k - et_l) / safe
    diag = t * et_k
    return jnp.where(same, jnp.broadcast_to(diag, off.shape), off)


def joint_jump_matrix(eig: EigenSystem, q: jnp.ndarray,
                      label: jnp.ndarray, t) -> jnp.ndarray:
    """J(t)[a,b] = E[ N_label * 1{X_t=b} | X_0=a ] (unnormalized).

    label: [S,S] 0/1 mask (or weights) over transitions to count.
    J = U [ (U^-1 (Q*label) U) .* I(t) ] U^-1   (Minin-Suchard eq. 2).
    """
    r = q * label
    inner = eig.U_inv @ r @ eig.U
    integ = _spectral_integral(eig.values, t)
    return eig.U @ (inner * integ) @ eig.U_inv


def expected_jumps(eig: EigenSystem, q: jnp.ndarray, label: jnp.ndarray,
                   t, p_matrix: jnp.ndarray) -> jnp.ndarray:
    """E[N_label | a at 0, b at t] for all endpoint pairs: [S,S]."""
    j = joint_jump_matrix(eig, q, label, t)
    return j / jnp.maximum(p_matrix, 1e-300)


def expected_reward(eig: EigenSystem, reward: jnp.ndarray, t,
                    p_matrix: jnp.ndarray) -> jnp.ndarray:
    """E[int_0^t r(X_s) ds | endpoints] for a state reward vector r [S]:
    same spectral form with R = diag(reward)."""
    inner = eig.U_inv @ (reward[:, None] * eig.U)
    integ = _spectral_integral(eig.values, t)
    j = eig.U @ (inner * integ) @ eig.U_inv
    return j / jnp.maximum(p_matrix, 1e-300)


def branch_expected_jumps(
    eig: EigenSystem,
    q: jnp.ndarray,
    label: jnp.ndarray,
    branch_lengths: jnp.ndarray,  # [M] rate-scaled
    node_probs: jnp.ndarray,  # [M, S] marginal (or sampled one-hot) states
    parent: jnp.ndarray,
    p_matrices: jnp.ndarray,  # [M, S, S] per-branch (single category)
) -> jnp.ndarray:
    """Per-branch expected label counts given endpoint distributions:
    [M]. Root entry is 0."""

    def per_branch(t, probs_child, probs_parent, pm):
        e = expected_jumps(eig, q, label, t, pm)
        # weight by endpoint distribution: sum_ab pi_a(parent) pi_b(child)
        # P(a->b path weight) = probs_parent[a] * pm[a,b]*? — with sampled
        # one-hot endpoints this reduces to e[a,b].
        w = probs_parent[:, None] * pm * probs_child[None, :]
        w = w / jnp.maximum(w.sum(), 1e-300)
        return jnp.sum(w * e)

    pidx = jnp.maximum(parent, 0)
    counts = jax.vmap(per_branch)(
        branch_lengths, node_probs, node_probs[pidx], p_matrices)
    return jnp.where(parent >= 0, counts, 0.0)
