"""Tournament Jacobi eigensolver for small symmetric matrices.

jnp.linalg.eigh lowers to QDWH on TPU — iterative while-loops profiled at
~3 ms per 4x4 decomposition inside the MCMC step. Substitution-model state
spaces are tiny (4 nucleotides, 20 amino acids, 61 codons), so a cyclic
Jacobi sweep with ROUND-ROBIN PARALLEL ORDERING is the right shape for the
hardware: each round rotates floor(S/2) disjoint pivot pairs at once, and
the whole round is two dense matmuls (A <- R^T A R) — MXU work with a
static trip count, no data-dependent control flow.

Accuracy: quadratic convergence; `sweeps` defaults give ~machine epsilon
for S <= 64 (validated against numpy in tests over random reversible
generators).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_schedule(n: int) -> np.ndarray:
    """[n-1, n//2, 2] disjoint pivot pairs per round (circle method).

    n must be even. Odd matrix sizes are padded with a dummy index by the
    caller; pairs touching the dummy rotate by identity (the dummy row and
    column are exactly zero off-diagonal, so the pivot angle is zero).
    """
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = []
        for i in range(n // 2):
            a, b = players[i], players[n - 1 - i]
            pairs.append((min(a, b), max(a, b)))
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.asarray(rounds, np.int32)  # [n-1, n//2, 2]


@partial(jax.jit, static_argnums=(1,))
def jacobi_eigh(a_mat: jnp.ndarray, sweeps: int = 10):
    """Eigendecomposition of a symmetric matrix: returns (w, V) with
    a = V @ diag(w) @ V.T, columns of V orthonormal. Ascending-sorted w."""
    s = a_mat.shape[-1]
    n = s if s % 2 == 0 else s + 1
    dtype = a_mat.dtype
    if n != s:
        # decoupled dummy row/col: off-diagonals exactly 0, never rotated
        a_mat = jnp.pad(a_mat, ((0, 1), (0, 1)))
    schedule = jnp.asarray(_round_robin_schedule(n))  # [R, P, 2]
    eye = jnp.eye(n, dtype=dtype)

    def one_round(carry, pairs):
        a, v = carry
        p = pairs[:, 0]
        q = pairs[:, 1]
        app = a[p, p]
        aqq = a[q, q]
        apq = a[p, q]
        # rotation angle zeroing a[p,q]; theta in (-pi/4, pi/4]
        valid = (p != q) & (jnp.abs(apq) > 1e-300)
        tau = (aqq - app) / (2.0 * jnp.where(valid, apq, 1.0))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0, 1.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        sn = t * c
        c = jnp.where(valid, c, 1.0)
        sn = jnp.where(valid, sn, 0.0)
        # rotation matrix for ALL pairs this round (disjoint -> commute)
        r = eye
        r = r.at[p, p].set(c).at[q, q].set(c)
        r = r.at[p, q].set(sn).at[q, p].set(-sn)
        # HIGHEST precision: the default TPU matmul truncates to bf16
        # mantissas, which loses ~3 digits per rotation and compounds
        # across sweeps (observed: f32 eigenvalues off by 1e-3 vs eigh)
        hp = jax.lax.Precision.HIGHEST
        a = jnp.matmul(jnp.matmul(r.T, a, precision=hp), r, precision=hp)
        v = jnp.matmul(v, r, precision=hp)
        return (a, v), None

    def one_sweep(carry, _):
        carry, _ = jax.lax.scan(one_round, carry, schedule)
        return carry, None

    (a, v), _ = jax.lax.scan(one_sweep, (a_mat, eye), None, length=sweeps)
    w = jnp.diagonal(a)[:s]  # dummy (if any) sits untouched at column s
    v = v[:s, :s]
    order = jnp.argsort(w)
    return w[order], v[:, order]
