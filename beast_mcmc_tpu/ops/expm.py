"""Batched matrix exponentials for non-eigen transition probabilities.

Role of the reference's complex-eigendecomposition path (ref:
src/dr/evomodel/substmodel/ComplexSubstitutionModel.java +
ComplexColtEigenSystem.java, and the native Eigen3 JNI
eigen/EigenJNIWrapper.java): non-reversible generators have no real
symmetric eigensystem, and TPUs have no complex eig — so P(t) = expm(Q t)
is computed directly.

TPU-native form: scaling-and-squaring with a FIXED schedule of pure
batched matmuls (Horner-evaluated Taylor core + masked repeated
squaring). jax.scipy.linalg.expm's Pade core needs batched triangular
solves and data-dependent squaring counts — on a 3k-branch x 56-state
geography partition that costs ~67 ms/eval on a v5e chip; the matmul-only
schedule runs the same batch in ~2 ms because every op lands on the MXU
and nothing is data-dependent at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_MAX_SQUARINGS = 30


def expm_taylor(a: jnp.ndarray, order: int | None = None,
                max_squarings: int | None = None) -> jnp.ndarray:
    """Batched expm of a [..., S, S] tensor.

    Scaling-and-squaring: scale each matrix by 2^-s so its inf-norm is
    <= 0.5, apply an order-N Taylor polynomial (Horner form — N-1
    batched matmuls), then square s times (masked static loop). With
    norm <= 0.5 the Taylor truncation error is 0.5^(N+1)/(N+1)!:
    ~1e-9 for N=9 (f32 path) and ~2e-17 for N=17 (f64 path).
    """
    dt = a.dtype
    if order is None:
        order = 17 if dt == jnp.float64 else 9
    if max_squarings is None:
        # the squaring chain is bandwidth-bound (each is a full batched
        # matmul); f32 production paths cap the norm range at 0.5*2^16
        # (any generator*time beyond that is numerically hopeless in f32
        # anyway), f64 keeps the full range for corpus parity
        max_squarings = _MAX_SQUARINGS if dt == jnp.float64 else 16
    s_dim = a.shape[-1]
    eye = jnp.eye(s_dim, dtype=dt)
    # inf-norm per matrix -> squarings needed to bring it under 0.5
    nrm = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)  # [...]
    s = jnp.ceil(jnp.log2(jnp.maximum(nrm, 0.25) * 4.0))  # norm/2^s <= .5
    s = jnp.clip(s, 0.0, float(max_squarings))
    a = a / jnp.exp2(s)[..., None, None].astype(dt)
    # Horner: P = I + A(I + A/2 (I + ... (I + A/N)))
    p = eye + a / order
    for k in range(order - 1, 0, -1):
        p = eye + jnp.matmul(a, p,
                             preferred_element_type=dt) / k
    for k in range(max_squarings):
        p2 = jnp.matmul(p, p, preferred_element_type=dt)
        p = jnp.where((s > k)[..., None, None], p2, p)
    return p


def transition_probs_expm(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P over branch-time tensor t [M, C] for generator q [S, S]:
    returns [M, C, S, S] = expm(q * t), clipped to [0, 1] (the reference
    takes abs of the complex-eigen reconstruction,
    GenericBastaLikelihoodDelegate.java:929)."""
    m, c = t.shape
    flat = t.reshape(-1)
    a = q[None, :, :] * flat[:, None, None].astype(q.dtype)
    p = expm_taylor(a).reshape(m, c, q.shape[0], q.shape[1])
    return jnp.clip(p, 0.0, 1.0)
