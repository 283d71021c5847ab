"""Batched matrix exponentials for non-eigen transition probabilities.

Role of the reference's complex-eigendecomposition path (ref:
src/dr/evomodel/substmodel/ComplexSubstitutionModel.java +
ComplexColtEigenSystem.java, and the native Eigen3 JNI
eigen/EigenJNIWrapper.java): non-reversible generators have no real
symmetric eigensystem, and TPUs have no complex eig — so P(t) = expm(Q t)
is computed directly by scaling-and-squaring (jax.scipy.linalg.expm),
vmapped over branches x categories. Dense [S,S] work batches onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transition_probs_expm(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P over branch-time tensor t [M, C] for generator q [S, S]:
    returns [M, C, S, S] = expm(q * t), clipped to [0, 1] (the reference
    takes abs of the complex-eigen reconstruction,
    GenericBastaLikelihoodDelegate.java:929)."""
    m, c = t.shape
    flat = t.reshape(-1)

    def one(ti):
        return jax.scipy.linalg.expm(q * ti)

    p = jax.vmap(one)(flat).reshape(m, c, q.shape[0], q.shape[1])
    return jnp.clip(p, 0.0, 1.0)
