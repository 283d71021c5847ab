"""Rate-matrix construction and spectral decomposition.

The TPU-native replacement of the reference's eigen pipeline
(BaseSubstitutionModel Q -> EigenDecomposition -> exp(Qt), ref:
src/dr/evomodel/substmodel/BaseSubstitutionModel.java:202-275, eigen
backends DefaultEigenSystem/colt/EJML/Eigen3-JNI). Reversible models use
the pi-symmetrization trick so everything runs as a real symmetric eigh on
device — no general (complex) eigensolver needed on TPU. Non-reversible
models fall back to scaling-and-squaring expm.

All functions are pure, jit-safe, and batched with vmap where noted.
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp

from beast_mcmc_tpu.ops.jacobi import jacobi_eigh

# Below this state count, use the fixed-iteration tournament Jacobi solver
# (matmul-shaped, no while loops) instead of XLA's QDWH eigh — profiled at
# ~3 ms/step vs ~microseconds for nucleotide models on TPU.
_JACOBI_MAX_STATES = 64


def _sym_eigh(a: jnp.ndarray):
    # f64 goes through XLA's eigh: correct under TPU f64 emulation,
    # whereas the Jacobi kernel's f64 matmuls are not supported there
    if (a.shape[-1] <= _JACOBI_MAX_STATES and a.ndim == 2
            and a.dtype != jnp.float64):
        return jacobi_eigh(a)
    return jnp.linalg.eigh(a)


@chex.dataclass(frozen=True)
class EigenSystem:
    """Q = U diag(values) U^{-1}; right eigenvectors in U's columns."""

    values: jnp.ndarray  # [..., S]
    U: jnp.ndarray  # [..., S, S]
    U_inv: jnp.ndarray  # [..., S, S]


def normalized_q(rates_symmetric: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Build the normalized reversible generator.

    Q[i,j] = R[i,j] * pi[j] (i != j), diag = -rowsum, scaled so the mean
    substitution rate -sum_i pi_i Q[i,i] == 1 (the reference's
    setupMatrix/normalize convention, BaseSubstitutionModel.java:202-275).
    R must be symmetric with arbitrary diagonal (ignored).
    """
    s = freqs.shape[-1]
    q = rates_symmetric * freqs[..., None, :]
    q = q - jnp.eye(s, dtype=q.dtype) * q  # zero the diagonal
    q = q - jnp.eye(s, dtype=q.dtype) * jnp.sum(q, axis=-1, keepdims=True)
    # normalize mean rate to 1
    mean_rate = -jnp.sum(freqs * jnp.diagonal(q, axis1=-2, axis2=-1), axis=-1)
    return q / mean_rate[..., None, None]


def reversible_eigen(rates_symmetric: jnp.ndarray, freqs: jnp.ndarray) -> EigenSystem:
    """Spectral decomposition of a reversible Q via pi-symmetrization.

    With D = diag(sqrt(pi)), the matrix D Q D^{-1} is symmetric for any
    reversible Q, so a real `eigh` suffices: Q = (D^{-1} V) W (V^T D).
    Replaces the reference's general eigensolvers for every reversible
    model (HKY/GTR/TN93/empirical AA/reversible codon/general).

    Computed in f64 when x64 is on, cast back to the input dtype: the
    f64->f32 rounding makes the EigenSystem bit-identical across fusion
    contexts (derived-cache branch vs full-evaluation recompute), which
    the on-chip f32 self-check tolerance depends on (accum.py policy;
    ref tolerance 0.1, MarkovChain.java:55). The matrices are [S,S]
    (4-61), so the emulated-f64 cost is noise next to the peel.
    """
    import jax

    out_dt = jnp.result_type(rates_symmetric, freqs)
    if jax.config.jax_enable_x64:
        rates_symmetric = rates_symmetric.astype(jnp.float64)
        freqs = freqs.astype(jnp.float64)
    q = normalized_q(rates_symmetric, freqs)
    sqrt_pi = jnp.sqrt(freqs)
    a = q * (sqrt_pi[..., :, None] / sqrt_pi[..., None, :])
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))  # enforce exact symmetry
    w, v = _sym_eigh(a)
    u = v / sqrt_pi[..., :, None]
    u_inv = jnp.swapaxes(v, -1, -2) * sqrt_pi[..., None, :]
    return EigenSystem(values=w.astype(out_dt), U=u.astype(out_dt),
                       U_inv=u_inv.astype(out_dt))


def eigen_from_q_reversible(q: jnp.ndarray, freqs: jnp.ndarray) -> EigenSystem:
    """Decompose an already-built reversible Q (known stationary freqs)."""
    sqrt_pi = jnp.sqrt(freqs)
    a = q * (sqrt_pi[..., :, None] / sqrt_pi[..., None, :])
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    w, v = _sym_eigh(a)
    return EigenSystem(
        values=w,
        U=v / sqrt_pi[..., :, None],
        U_inv=jnp.swapaxes(v, -1, -2) * sqrt_pi[..., None, :],
    )


def transition_probs(eig: EigenSystem, t: jnp.ndarray, clamp: bool = True) -> jnp.ndarray:
    """P(t) = U exp(values * t) U^{-1}, batched over the shape of t.

    t: [...] evolutionary distances (rate * time). Returns [..., S, S].
    This is the role of Beagle.updateTransitionMatrices (ref:
    BeagleDataLikelihoodDelegate.java:838) — but computed as one batched
    einsum so every branch and rate category lands on the MXU together.
    """
    e = jnp.exp(eig.values * t[..., None])  # [..., S]
    # HIGHEST precision: TPU's default single-pass bf16 matmul loses the
    # catastrophic cancellation in U exp U^-1 — small P entries come out
    # zero/negative and short branches go exactly diagonal (observed as
    # -inf site likelihoods on benchmark2 shapes)
    p = jnp.einsum(
        "ij,...j,jk->...ik",
        eig.U,
        e,
        eig.U_inv,
        preferred_element_type=e.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    if clamp:
        p = jnp.maximum(p, 0.0)
    return p


def transition_probs_expm(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P(t) = expm(Q t) for non-reversible Q (ComplexSubstitutionModel role,
    ref: src/dr/evomodel/substmodel/ComplexSubstitutionModel.java). Batched
    over t's shape via vmap of scaling-and-squaring."""
    flat_t = t.reshape(-1)
    ps = jax.vmap(lambda tt: jax.scipy.linalg.expm(q * tt))(flat_t)
    return jnp.maximum(ps.reshape(t.shape + q.shape), 0.0)
