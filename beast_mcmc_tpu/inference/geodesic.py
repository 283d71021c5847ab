"""Geodesic HMC on the Stiefel manifold (orthonormal-column matrices).

Re-implements the reference's geodesic leapfrog (ref:
src/dr/inference/operators/hmc/GeodesicHamiltonianMonteCarloOperator.java:
updatePosition :453-563 — the Edelman-Arias-Smith geodesic flow
[X M]·exp(t[[A,-MᵀM],[I,A]])·diag(e^{-tA},e^{-tA}) followed by a
Cholesky re-orthonormalization; projectMomentum :565-586 — tangent-space
projection M -= X(A+Aᵀ)/2 with A = XᵀM) and the deterministic
unit-momentum report protocol (getReport :65-111: momentum[i] = i,
hastings = leapFrogGivenMomentum, ref
HamiltonianMonteCarloOperator.java:482-521).

Two implementations:
  * `geodesic_leapfrog_np` — numpy float64, bit-faithful to the
    reference semantics (block structure from mask /
    orthogonalityStructure), used by the XML <cachedReport> oracle path;
  * `StiefelGeodesicHmcOperator` — a JAX chain operator over a single
    whole-matrix block for in-chain sampling.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.operators import NEG_INF, Operator


# ---------------------------------------------------------------------------
# block structure (ref: GeodesicLeapFrogEngine ctor + parseStructureFromMask
# + setOrthogonalityStructure)
# ---------------------------------------------------------------------------


def blocks_from_mask(p: int, k: int, mask: Optional[np.ndarray]
                     ) -> List[Tuple[List[int], List[int]]]:
    """[(cols, rows)] orthonormality blocks. mask is the flat col-major
    0/1 vector (len p*k) or None (one whole-matrix block).
    ref: GeodesicHamiltonianMonteCarloOperator.java:147-202."""
    if mask is None:
        return [(list(range(k)), list(range(p)))]
    mask = np.ravel(np.asarray(mask))
    blocks: List[Tuple[List[int], List[int]]] = []
    for col in range(k):
        rows = [r for r in range(p) if mask[col * p + r] == 1]
        if not rows:
            continue
        for bc, br in blocks:
            if br == rows:
                bc.append(col)
                break
        else:
            blocks.append(([col], rows))
    return blocks


def apply_orthogonality_structure(blocks, groups):
    """Split blocks so each `group` of columns is its own orthonormal
    sub-block (ref: setOrthogonalityStructure :373-404; the parser passes
    1-based indices already shifted)."""
    for cols in groups:
        cols = sorted(cols)
        for bi, (bc, br) in enumerate(blocks):
            rem, ci = [], 0
            for c in bc:
                if ci < len(cols) and c == cols[ci]:
                    ci += 1
                else:
                    rem.append(c)
            if ci == len(cols):
                if rem:
                    blocks[bi] = (rem, br)
                    blocks.append((cols, br))
                break
        else:
            raise ValueError(
                "orthogonality structure incompatible with mask")
    return blocks


# ---------------------------------------------------------------------------
# numpy f64 leapfrog (the report oracle)
# ---------------------------------------------------------------------------


def _update_position_np(X, M, blocks, eps):
    from scipy.linalg import expm, solve_triangular

    for cols, rows in blocks:
        nC = len(cols)
        ix = np.ix_(rows, cols)
        Xb, Mb = X[ix], M[ix]
        A = Xb.T @ Mb
        S2 = Mb.T @ Mb
        VtV = np.block([[A, -S2], [np.eye(nC), A]])
        E1 = expm(-eps * A)
        Z = expm(eps * VtV) @ np.block(
            [[E1, np.zeros((nC, nC))], [np.zeros((nC, nC)), E1]])
        W = np.hstack([Xb, Mb]) @ Z
        Xn, Mn = W[:, :nC], W[:, nC:]
        # Cholesky re-orthonormalization X <- X L^{-T}, L Lᵀ = XᵀX
        # (ref :530-553)
        L = np.linalg.cholesky(Xn.T @ Xn)
        Xn = solve_triangular(L, Xn.T, lower=True).T
        X[ix], M[ix] = Xn, Mn


def _project_momentum_np(X, M, blocks):
    for cols, rows in blocks:
        ix = np.ix_(rows, cols)
        Xb, Mb = X[ix], M[ix]
        A = Xb.T @ Mb
        M[ix] = Mb - Xb @ ((A + A.T) / 2.0)


def geodesic_leapfrog_np(
    X0: np.ndarray,
    M0: np.ndarray,
    grad_fn: Callable[[np.ndarray], np.ndarray],
    n_steps: int,
    eps: float,
    blocks,
    grad_mask: Optional[np.ndarray] = None,
    draw_variance: float = 1.0,
) -> Tuple[np.ndarray, float]:
    """Run the reference's leapFrogGivenMomentum (ref:
    HamiltonianMonteCarloOperator.java:482-521) and return
    (final_position, hastings). X0/M0 are (p,k); grad_fn returns the
    (p,k) gradient of the log-density; grad_mask is an optional (p,k)
    0/1 mask applied to the gradient (masked entries' momenta are inert
    and cancel in the hastings difference)."""
    X = np.array(X0, float)
    M = np.array(M0, float)

    def kinetic():
        return 0.5 * draw_variance * float(np.sum(M * M))

    def kick(step):
        g = np.asarray(grad_fn(X), float)
        if grad_mask is not None:
            g = g * grad_mask
        M[:] = M + step * g
        _project_momentum_np(X, M, blocks)

    _project_momentum_np(X, M, blocks)
    prop = kinetic()
    kick(eps / 2.0)
    for i in range(n_steps):
        _update_position_np(X, M, blocks, eps)
        if i < n_steps - 1:
            kick(eps)
    kick(eps / 2.0)
    return X, prop - kinetic()


def deterministic_momentum(p: int, k: int) -> np.ndarray:
    """The report protocol's momentum: flat col-major m[i] = i
    (ref: GeodesicHamiltonianMonteCarloOperator.getReport:80-83)."""
    return np.arange(p * k, dtype=float).reshape((k, p)).T.copy()


# ---------------------------------------------------------------------------
# JAX chain operator (single whole-matrix Stiefel block)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class StiefelGeodesicHmcOperator(Operator):
    """In-chain geodesic HMC over column parameters forming a (p,k)
    orthonormal-column matrix (ref operator semantics above; momentum
    drawn N(0, drawVariance) in the tangent space)."""

    parameters: Tuple[str, ...] = ()  # column params, each length p
    n_leapfrog: int = 5
    step_size: float = 0.05
    draw_variance: float = 1.0
    adaptable: bool = True
    target_acceptance: float = 0.8
    _log_posterior: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def modifies_params(self):
        return tuple(self.parameters)

    def modified_params(self):
        return tuple(self.parameters)

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def initial_adapt(self) -> float:
        return math.log(self.step_size)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, "operator not bound"
        eps = tuning
        dt = tree.heights.dtype
        cols = [jnp.ravel(params[n]).astype(dt) for n in self.parameters]
        X0 = jnp.stack(cols, axis=1)  # (p, k)
        k = X0.shape[1]

        def put(X):
            out = dict(params)
            for j, n in enumerate(self.parameters):
                out[n] = X[:, j].astype(params[n].dtype).reshape(
                    jnp.shape(params[n]))
            return out

        def logp(X):
            return self._log_posterior(put(X), tree)

        grad = jax.grad(logp)

        def project(X, M):
            A = X.T @ M
            return M - X @ ((A + A.T) / 2.0)

        def update_position(X, M):
            A = X.T @ M
            S2 = M.T @ M
            VtV = jnp.block([[A, -S2], [jnp.eye(k, dtype=dt), A]])
            E1 = jax.scipy.linalg.expm(-eps * A)
            Z = jax.scipy.linalg.expm(eps * VtV) @ jnp.block(
                [[E1, jnp.zeros((k, k), dt)],
                 [jnp.zeros((k, k), dt), E1]])
            W = jnp.concatenate([X, M], axis=1) @ Z
            Xn, Mn = W[:, :k], W[:, k:]
            L = jnp.linalg.cholesky(Xn.T @ Xn)
            Xn = jax.scipy.linalg.solve_triangular(
                L, Xn.T, lower=True).T
            return Xn, Mn

        km, _ = jax.random.split(key)
        M0 = project(X0, jnp.sqrt(jnp.asarray(self.draw_variance, dt))
                     * jax.random.normal(km, X0.shape, dt))

        def body(i, carry):
            X, M = carry
            M = project(X, M + 0.5 * eps * grad(X))
            X, M = update_position(X, M)
            M = project(X, M + 0.5 * eps * grad(X))
            return X, M

        X1, M1 = jax.lax.fori_loop(0, self.n_leapfrog, body, (X0, M0))
        logh = 0.5 * (jnp.sum(M0 * M0) - jnp.sum(M1 * M1)) / jnp.asarray(
            self.draw_variance, dt)
        ok = jnp.all(jnp.isfinite(X1)) & jnp.isfinite(logh)
        logh = jnp.where(ok, logh, NEG_INF)
        X1 = jnp.where(ok, X1, X0)
        return put(X1), tree, logh
