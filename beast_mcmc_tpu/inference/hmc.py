"""Hamiltonian Monte Carlo operators.

Role of the reference's HMC framework (ref: src/dr/inference/operators/hmc/
HamiltonianMonteCarloOperator.java:51-107 leapfrog + MassPreconditioner;
GradientWrtParameterProvider). The reference needs bespoke gradient
delegates per model (preorder/ BEAGLE edge derivatives); here jax.grad of
the posterior — which hits the peeling kernel's linear-time custom VJP —
gives exact gradients for ANY parameter set with no extra code.

Positive parameters run in log space: the operator targets
pi_y(y) = pi_x(e^y) e^y, and reports the Hastings correction
  logh = (sum y' - sum y) + (K_old - K_new)
so the host MH kernel (which compares pi_x) remains exact.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.operators import NEG_INF, Operator


@dataclasses.dataclass
class HmcOperator(Operator):
    """Leapfrog HMC over a named subset of continuous parameters.

    parameters: names of (scalar or vector) params; log_transform maps all
    of them through log (for positivity). mass: diagonal mass (scalar).
    Step size adapts via Robbins-Monro toward target_acceptance=0.8 (the
    hmc default; ref: HamiltonianMonteCarloOperator adaptation).
    """

    parameters: Sequence[str] = ()
    n_leapfrog: int = 10
    step_size: float = 0.1
    mass: float = 1.0  # scalar, or a [dim] vector for diagonal mass
    precondition: str = "none"  # "none" | "diag" | "low_rank"
    low_rank: int = 4  # curvature directions kept in low_rank mode
    log_transform: bool = True
    # General constrained->unconstrained bijection applied to the packed
    # vector (utils.transforms.Transform; ref: Transform.java:48 — the
    # reference's transformed-HMC path). Overrides log_transform.
    transform: Optional[object] = None
    adaptable: bool = True
    target_acceptance: float = 0.8
    _log_posterior: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False)

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def initial_adapt(self) -> float:
        return math.log((self.step_size))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def _pack(self, params):
        vals = [jnp.atleast_1d(params[n]) for n in self.parameters]
        flat = jnp.concatenate(vals)
        if self.transform is not None:
            return self.transform.forward(flat)
        return jnp.log(flat) if self.log_transform else flat

    def _ldj(self, y):
        """log |d constrained / d unconstrained| at y (the density and
        Hastings correction for sampling in unconstrained space)."""
        if self.transform is not None:
            return self.transform.log_det_jacobian_inverse(y)
        if self.log_transform:
            return jnp.sum(y)
        return jnp.asarray(0.0, jnp.result_type(y))

    def _unpack(self, params, y):
        if self.transform is not None:
            x = self.transform.inverse(y)
        else:
            x = jnp.exp(y) if self.log_transform else y
        out = dict(params)
        i = 0
        for n in self.parameters:
            v = params[n]
            k = max(1, int(jnp.size(v)))
            out[n] = x[i:i + k].reshape(jnp.shape(v))
            i += k
        return out

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, "HmcOperator not bound"
        lp_fn = self._log_posterior
        eps = tuning
        dt = tree.heights.dtype

        y0 = self._pack(params).astype(dt)

        def neg_log_py(y):
            prms = self._unpack(params, y)
            lp = lp_fn(prms, tree)
            return -(lp + self._ldj(y))

        grad_fn = jax.grad(neg_log_py)

        # mass preconditioning (ref: MassPreconditioner.java:51 — the
        # reference's Hessian-diagonal mass, recomputed on its update
        # schedule and treated as operator tuning; here it is refreshed at
        # the proposal's start point, same approximation class)
        low_rank_ops = None
        if self.precondition == "diag":
            hdiag = jnp.diagonal(jax.hessian(neg_log_py)(y0))
            mass = jnp.clip(jnp.abs(hdiag), 1e-8, 1e8)
        elif self.precondition == "low_rank":
            # low-rank Hessian mass (ref: MassPreconditioner.java:51
            # AdaptiveLowRank — top-k curvature directions get their
            # Hessian eigenvalue, the complement the median): mass
            # M = U_k diag(|l_k|) U_k^T + l_fill (I - U_k U_k^T)
            k_rank = min(self.low_rank, int(y0.shape[0]))
            h_full = jax.hessian(neg_log_py)(y0)
            h_full = 0.5 * (h_full + h_full.T)
            evals, evecs = jnp.linalg.eigh(h_full)
            mag = jnp.clip(jnp.abs(evals), 1e-8, 1e8)
            top = jnp.argsort(-mag)[:k_rank]
            u_k = evecs[:, top]
            l_k = mag[top]
            l_fill = jnp.median(mag)

            def m_mul(v):
                proj = u_k.T @ v
                return u_k @ (l_k * proj) + l_fill * (
                    v - u_k @ proj)

            def m_solve(v):
                proj = u_k.T @ v
                return u_k @ (proj / l_k) + (v - u_k @ proj) / l_fill

            def m_sample(kk):
                z = jax.random.normal(kk, y0.shape, dt)
                proj = u_k.T @ z
                return (u_k @ (jnp.sqrt(l_k) * proj)
                        + jnp.sqrt(l_fill) * (z - u_k @ proj))

            low_rank_ops = (m_mul, m_solve, m_sample)
            mass = None
        else:
            mass = jnp.asarray(self.mass, dt)

        k1, _ = jax.random.split(key)
        if low_rank_ops is not None:
            p0 = low_rank_ops[2](k1)
        else:
            p0 = jax.random.normal(k1, y0.shape, dt) * jnp.sqrt(mass)

        if low_rank_ops is not None:
            _, m_solve, _ = low_rank_ops

            def vel(p):
                return m_solve(p)

            def kinetic(p):
                return 0.5 * jnp.sum(p * m_solve(p))
        else:
            def vel(p):
                return p / mass

            def kinetic(p):
                return 0.5 * jnp.sum(p * p / mass)

        def leapfrog(_, carry):
            y, p = carry
            p = p - 0.5 * eps * grad_fn(y)
            y = y + eps * vel(p)
            p = p - 0.5 * eps * grad_fn(y)
            return y, p

        y1, p1 = jax.lax.fori_loop(0, self.n_leapfrog, leapfrog, (y0, p0))

        k_old = kinetic(p0)
        k_new = kinetic(p1)
        logh = (k_old - k_new) + self._ldj(y1) - self._ldj(y0)
        ok = jnp.all(jnp.isfinite(y1)) & jnp.isfinite(logh)
        logh = jnp.where(ok, logh, NEG_INF)
        y1 = jnp.where(ok, y1, y0)
        return self._unpack(params, y1), tree, logh


@dataclasses.dataclass
class NodeHeightHmcOperator(Operator):
    """HMC over ALL internal node heights of the current topology.

    The reference needs the NodeHeightTransform ratios machinery plus
    BEAGLE pre-order edge derivatives for this (ref: src/dr/evomodel/
    treedatalikelihood/discrete/NodeHeightTransform.java:42,
    NodeHeightToRatiosTransformDelegate.java); here the ratios map lives in
    tree/transforms.py and jax.grad differentiates straight through it and
    the peeling kernel.

    Unconstrained coordinates: z_i = logit(ratio_i) for internal non-root
    nodes, z_root = log(rootHeight - max tip height). HMC targets
    pi_z(z) = pi_h(h(z)) |dh/dz|; the outer MH kernel compares pi_h, so the
    returned Hastings term is K_old - K_new + log|dh/dz|(z1) - log|dh/dz|(z0).
    """

    n_leapfrog: int = 10
    step_size: float = 0.02
    mass: float = 1.0
    adaptable: bool = True
    target_acceptance: float = 0.8
    modifies_params = ()  # tree-only proposal
    _log_posterior: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False)

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def initial_adapt(self) -> float:
        return math.log(self.step_size)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        from beast_mcmc_tpu.tree.transforms import (
            heights_to_ratios,
            ratios_to_heights,
        )

        assert self._log_posterior is not None, "operator not bound"
        lp_fn = self._log_posterior
        eps = tuning
        dt = tree.heights.dtype
        n_taxa = tree.n_taxa
        parent, children, root = tree.parent, tree.children, tree.root
        tip_h = tree.heights[:n_taxa]
        max_tip = jnp.max(tip_h)
        internal = jnp.arange(n_taxa, parent.shape[0])
        is_root = internal == root

        ratios, rh = heights_to_ratios(parent, children, tree.heights, root, n_taxa)
        z0 = jnp.where(
            is_root,
            jnp.log(rh - max_tip),
            jax.scipy.special.logit(jnp.clip(ratios, 1e-12, 1.0 - 1e-12)),
        ).astype(dt)

        def h_of_z(z):
            r = jax.nn.sigmoid(z)
            root_h = max_tip + jnp.exp(jnp.sum(jnp.where(is_root, z, 0.0)))
            heights, logj = ratios_to_heights(
                parent, children, tip_h, r, root_h, root, n_taxa
            )
            # |dh/dz| = J(ratios->heights) * prod r(1-r) * (rootHeight-maxTip)
            logdet = logj + jnp.sum(
                jnp.where(is_root, z, jnp.log(r) + jnp.log1p(-r))
            )
            return heights, logdet

        def neg_log_pz(z):
            heights, logdet = h_of_z(z)
            return -(lp_fn(params, tree.replace(heights=heights)) + logdet)

        grad_fn = jax.grad(neg_log_pz)

        k1, _ = jax.random.split(key)
        p0 = jax.random.normal(k1, z0.shape, dt) * jnp.sqrt(self.mass)

        def leapfrog(_, carry):
            z, p = carry
            p = p - 0.5 * eps * grad_fn(z)
            z = z + eps * p / self.mass
            p = p - 0.5 * eps * grad_fn(z)
            return z, p

        z1, p1 = jax.lax.fori_loop(0, self.n_leapfrog, leapfrog, (z0, p0))

        k_old = 0.5 * jnp.sum(p0 * p0) / self.mass
        k_new = 0.5 * jnp.sum(p1 * p1) / self.mass
        h1, logdet1 = h_of_z(z1)
        _, logdet0 = h_of_z(z0)
        logh = (k_old - k_new) + logdet1 - logdet0
        ok = jnp.all(jnp.isfinite(h1)) & jnp.isfinite(logh)
        logh = jnp.where(ok, logh, NEG_INF)
        heights = jnp.where(ok, h1, tree.heights)
        return params, tree.replace(heights=heights), logh


@dataclasses.dataclass
class ReflectiveHmcOperator(Operator):
    """HMC with position reflection at fixed parameter bounds (ref:
    ReflectiveHamiltonianMonteCarloOperator.java:47 — leapfrog in the
    CONSTRAINED space; a step crossing a bound folds back and negates
    the momentum component; volume-preserving, so Hastings is the usual
    kinetic-energy difference)."""

    parameters: Sequence[str] = ()
    n_leapfrog: int = 10
    step_size: float = 0.1
    mass: float = 1.0
    lower: float = 0.0
    upper: float = jnp.inf
    adaptable: bool = True
    target_acceptance: float = 0.8
    _log_posterior: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False)

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def initial_adapt(self) -> float:
        return math.log(self.step_size)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def _pack(self, params):
        return jnp.concatenate(
            [jnp.atleast_1d(params[n]) for n in self.parameters])

    def _unpack(self, params, y):
        out = dict(params)
        i = 0
        for n in self.parameters:
            v = params[n]
            k = max(1, int(jnp.size(v)))
            out[n] = y[i:i + k].reshape(jnp.shape(v))
            i += k
        return out

    def _reflect(self, y, p):
        lo, hi = self.lower, self.upper
        if math.isfinite(lo) and math.isfinite(hi):
            span = hi - lo
            z = (y - lo) % (2 * span)
            y2 = lo + jnp.minimum(z, 2 * span - z)
            flip = z > span
        elif math.isfinite(lo):
            y2 = lo + jnp.abs(y - lo)
            flip = y < lo
        elif math.isfinite(hi):
            y2 = hi - jnp.abs(hi - y)
            flip = y > hi
        else:
            return y, p
        return y2, jnp.where(flip, -p, p)

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, "operator not bound"
        lp_fn = self._log_posterior
        eps = tuning
        dt = tree.heights.dtype
        y0 = self._pack(params).astype(dt)

        def neg_lp(y):
            return -lp_fn(self._unpack(params, y), tree)

        grad_fn = jax.grad(neg_lp)
        mass = jnp.asarray(self.mass, dt)
        p0 = jax.random.normal(key, y0.shape, dt) * jnp.sqrt(mass)

        def leapfrog(_, carry):
            y, p = carry
            p = p - 0.5 * eps * grad_fn(y)
            y = y + eps * p / mass
            y, p = self._reflect(y, p)
            p = p - 0.5 * eps * grad_fn(y)
            return y, p

        y1, p1 = jax.lax.fori_loop(0, self.n_leapfrog, leapfrog, (y0, p0))
        logh = (0.5 * jnp.sum(p0 * p0 / mass)
                - 0.5 * jnp.sum(p1 * p1 / mass))
        ok = jnp.all(jnp.isfinite(y1)) & jnp.isfinite(logh)
        logh = jnp.where(ok, logh, NEG_INF)
        y1 = jnp.where(ok, y1, y0)
        return self._unpack(params, y1), tree, logh


@dataclasses.dataclass
class GeodesicHmcOperator(Operator):
    """HMC on a product of unit spheres (ref:
    GeodesicHamiltonianMonteCarloOperator.java — factor-loading /
    eigenvector columns constrained to |x_i| = 1; the integrator
    alternates tangent-space kicks with exact great-circle moves, so
    the constraint holds to machine precision at every step).

    The parameter is interpreted as [n_blocks, block_dim] rows, each on
    the unit sphere."""

    parameter: str = ""
    block_dim: int = 2
    n_leapfrog: int = 10
    step_size: float = 0.1
    adaptable: bool = True
    target_acceptance: float = 0.8
    _log_posterior: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def modifies_params(self):
        return (self.parameter,)

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
        x0 = params[self.parameter]
        d = self.block_dim
        y0 = jnp.reshape(x0, (-1, d)).astype(dt)
        # project onto the spheres (guard against drift in the state)
        y0 = y0 / jnp.linalg.norm(y0, axis=1, keepdims=True)

        def neg_lp(y):
            p2 = {**params, self.parameter: y.reshape(
                jnp.shape(x0)).astype(x0.dtype)}
            return -self._log_posterior(p2, tree)

        grad_fn = jax.grad(neg_lp)

        def tangent(y, v):
            return v - jnp.sum(v * y, axis=1, keepdims=True) * y

        k1, _ = jax.random.split(key)
        p0 = tangent(y0, jax.random.normal(k1, y0.shape, dt))

        def geodesic(y, p, t):
            """Exact great-circle flow for time t (per block)."""
            speed = jnp.linalg.norm(p, axis=1, keepdims=True)
            safe = jnp.maximum(speed, 1e-30)
            u = p / safe
            a = speed * t
            y2 = y * jnp.cos(a) + u * jnp.sin(a)
            p2 = (-y * jnp.sin(a) + u * jnp.cos(a)) * speed
            moved = speed > 1e-20
            return (jnp.where(moved, y2, y), jnp.where(moved, p2, p))

        def leapfrog(_, carry):
            y, p = carry
            p = tangent(y, p - 0.5 * eps * grad_fn(y))
            y, p = geodesic(y, p, eps)
            p = tangent(y, p - 0.5 * eps * grad_fn(y))
            return y, p

        y1, p1 = jax.lax.fori_loop(0, self.n_leapfrog, leapfrog, (y0, p0))
        logh = 0.5 * (jnp.sum(p0 * p0) - jnp.sum(p1 * p1))
        ok = jnp.all(jnp.isfinite(y1)) & jnp.isfinite(logh)
        logh = jnp.where(ok, logh, NEG_INF)
        y1 = jnp.where(ok, y1, y0)
        return ({**params, self.parameter: y1.reshape(
            jnp.shape(x0)).astype(x0.dtype)}, tree, logh)


@dataclasses.dataclass
class SimplexHmcOperator(Operator):
    """HMC over a simplex-constrained parameter in ALR coordinates
    (ref: HamiltonianMonteCarloOperatorParser with UnitSimplexTransform —
    the reference runs leapfrog in the transformed unconstrained space;
    here y_i = log(x_i/x_K), x = softmax([y, 0]), log|J| = Σ log x_i)."""

    parameter: str = ""
    n_leapfrog: int = 5
    step_size: float = 0.01
    mass: float = 1.0
    adaptable: bool = True
    target_acceptance: float = 0.8
    _log_posterior: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def modifies_params(self):
        return (self.parameter,)

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def initial_adapt(self) -> float:
        return math.log(self.step_size)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None
        eps = tuning
        dt = tree.heights.dtype
        x0 = jnp.ravel(params[self.parameter]).astype(dt)
        k = x0.shape[0]
        y0 = jnp.log(x0[:-1]) - jnp.log(x0[-1])

        def x_of(y):
            z = jnp.concatenate([y, jnp.zeros((1,), dt)])
            return jax.nn.softmax(z)

        def neg_log_py(y):
            x = x_of(y)
            p2 = {**params, self.parameter: x.astype(
                params[self.parameter].dtype).reshape(
                jnp.shape(params[self.parameter]))}
            ldj = jnp.sum(jnp.log(x))
            return -(self._log_posterior(p2, tree) + ldj)

        grad = jax.grad(neg_log_py)
        kp, _ = jax.random.split(key)
        p0 = jnp.sqrt(jnp.asarray(self.mass, dt)) * jax.random.normal(
            kp, y0.shape, dt)

        def leap(_, c):
            y, p = c
            p = p - 0.5 * eps * grad(y)
            y = y + eps * p / self.mass
            p = p - 0.5 * eps * grad(y)
            return y, p

        y1, p1 = jax.lax.fori_loop(0, self.n_leapfrog, leap, (y0, p0))
        x1 = x_of(y1)
        # the chain's outer MH computes (lp1 - lp0) over x; the
        # transformed-HMC acceptance exp(H0 - H1) then leaves
        # logh = Δ(log-Jacobian) + Δ(kinetic)
        ldj0 = jnp.sum(jnp.log(x0))
        ldj1 = jnp.sum(jnp.log(x1))
        logh = (ldj1 - ldj0) + 0.5 * (
            jnp.sum(p0 * p0) - jnp.sum(p1 * p1)) / self.mass
        ok = jnp.isfinite(logh) & jnp.all(jnp.isfinite(x1))
        logh = jnp.where(ok, logh, NEG_INF)
        x1 = jnp.where(ok, x1, x0)
        old = params[self.parameter]
        return ({**params, self.parameter: x1.astype(old.dtype).reshape(
            jnp.shape(old))}, tree, logh)
