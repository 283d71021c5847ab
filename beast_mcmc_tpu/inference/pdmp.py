"""Piecewise-deterministic MCMC: Zig-Zag and Bouncy Particle samplers.

Roles of the reference's PDMP operators and their native core (ref:
src/dr/inference/operators/hmc/ReversibleZigZagOperator.java,
BouncyParticleOperator.java, and the C++ inner loops in
src/dr/evomodel/operators/NativeZigZag.java:175 — minimum-travel-time
search). TPU-native redesign: event times are simulated by Poisson
thinning against user-supplied gradient bounds inside a lax.while_loop —
no native library, gradients via jax.grad of the bound posterior.

Both operators are Gibbs-style (the PDMP flow leaves the target
invariant; velocities are refreshed each invocation), reporting
log-Hastings = +inf. Exactness requires `grad_bound` to dominate the
directional derivative along the trajectory; violations are clipped
(matching the practical behavior of bound-based ZZ implementations).
Positive parameters run in log space as in HmcOperator.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.hmc import HmcOperator


@dataclasses.dataclass
class ZigZagOperator(HmcOperator):
    """Zig-Zag process: velocities in {-1,+1}^d; coordinate i flips at
    rate max(0, v_i dU/dy_i). Simulated exactly by per-coordinate
    thinning against grad_bound (scalar or [dim])."""

    travel_time: float = 1.0
    grad_bound: float = 10.0
    max_events: int = 256
    adaptable: bool = False

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, "ZigZagOperator not bound"
        dt = tree.heights.dtype
        y0 = self._pack(params).astype(dt)
        dim = y0.shape[0]

        def u_grad(y):
            prms = self._unpack(params, y)
            lp = self._log_posterior(prms, tree)
            if self.log_transform:
                lp = lp + jnp.sum(y)
            return -lp

        grad_fn = jax.grad(u_grad)
        bounds = jnp.broadcast_to(jnp.asarray(self.grad_bound, dt), (dim,))
        lam_total = jnp.sum(bounds)
        horizon = jnp.asarray(self.travel_time, dt)

        k_v, k_loop = jax.random.split(key)
        v0 = jnp.where(
            jax.random.uniform(k_v, (dim,), dt) < 0.5, -1.0, 1.0
        ).astype(dt)

        def cond(c):
            t, y, v, k, i = c
            return (t < horizon) & (i < self.max_events)

        def body(c):
            t, y, v, k, i = c
            k, k_tau, k_coord, k_acc = jax.random.split(k, 4)
            tau = jax.random.exponential(k_tau, dtype=dt) / lam_total
            t_next = jnp.minimum(t + tau, horizon)
            y = y + v * (t_next - t)
            # proposed flip: coordinate ~ bounds/lam_total, thinned by the
            # true rate max(0, v_i dU_i) / bound_i
            coord = jax.random.categorical(k_coord, jnp.log(bounds))
            g = grad_fn(y)
            rate = jnp.maximum(v[coord] * g[coord], 0.0)
            accept = (
                jax.random.uniform(k_acc, dtype=dt)
                < jnp.minimum(rate / bounds[coord], 1.0)
            ) & (t_next < horizon)
            v = v.at[coord].multiply(jnp.where(accept, -1.0, 1.0))
            return t_next, y, v, k, i + 1

        _, y1, _, _, n_ev = jax.lax.while_loop(
            cond, body, (jnp.asarray(0.0, dt), y0, v0, k_loop, jnp.int32(0))
        )
        ok = jnp.all(jnp.isfinite(y1))
        y1 = jnp.where(ok, y1, y0)
        return (
            self._unpack(params, y1), tree,
            jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.nan, dt),
        )


@dataclasses.dataclass
class BouncyParticleOperator(HmcOperator):
    """Bouncy Particle Sampler: Gaussian velocity; bounces reflect v off
    grad U at rate max(0, v . grad U), plus velocity refreshment at rate
    refresh_rate (ergodicity). Thinned against grad_bound."""

    travel_time: float = 1.0
    grad_bound: float = 20.0
    refresh_rate: float = 1.0
    max_events: int = 256
    adaptable: bool = False

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, "BPS operator not bound"
        dt = tree.heights.dtype
        y0 = self._pack(params).astype(dt)
        dim = y0.shape[0]

        def u_grad(y):
            prms = self._unpack(params, y)
            lp = self._log_posterior(prms, tree)
            if self.log_transform:
                lp = lp + jnp.sum(y)
            return -lp

        grad_fn = jax.grad(u_grad)
        lam_bound = jnp.asarray(self.grad_bound, dt)
        lam_ref = jnp.asarray(self.refresh_rate, dt)
        lam_total = lam_bound + lam_ref
        horizon = jnp.asarray(self.travel_time, dt)

        k_v, k_loop = jax.random.split(key)
        v0 = jax.random.normal(k_v, (dim,), dt)

        def cond(c):
            t, y, v, k, i = c
            return (t < horizon) & (i < self.max_events)

        def body(c):
            t, y, v, k, i = c
            k, k_tau, k_which, k_acc, k_ref = jax.random.split(k, 5)
            tau = jax.random.exponential(k_tau, dtype=dt) / lam_total
            t_next = jnp.minimum(t + tau, horizon)
            y = y + v * (t_next - t)
            in_horizon = t_next < horizon
            is_refresh = (
                jax.random.uniform(k_which, dtype=dt) < lam_ref / lam_total
            )
            g = grad_fn(y)
            rate = jnp.maximum(jnp.dot(v, g), 0.0)
            bounce = (
                jax.random.uniform(k_acc, dtype=dt)
                < jnp.minimum(rate / lam_bound, 1.0)
            )
            gg = jnp.maximum(jnp.dot(g, g), 1e-30)
            v_bounce = v - 2.0 * jnp.dot(v, g) / gg * g
            v_refresh = jax.random.normal(k_ref, (dim,), dt)
            v_new = jnp.where(
                is_refresh, v_refresh, jnp.where(bounce, v_bounce, v)
            )
            v = jnp.where(in_horizon, v_new, v)
            return t_next, y, v, k, i + 1

        _, y1, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0.0, dt), y0, v0, k_loop, jnp.int32(0))
        )
        ok = jnp.all(jnp.isfinite(y1))
        y1 = jnp.where(ok, y1, y0)
        return (
            self._unpack(params, y1), tree,
            jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.nan, dt),
        )
