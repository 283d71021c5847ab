"""Spatiotemporal Hawkes (self-exciting point process) likelihood.

Role of the reference's Hawkes stack (ref:
src/dr/inference/hawkes/HawkesLikelihood.java:47-120 — parameter surface
(tauXprec, sigmaXprec, tauTprec, omega, theta, mu0) + locations/times;
the math lives in the native hph_jni core, NativeHPHSingleton.java:107,
implementing Holbrook et al. 2022 "Scalable Bayesian inference for
self-excitatory stochastic processes").

Model, for events (x_i, t_i), D spatial dims:
  lambda(x, t) = mu0/N * sum_j phi(x - x_j; tauX^-1) psi(t - t_j; tauT^-1)
               + theta * sum_{t_j < t} omega e^{-omega (t - t_j)}
                                       phi(x - x_j; sigmaX^-1)
with phi a Gaussian kernel and psi a Gaussian temporal background kernel.
  logL = sum_i log lambda(x_i, t_i) - Lambda(T),
  Lambda(T) ~= mu0 * (t_max - t_min) + theta * sum_j (1 - e^{-omega (T - t_j)}).

TPU-native: one [N,N] causal-masked broadcast; gradients wrt locations
and rates via jax.grad (the native getLocationGradient /
getRandomRatesGradient surface).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss_kernel(sq_dist, prec, d):
    return (prec / (2 * jnp.pi)) ** (d / 2.0) * jnp.exp(-0.5 * prec * sq_dist)


def hawkes_loglikelihood(
    locations: jnp.ndarray,  # [N, D]
    times: jnp.ndarray,  # [N] ascending event times
    sigma_x_prec,  # spatial precision of the triggering kernel
    tau_x_prec,  # spatial precision of the background KDE
    tau_t_prec,  # temporal precision of the background KDE
    omega,  # triggering decay rate
    theta,  # triggering weight (offspring mean)
    mu0,  # background intensity
) -> jnp.ndarray:
    n, d = locations.shape
    dt = locations.dtype
    sx = jnp.asarray(sigma_x_prec, dt)
    tx = jnp.asarray(tau_x_prec, dt)
    tt = jnp.asarray(tau_t_prec, dt)
    om = jnp.asarray(omega, dt)
    th = jnp.asarray(theta, dt)
    mu = jnp.asarray(mu0, dt)

    diff = locations[:, None, :] - locations[None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)  # [N,N]
    dt_mat = times[:, None] - times[None, :]  # t_i - t_j
    not_self = ~jnp.eye(n, dtype=bool)

    # background: leave-self-out spatiotemporal KDE
    bg_kern = _gauss_kernel(sq, tx, d) * _gauss_kernel(dt_mat * dt_mat, tt, 1)
    background = mu / n * jnp.sum(jnp.where(not_self, bg_kern, 0.0), axis=1)

    # self-excitation: only earlier events trigger
    causal = dt_mat > 0
    trig = th * om * jnp.exp(-om * dt_mat) * _gauss_kernel(sq, sx, d)
    excitation = jnp.sum(jnp.where(causal, trig, 0.0), axis=1)

    rates = background + excitation
    log_rates = jnp.sum(jnp.log(jnp.maximum(rates, 1e-300)))

    t_span = times[-1] - times[0]
    compensator = mu * t_span + th * jnp.sum(
        -jnp.expm1(-om * (times[-1] - times))
    )
    return log_rates - compensator


def hawkes_event_rates(locations, times, sigma_x_prec, tau_x_prec,
                       tau_t_prec, omega, theta, mu0):
    """Per-event intensity decomposition (background, excitation) — the
    diagnostic surface of the reference's rate provider."""
    n, d = locations.shape
    dt = locations.dtype
    diff = locations[:, None, :] - locations[None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    dt_mat = times[:, None] - times[None, :]
    not_self = ~jnp.eye(n, dtype=bool)
    bg_kern = _gauss_kernel(sq, jnp.asarray(tau_x_prec, dt), d) * _gauss_kernel(
        dt_mat * dt_mat, jnp.asarray(tau_t_prec, dt), 1)
    background = jnp.asarray(mu0, dt) / n * jnp.sum(
        jnp.where(not_self, bg_kern, 0.0), axis=1)
    causal = dt_mat > 0
    trig = (jnp.asarray(theta, dt) * jnp.asarray(omega, dt)
            * jnp.exp(-jnp.asarray(omega, dt) * dt_mat)
            * _gauss_kernel(sq, jnp.asarray(sigma_x_prec, dt), d))
    excitation = jnp.sum(jnp.where(causal, trig, 0.0), axis=1)
    return background, excitation
