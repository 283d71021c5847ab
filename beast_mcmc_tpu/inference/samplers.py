"""Slice / elliptical-slice / multivariate-normal proposal operators.

Roles of the reference's SliceOperator, EllipticalSliceOperator and
AdaptableVarianceMultivariateNormalOperator (ref:
src/dr/inference/operators/SliceOperator.java,
EllipticalSliceOperator.java,
AdaptableVarianceMultivariateNormalOperator.java). All are redesigned as
branchless jit-safe kernels:

  - SliceOperator: Neal (2003) stepping-out + shrinkage on one coordinate,
    with lax.while_loop and a hard iteration cap. Gibbs-style (the slice
    update leaves the target invariant) -> log-Hastings = +inf.
  - EllipticalSliceOperator: Murray/Adams/MacKay elliptical slice for a
    parameter with a Gaussian prior factor. The operator subtracts the
    known Gaussian log-density from the bound posterior to recover the
    "likelihood" factor, so it composes with any posterior that includes
    that Gaussian prior. Gibbs-style.
  - MvnOperator: multivariate-normal random walk with a fixed covariance
    Cholesky and a Robbins-Monro-adapted global scale (the AVMVN role;
    the empirical-covariance phase is the runner's windowed
    `empirical_covariance` + rebuild, replacing the in-chain covariance
    accumulation of the reference which is cheap on a JVM but a bad fit
    for a jitted kernel).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.operators import NEG_INF, Operator

_MAX_STEPOUT = 32
_MAX_SHRINK = 64


@dataclasses.dataclass
class SliceOperator(Operator):
    """Univariate slice sampler on one (random) coordinate of `parameter`.

    width: initial bracket width. Positive parameters should use
    log_transform=True (slice in log space; the Jacobian is folded into
    the internal target so invariance holds on the original scale).
    """

    parameter: str = ""
    width: float = 1.0
    log_transform: bool = False
    _log_posterior: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False)

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, "SliceOperator not bound"
        lp_fn = self._log_posterior
        dt = tree.heights.dtype
        w = jnp.asarray(self.width, dt)
        x = params[self.parameter]
        flat = jnp.atleast_1d(x).astype(dt)
        dim = flat.shape[0]

        k_dim, k_h, k_u, k_shrink = jax.random.split(key, 4)
        idx = jax.random.randint(k_dim, (), 0, dim)

        def logf(v):
            val = jnp.exp(v) if self.log_transform else v
            new = flat.at[idx].set(val).reshape(jnp.shape(x))
            lp = lp_fn({**params, self.parameter: new}, tree)
            if self.log_transform:
                lp = lp + v  # Jacobian of exp
            return lp

        v0 = jnp.log(flat[idx]) if self.log_transform else flat[idx]
        # vertical level: log u + logf(x0), u ~ U(0,1) == logf - Exp(1)
        logy = logf(v0) - jax.random.exponential(k_h, dtype=dt)

        # stepping out
        u = jax.random.uniform(k_u, dtype=dt)
        lo0 = v0 - u * w
        hi0 = lo0 + w

        def out_cond(c):
            lo, hi, i = c
            return (i < _MAX_STEPOUT) & ((logf(lo) > logy) | (logf(hi) > logy))

        def out_body(c):
            lo, hi, i = c
            lo = jnp.where(logf(lo) > logy, lo - w, lo)
            hi = jnp.where(logf(hi) > logy, hi + w, hi)
            return lo, hi, i + 1

        lo, hi, _ = jax.lax.while_loop(
            out_cond, out_body, (lo0, hi0, jnp.int32(0))
        )

        # shrinkage
        def in_cond(c):
            v, lo, hi, k, i, found = c
            return (i < _MAX_SHRINK) & ~found

        def in_body(c):
            v, lo, hi, k, i, found = c
            k, k1 = jax.random.split(k)
            v_new = lo + jax.random.uniform(k1, dtype=dt) * (hi - lo)
            ok = logf(v_new) > logy
            lo = jnp.where(ok | (v_new >= v0), lo, v_new)
            hi = jnp.where(ok | (v_new < v0), hi, v_new)
            v = jnp.where(ok, v_new, v)
            return v, lo, hi, k, i + 1, found | ok

        v1, _, _, _, _, found = jax.lax.while_loop(
            in_cond, in_body,
            (v0, lo, hi, k_shrink, jnp.int32(0), jnp.asarray(False)),
        )
        val = jnp.exp(v1) if self.log_transform else v1
        new = flat.at[idx].set(val).reshape(jnp.shape(x))
        # Gibbs-style: the slice update is exact; if shrinkage failed to
        # find a point (cap hit) we stayed at x0, which is also valid.
        return (
            {**params, self.parameter: new},
            tree,
            jnp.asarray(jnp.inf, dt),
            jnp.asarray(jnp.nan, dt),
        )


@dataclasses.dataclass
class EllipticalSliceOperator(Operator):
    """Elliptical slice sampling for `parameter` with Gaussian prior
    N(prior_mean, prior_stdev^2 I) (a factor of the bound posterior).
    ref: EllipticalSliceOperator.java (Murray, Adams & MacKay 2010)."""

    parameter: str = ""
    prior_mean: float = 0.0
    prior_stdev: float = 1.0
    _log_posterior: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False)

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, "ESS operator not bound"
        lp_fn = self._log_posterior
        dt = tree.heights.dtype
        x = params[self.parameter]
        flat = jnp.atleast_1d(x).astype(dt)
        mean = jnp.asarray(self.prior_mean, dt)
        sd = jnp.asarray(self.prior_stdev, dt)

        def loglik(v):
            # posterior minus the Gaussian prior factor
            new = v.reshape(jnp.shape(x))
            lp = lp_fn({**params, self.parameter: new}, tree)
            logprior = jnp.sum(
                -0.5 * ((v - mean) / sd) ** 2 - jnp.log(sd)
                - 0.5 * jnp.log(2 * jnp.pi)
            )
            return lp - logprior

        k_nu, k_h, k_t, k_shrink = jax.random.split(key, 4)
        nu = jax.random.normal(k_nu, flat.shape, dt) * sd
        logy = loglik(flat) - jax.random.exponential(k_h, dtype=dt)
        theta0 = jax.random.uniform(k_t, dtype=dt) * 2 * jnp.pi
        lo0 = theta0 - 2 * jnp.pi
        hi0 = theta0

        def point(theta):
            return (flat - mean) * jnp.cos(theta) + nu * jnp.sin(theta) + mean

        def cond(c):
            theta, lo, hi, k, i, found = c
            return (i < _MAX_SHRINK) & ~found

        def body(c):
            theta, lo, hi, k, i, found = c
            ok = loglik(point(theta)) > logy
            lo = jnp.where(ok | (theta >= 0), lo, theta)
            hi = jnp.where(ok | (theta < 0), hi, theta)
            k, k1 = jax.random.split(k)
            theta_new = lo + jax.random.uniform(k1, dtype=dt) * (hi - lo)
            theta = jnp.where(ok, theta, theta_new)
            return theta, lo, hi, k, i + 1, found | ok

        theta, _, _, _, _, found = jax.lax.while_loop(
            cond, body,
            (theta0, lo0, hi0, k_shrink, jnp.int32(0), jnp.asarray(False)),
        )
        v1 = jnp.where(found, point(theta), flat)
        return (
            {**params, self.parameter: v1.reshape(jnp.shape(x))},
            tree,
            jnp.asarray(jnp.inf, dt),
            jnp.asarray(jnp.nan, dt),
        )


@dataclasses.dataclass
class MvnOperator(Operator):
    """Multivariate-normal random walk x' = x + s L eps over a named list
    of parameters, optionally in log space (positive params). L = Cholesky
    of the proposal covariance (identity by default); the global scale s
    adapts by Robbins-Monro (the AVMVN role, ref:
    AdaptableVarianceMultivariateNormalOperator.java)."""

    parameters: Sequence[str] = ()
    scale: float = 0.2
    chol: Optional[np.ndarray] = None  # [dim, dim] lower-triangular
    log_transform: bool = True
    adaptable: bool = True

    def initial_adapt(self) -> float:
        return float(np.log(self.scale))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def _pack(self, params):
        vals = [jnp.atleast_1d(params[n]) for n in self.parameters]
        flat = jnp.concatenate(vals)
        return jnp.log(flat) if self.log_transform else flat

    def _unpack(self, params, y):
        x = jnp.exp(y) if self.log_transform else y
        out = dict(params)
        i = 0
        for n in self.parameters:
            v = params[n]
            k = max(1, int(np.prod(np.shape(v)) or 1))
            out[n] = x[i:i + k].reshape(jnp.shape(v))
            i += k
        return out

    def propose(self, params, tree, key, tuning):
        dt = tree.heights.dtype
        y0 = self._pack(params).astype(dt)
        dim = y0.shape[0]
        eps = jax.random.normal(key, (dim,), dt)
        if self.chol is not None:
            eps = jnp.asarray(self.chol, dt) @ eps
        y1 = y0 + tuning * eps
        logh = jnp.asarray(0.0, dt)
        if self.log_transform:
            logh = jnp.sum(y1) - jnp.sum(y0)  # Jacobian correction
        return self._unpack(params, y1), tree, logh


def empirical_covariance(samples: np.ndarray, log_space: bool = True):
    """Windowed covariance estimation for MvnOperator (the adaptation
    phase of the AVMVN role): samples [n, dim] -> Cholesky factor."""
    s = np.log(samples) if log_space else np.asarray(samples)
    cov = np.cov(s, rowvar=False)
    cov = np.atleast_2d(cov) + 1e-8 * np.eye(s.shape[1])
    return np.linalg.cholesky(cov)


@dataclasses.dataclass
class AvmvnOperator(Operator):
    """IN-CHAIN adaptive-variance multivariate normal operator — the
    reference's AVMVN (ref: AdaptableVarianceMultivariateNormalOperator
    .java:59): a multivariate random walk whose proposal covariance is the
    running empirical covariance of the chain itself, mixed with an
    identity ridge,

        Sigma = s^2 * ((1-beta) * Cov_emp + beta * I / dim),

    with the global scale s adapted by Robbins-Monro toward 0.234.

    TPU-native in-chain form: the running (mean, scatter, n) Welford
    statistics live INSIDE the params pytree under `stats_key`, so they
    ride through the jitted lax.scan; `make_post_update([ops])` returns the
    per-step updater that `make_mcmc_step(post_update=...)` applies to the
    post-accept state (the reference updates every `updateEvery` steps
    from the chain state; updating every step is the same estimator).
    Positive parameters adapt in log space (`log_transform`), matching the
    reference's transform plumbing; the log-Jacobian Hastings term keeps
    the outer kernel exact.
    """

    parameters: Sequence[str] = ()
    scale: float = 0.2
    beta: float = 0.05
    warmup: int = 100  # steps before the empirical term switches on
    log_transform: bool = True
    adaptable: bool = True

    @property
    def stats_key(self) -> str:
        return "_avmvn:" + ",".join(self.parameters)

    def modified_params(self):
        return tuple(self.parameters)

    def initial_adapt(self) -> float:
        return float(np.log(self.scale))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def _pack(self, params):
        vals = [jnp.atleast_1d(params[n]).reshape(-1) for n in self.parameters]
        flat = jnp.concatenate(vals)
        return jnp.log(flat) if self.log_transform else flat

    def _unpack(self, params, y):
        x = jnp.exp(y) if self.log_transform else y
        out = dict(params)
        i = 0
        for n in self.parameters:
            v = params[n]
            k = max(1, int(np.prod(np.shape(v)) or 1))
            out[n] = x[i:i + k].reshape(jnp.shape(v))
            i += k
        return out

    def init_stats(self, params):
        """Seed the Welford statistics into the params pytree."""
        d = self._pack(params).shape[0]
        dt = self._pack(params).dtype
        out = dict(params)
        out[self.stats_key] = {
            "mean": jnp.zeros((d,), dt),
            "scatter": jnp.zeros((d, d), dt),
            "n": jnp.zeros((), dt),
        }
        return out

    def update_stats(self, params):
        """One Welford update from the CURRENT chain state (called by the
        post-update hook after accept/reject)."""
        st = params[self.stats_key]
        y = self._pack(params).astype(st["mean"].dtype)
        n1 = st["n"] + 1.0
        delta = y - st["mean"]
        mean = st["mean"] + delta / n1
        scatter = st["scatter"] + jnp.outer(delta, y - mean)
        out = dict(params)
        out[self.stats_key] = {"mean": mean, "scatter": scatter, "n": n1}
        return out

    def propose(self, params, tree, key, tuning):
        dt = tree.heights.dtype
        st = params[self.stats_key]
        y0 = self._pack(params).astype(dt)
        d = y0.shape[0]
        n = st["n"]
        cov_emp = st["scatter"] / jnp.maximum(n - 1.0, 1.0)
        use_emp = (n >= self.warmup).astype(dt)
        mix = (1.0 - self.beta) * use_emp
        cov = mix * cov_emp.astype(dt) + (
            (1.0 - mix) + self.beta * use_emp
        ) / d * jnp.eye(d, dtype=dt)
        chol = jnp.linalg.cholesky(cov + 1e-10 * jnp.eye(d, dtype=dt))
        eps = jax.random.normal(key, (d,), dt)
        y1 = y0 + tuning * (chol @ eps)
        logh = jnp.asarray(0.0, dt)
        if self.log_transform:
            logh = jnp.sum(y1) - jnp.sum(y0)
        ok = jnp.all(jnp.isfinite(y1))
        y1 = jnp.where(ok, y1, y0)
        logh = jnp.where(ok, logh, -jnp.inf)
        return self._unpack(params, y1), tree, logh


def make_post_update(operators):
    """Compose the per-step params updaters of all stateful adaptive
    operators (AVMVN Welford stats) into one post-accept hook for
    make_mcmc_step(post_update=...). Returns None when nothing is
    stateful."""
    stateful = [op for op in operators if hasattr(op, "update_stats")]
    if not stateful:
        return None

    def post_update(params):
        for op in stateful:
            params = op.update_stats(params)
        return params

    return post_update
