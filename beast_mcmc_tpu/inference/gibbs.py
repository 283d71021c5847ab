"""Conjugate Gibbs operators.

The reference implements exact conditional samplers for conjugate blocks
(ref: src/dr/inference/operators/NormalNormalMeanGibbsOperator.java,
NormalGammaPrecisionGibbsOperator.java, and the GMRF block updater
GMRFSkyrideBlockUpdateOperator.java). Here each is a pure proposal that
draws the target block from its full conditional and reports
log_hastings = +inf — the MH kernel then always accepts (the reference
marks these GIBBS_OPERATOR for the same always-accept bypass,
MarkovChain.java:228-239).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.operators import Operator


@dataclasses.dataclass
class NormalNormalMeanGibbs(Operator):
    """mu | x ~ N((p0 m0 + n tau xbar)/(p0 + n tau), 1/(p0 + n tau)) for
    an iid Normal(mu, 1/tau) likelihood with a Normal(m0, 1/p0) prior on
    mu (ref: NormalNormalMeanGibbsOperator.java doOperation)."""

    mean_param: str = ""
    data_params: Sequence[str] = ()
    # precision accessor: params -> scalar tau of the likelihood
    precision_of: Optional[Callable] = None
    prior_mean: float = 0.0
    prior_stdev: float = 1.0
    adaptable: bool = False

    @property
    def modifies_params(self):
        return (self.mean_param,)

    def propose(self, params, tree, key, tuning):
        dt = tree.heights.dtype
        xs = jnp.concatenate(
            [jnp.ravel(params[n]) for n in self.data_params]).astype(dt)
        n = xs.shape[0]
        tau = jnp.asarray(self.precision_of(params), dt)
        p0 = jnp.asarray(1.0 / (self.prior_stdev ** 2), dt)
        m0 = jnp.asarray(self.prior_mean, dt)
        prec = p0 + n * tau
        mean = (p0 * m0 + tau * jnp.sum(xs)) / prec
        draw = mean + jax.random.normal(key, (), dt) / jnp.sqrt(prec)
        old = params[self.mean_param]
        new = jnp.broadcast_to(draw, jnp.shape(old)).astype(old.dtype)
        return {**params, self.mean_param: new}, tree, jnp.inf


@dataclasses.dataclass
class NormalGammaPrecisionGibbs(Operator):
    """tau | x ~ Gamma(a0 + n/2, rate0 + sum (x - mu)^2 / 2) for an iid
    Normal(mu, 1/tau) likelihood with Gamma(shape=a0, scale) prior on tau
    (ref: NormalGammaPrecisionGibbsOperator.java doOperation)."""

    precision_param: str = ""
    data_params: Sequence[str] = ()
    mean_of: Optional[Callable] = None  # params -> mu
    prior_shape: float = 1.0
    prior_scale: float = 1.0  # BEAST gammaPrior scale; rate = 1/scale
    adaptable: bool = False

    @property
    def modifies_params(self):
        return (self.precision_param,)

    def propose(self, params, tree, key, tuning):
        dt = tree.heights.dtype
        xs = jnp.concatenate(
            [jnp.ravel(params[n]) for n in self.data_params]).astype(dt)
        n = xs.shape[0]
        mu = jnp.asarray(self.mean_of(params), dt)
        sse = jnp.sum(jnp.square(xs - mu))
        shape = jnp.asarray(self.prior_shape, dt) + 0.5 * n
        rate = 1.0 / jnp.asarray(self.prior_scale, dt) + 0.5 * sse
        draw = jax.random.gamma(key, shape, dtype=dt) / rate
        old = params[self.precision_param]
        new = jnp.broadcast_to(draw, jnp.shape(old)).astype(old.dtype)
        return {**params, self.precision_param: new}, tree, jnp.inf
