"""Bayesian-bridge shrinkage Gibbs operator.

ref: src/dr/inference/operators/shrinkage/
BayesianBridgeShrinkageOperator.java —
  * global scale: conjugate update of ν = τ^{-α}: ν | β ~ Gamma(c + p/α,
    rate d + Σ|β_j|^α), τ = ν^{-1/α} (:104-117);
  * local scales: λ_j = sqrt(1/(2 S_j)) with S_j an exponentially tilted
    one-sided stable(α/2) variate with tilt (β_j/τ)² (:154-176).

The tilted-stable draw uses the standard exact construction: one-sided
stable variates from the Kanter/Chambers-Mallows-Stuck representation
S = (A(U)/E)^{(1-γ)/γ} (U~U(0,π), E~Exp(1)), exponential tilting by
rejection, with the divide-and-conquer split S = Σ_{i=1}^n S_i (each of
scale n^{-1/γ}) so the per-piece acceptance exp(-t·S_i) stays bounded
away from zero for large tilts. Exact sampler; runs on host via
pure_callback (these are small-dimension shrinkage parameters).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _one_sided_stable(rng, gamma: float, size) -> np.ndarray:
    """Standard positive stable(gamma) via Kanter's representation."""
    u = rng.uniform(0.0, np.pi, size)
    e = rng.exponential(1.0, size)
    a = (np.sin(gamma * u) ** gamma
         * np.sin((1.0 - gamma) * u) ** (1.0 - gamma)
         / np.sin(u)) ** (1.0 / (1.0 - gamma))
    return (a / e) ** ((1.0 - gamma) / gamma)


def tilted_stable(rng, gamma: float, tilt: float) -> float:
    """Exponentially tilted one-sided stable: density ∝ e^{-tilt·s} f_γ(s).

    Divide-and-conquer: choose n with tilt·n^{-1/γ} = O(1) so each of the
    n rescaled pieces accepts with probability ≥ e^{-1}-ish."""
    n = max(1, int(np.ceil(tilt ** gamma)))
    scale = n ** (-1.0 / gamma)
    total = 0.0
    for _ in range(n):
        while True:
            s = float(_one_sided_stable(rng, gamma, ())) * scale
            if rng.uniform() <= math.exp(-tilt * s):
                total += s
                break
    return total


def draw_local_scales(seed: int, gamma: float, ratios2: np.ndarray
                      ) -> np.ndarray:
    """λ_j = sqrt(1/(2 S_j)), S_j tilted-stable(γ, tilt=ratios2_j)."""
    rng = np.random.default_rng(int(seed))
    out = np.empty(ratios2.shape[0])
    for j, t in enumerate(np.ravel(ratios2)):
        s = tilted_stable(rng, gamma, float(max(t, 1e-300)))
        out[j] = math.sqrt(1.0 / (2.0 * s))
    return out


@dataclasses.dataclass
class BayesianBridgeGibbsOperator:
    """Gibbs update of (globalScale, localScale) of a Bayesian-bridge
    prior over `coefficient` (ref class above)."""

    coefficient: str = ""
    global_scale: str = ""
    local_scale: str = ""       # "" = no local scales
    exponent: float = 0.25
    prior_shape: float = 0.0    # gamma prior on phi = tau^-alpha
    prior_scale: float = 1.0
    weight: float = 1.0
    target_acceptance: float = 0.234
    adaptable: bool = False

    def modified_params(self):
        out = [self.global_scale]
        if self.local_scale:
            out.append(self.local_scale)
        return tuple(out)

    @property
    def modifies_params(self):
        return self.modified_params()

    def initial_adapt(self):
        return 0.0

    def tuning(self, adapt_value):
        return None

    def propose(self, params, tree, key, tuning):
        alpha = self.exponent
        beta = jnp.ravel(params[self.coefficient])
        dt = beta.dtype
        k1, k2, k3 = jax.random.split(key, 3)

        # --- global scale: conjugate gamma on nu = tau^-alpha
        shape = beta.shape[0] / alpha
        rate = jnp.sum(jnp.abs(beta) ** alpha)
        if self.prior_shape > 0.0:
            shape = shape + self.prior_shape
            rate = rate + 1.0 / self.prior_scale
        phi = jax.random.gamma(k1, shape, dtype=dt) / rate
        tau = phi ** (-1.0 / alpha)
        old_g = params[self.global_scale]
        out = {**params, self.global_scale: jnp.reshape(
            tau, jnp.shape(old_g)).astype(old_g.dtype)}

        # --- local scales: tilted-stable draw on host (exact)
        if self.local_scale:
            ratios2 = jnp.square(beta / tau)
            seed = jax.random.randint(k2, (), 0, 2**31 - 1)
            lam = jax.pure_callback(
                lambda s, r2: draw_local_scales(
                    int(s), alpha / 2.0, np.asarray(r2, np.float64)
                ).astype(np.asarray(r2).dtype),
                jax.ShapeDtypeStruct(ratios2.shape, ratios2.dtype),
                seed, ratios2,
            )
            old_l = params[self.local_scale]
            # a declared localScale may be longer than the coefficient
            # vector; extra entries stay untouched
            flat = jnp.ravel(old_l).at[:lam.shape[0]].set(
                lam.astype(old_l.dtype))
            out[self.local_scale] = jnp.reshape(flat, jnp.shape(old_l))
        return out, tree, jnp.inf
