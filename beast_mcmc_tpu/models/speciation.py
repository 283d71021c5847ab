"""Speciation (birth-death) tree priors.

Functional port-free redesign of the Gernhard (2008) conditioned
reconstructed process as parameterized by the reference (ref:
src/dr/evomodel/speciation/Gernhard08BirthDeathModel.java:220-260
logTreeProbability/logNodeProbability; YuleModel.java):

  r   = lambda - mu        (birth diff rate)
  a   = mu / lambda        (relative death rate; 0 => Yule)
  rho = sampling probability

density over internal-node heights x (unconditioned on root):
  logL = (n-1) log(r rho) + n log(1-a)
       + sum_internal [ -2 log(rho + ((1-rho)-a) e^{-r h}) - r h ]
       + extra root term [ -r h_root - log(rho + ((1-rho)-a) e^{-r h_root}) ]
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln


def birth_death_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    root: jnp.ndarray,
    birth_diff_rate,
    relative_death_rate=0.0,
    sample_probability=1.0,
    labeled: bool = True,
) -> jnp.ndarray:
    """Gernhard08 birth-death density on an ultrametric tree's node heights.

    labeled=True applies the LABELED coefficient 2^(n-1)/(n-1)! used by the
    reference's default <birthDeathModel> (logCoeff, Gernhard08BirthDeathModel
    .java:logCoeff LABELED branch).
    """
    dt = heights.dtype
    r = jnp.asarray(birth_diff_rate, dt)
    a = jnp.asarray(relative_death_rate, dt)
    rho = jnp.asarray(sample_probability, dt)
    n = n_taxa
    m = heights.shape[0]

    internal = jnp.arange(m) >= n
    h = heights
    mrh = -r * h
    z = jnp.log(rho + ((1.0 - rho) - a) * jnp.exp(mrh))
    node_terms = jnp.where(internal, -2.0 * z + mrh, 0.0)
    root_term = mrh[root] - z[root]

    c1 = (n - 1) * jnp.log(r * rho) + n * jnp.log1p(-a)
    if labeled:
        c1 = c1 + (n - 1) * jnp.log(2.0) - gammaln(jnp.asarray(n, dt))
    return c1 + jnp.sum(node_terms) + root_term


def yule_loglik(heights, n_taxa: int, root, birth_rate, labeled: bool = True):
    """Pure-birth special case (ref: YuleModel.java; a=0, rho=1)."""
    return birth_death_loglik(
        heights, n_taxa, root, birth_rate, 0.0, 1.0, labeled=labeled
    )


# ---------------------------------------------------------------------------
# Serially-sampled birth-death (Stadler 2010; ref:
# src/dr/evomodel/birthdeath/BirthDeathSerialSamplingModel.java:192-365 —
# p0/logq closed forms, origin-conditioned tree density)
# ---------------------------------------------------------------------------


def _bdss_c1(b, d, psi):
    return jnp.sqrt((b - d - psi) ** 2 + 4.0 * b * psi)


def _bdss_c2(b, d, p, psi):
    return -(b - d - 2.0 * b * p - psi) / _bdss_c1(b, d, psi)


def bdss_log_q(b, d, p, psi, t):
    """log q(t) (the reference computes q directly in log space,
    BirthDeathSerialSamplingModel.java:202-206)."""
    c1 = _bdss_c1(b, d, psi)
    c2 = _bdss_c2(b, d, p, psi)
    return c1 * t + 2.0 * jnp.log(jnp.exp(-c1 * t) * (1.0 - c2) + (1.0 + c2))


def bdss_p0(b, d, p, psi, t):
    """Probability of no sampled descendants after time t
    (BirthDeathSerialSamplingModel.java:192-200)."""
    c1 = _bdss_c1(b, d, psi)
    c2 = _bdss_c2(b, d, p, psi)
    e = jnp.exp(-c1 * t) * (1.0 - c2)
    return (b + d + psi + c1 * (e - (1.0 + c2)) / (e + (1.0 + c2))) / (2.0 * b)


def serial_birth_death_loglik(
    heights: jnp.ndarray,
    n_taxa: int,
    birth_rate,
    death_rate,
    psi,
    origin,
    sampling_prob=0.0,
    has_final_sample: bool = False,
):
    """Origin-conditioned serially-sampled birth-death tree density
    (BirthDeathSerialSamplingModel.calculateTreeLogLikelihood:295-365):

      logL = -logq(x0) [+ n log(4p) if final sample]
             + sum_internal [log b - logq(x_i)]
             + sum_{psi-sampled tips} [log psi + logq(y_j)]

    Tips at height 0 count as final-sample tips when has_final_sample,
    otherwise they are psi-sampled like the rest. Returns -inf when the
    origin is below the root.
    """
    dt = heights.dtype
    b = jnp.asarray(birth_rate, dt)
    d = jnp.asarray(death_rate, dt)
    s = jnp.asarray(psi, dt)
    p = jnp.asarray(sampling_prob, dt) if has_final_sample else jnp.asarray(0.0, dt)
    x0 = jnp.asarray(origin, dt)

    tip_h = heights[:n_taxa]
    int_h = heights[n_taxa:]
    at_present = tip_h <= 1e-12

    logL = -bdss_log_q(b, d, p, s, x0)
    if has_final_sample:
        n_present = jnp.sum(at_present)
        logL = logL + n_present * jnp.log(4.0 * p)
    logL = logL + jnp.sum(jnp.log(b) - bdss_log_q(b, d, p, s, int_h))
    tip_term = jnp.log(s) + bdss_log_q(b, d, p, s, tip_h)
    if has_final_sample:
        logL = logL + jnp.sum(jnp.where(at_present, 0.0, tip_term))
    else:
        logL = logL + jnp.sum(tip_term)
    root_h = jnp.max(int_h)
    return jnp.where(x0 >= root_h, logL, -jnp.inf)
