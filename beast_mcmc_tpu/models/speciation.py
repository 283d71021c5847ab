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
