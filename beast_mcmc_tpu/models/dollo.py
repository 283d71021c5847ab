"""Stochastic Dollo (MSSD) likelihood: binary presence/absence traits
gained once, lost at rate delta.

Role of the reference's MSSD package (ref: src/dr/evomodel/MSSD/
ALSBeagleTreeLikelihood.java + AbstractObservationProcess — the
mutation-death model of Alekseyenko, Lee & Suchard 2008). A character is
gained once somewhere on the tree (uniform-over-branch-length origin,
rate lambda) and evolves by pure death (loss) below the origin.

  L(pattern) = sum_{v in anc-or-self(MRCA(present tips))}
                   w_v * post_v[present],
  w_v = integral of survival-to-v over the branch above v
      = (1 - e^{-delta t_v}) / delta   (root: immortal-origin weight),

with post computed by standard peeling under the death transition matrix
P(t) = [[1, 0], [1 - e^{-delta t}, e^{-delta t}]] (states 0=absent,
1=present). Patterns with presence outside subtree(v) contribute 0 for
that v automatically (never-gained tips are absent with probability 1).

TPU-native: one peeling pass over all patterns + a masked [nodes x
patterns] reduction; the origin integral is closed-form per branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.ops.peeling import peel_order_from_heights


def _death_p(delta, t):
    """[..., 2, 2] death-model transition matrix over time t."""
    e = jnp.exp(-delta * t)
    zeros = jnp.zeros_like(e)
    ones = jnp.ones_like(e)
    return jnp.stack([
        jnp.stack([ones, zeros], -1),
        jnp.stack([1.0 - e, e], -1),
    ], -2)


def stochastic_dollo_site_likelihoods(
    tip_presence: jnp.ndarray,  # bool/int [N, P]
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    death_rate,
    branch_rates=1.0,
) -> jnp.ndarray:
    """Per-pattern likelihood [P] (unnormalized over the gain rate: the
    reference multiplies by lambda and conditions on observability via
    its ObservationProcess; see stochastic_dollo_loglik)."""
    n, p = tip_presence.shape
    m = parent.shape[0]
    dt = heights.dtype
    delta = jnp.asarray(death_rate, dt)
    pidx = jnp.maximum(parent, 0)
    bl = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
    bl = bl * jnp.broadcast_to(jnp.asarray(branch_rates, dt), (m,))
    pmat = _death_p(delta, bl)  # [M, 2, 2]

    # peel: post[v, s, p]
    tips = jnp.stack([
        1.0 - tip_presence.astype(dt), tip_presence.astype(dt)
    ], axis=1)  # [N, 2, P]
    post = jnp.zeros((m, 2, p), dt).at[:n].set(tips)
    order = peel_order_from_heights(heights, n, parent)

    def step(post, node):
        l = children[node, 0]
        r = children[node, 1]
        xl = jnp.einsum("sj,jp->sp", pmat[l], post[l])
        xr = jnp.einsum("sj,jp->sp", pmat[r], post[r])
        return post.at[node].set(xl * xr), None

    post, _ = jax.lax.scan(step, post, order)

    # ancestor-or-self incidence over tips: anc[v, tip]
    idx = jnp.arange(m)
    q = jnp.where(parent < 0, idx, parent)
    anc = jnp.eye(m, dtype=bool)
    for _ in range(int(np.ceil(np.log2(max(m, 2)))) + 1):
        anc = anc | anc[:, q]
        q = q[q]
    covers_tips = anc[:, :n]  # [M, N]

    present = tip_presence.astype(bool)  # [N, P]
    # v valid for pattern p iff every present tip is under v
    misses = (~covers_tips).astype(dt) @ present.astype(dt)  # [M, P]
    valid = misses == 0

    # origin weights: expected survival opportunity on the branch above v
    w = -jnp.expm1(-delta * bl) / delta
    # the root's "branch" is the immortal origin above: weight 1/delta
    w = jnp.where(parent >= 0, w, 1.0 / delta)

    lik = jnp.sum(
        jnp.where(valid, post[:, 1, :], 0.0) * w[:, None], axis=0
    )  # [P]
    return lik


def stochastic_dollo_loglik(
    tip_presence: jnp.ndarray,
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    death_rate,
    gain_rate=1.0,
    branch_rates=1.0,
    pattern_weights=None,
    condition_on_observed: bool = True,
) -> jnp.ndarray:
    """Total log-likelihood with gain-rate scaling and the standard
    conditioning on the character being observable (present in >=1 tip),
    the reference's AnyTipObservationProcess."""
    n, p = tip_presence.shape
    dt = heights.dtype
    lam = jnp.asarray(gain_rate, dt)
    site_lik = stochastic_dollo_site_likelihoods(
        tip_presence, parent, children, heights, death_rate, branch_rates
    ) * lam
    if condition_on_observed:
        # P(observable) = lambda * (total weight) - P(all-absent patterns)
        all_absent = jnp.zeros((n, 1), tip_presence.dtype)
        p_unobs = stochastic_dollo_site_likelihoods(
            all_absent, parent, children, heights, death_rate, branch_rates
        )[0] * lam
        pidx = jnp.maximum(parent, 0)
        bl = jnp.where(parent >= 0, heights[pidx] - heights, 0.0)
        bl = bl * jnp.broadcast_to(jnp.asarray(branch_rates, dt), bl.shape)
        delta = jnp.asarray(death_rate, dt)
        total_w = jnp.sum(-jnp.expm1(-delta * bl) / delta) + 1.0 / delta
        p_obs = lam * total_w - p_unobs
        site_logl = jnp.log(site_lik) - jnp.log(p_obs)
    else:
        site_logl = jnp.log(site_lik)
    if pattern_weights is None:
        pattern_weights = jnp.ones((p,), dt)
    return jnp.dot(pattern_weights, site_logl)
