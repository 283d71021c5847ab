"""Joint ancestral state reconstruction by pre-order sampling.

Role of dr.evomodel.treelikelihood.AncestralStateBeagleTreeLikelihood
(ref: AncestralStateBeagleTreeLikelihood.java:274,414 traverseSample):
draw a joint sample of states at every internal node, conditional on the
tip data — root from the posterior root distribution, then each child
given its parent's sampled state:

  P(child=j | parent=s) propto P_matrix[child][c,s,j] * post_child[c,j,p]

Runs as one reverse-height-order lax.scan over internal nodes; categories
are sampled per site first (the reference's behavior), then states.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.ops.peeling import _peel_forward


def sample_ancestral_states(
    tip_partials: jnp.ndarray,  # [N, S, P]
    children: jnp.ndarray,
    order: jnp.ndarray,  # peel order (height-sorted internal nodes)
    root,
    p_matrices: jnp.ndarray,  # [M, C, S, S]
    freqs: jnp.ndarray,
    category_weights: jnp.ndarray,
    key,
):
    """Returns (states int32[M, P], categories int32[P], site_logl [P])."""
    site_logl, post, site_lik = _peel_forward(
        tip_partials, children, order, root, p_matrices, freqs,
        category_weights)
    m, c, s, p = post.shape
    dt = post.dtype

    k_cat, k_root, k_nodes = jax.random.split(key, 3)

    # per-site category posterior: w_c * sum_i pi_i post_root[c,i,p]
    cat_post = jnp.einsum("c,i,cip->cp", category_weights, freqs, post[root])
    cats = jax.random.categorical(k_cat, jnp.log(cat_post.T + 1e-300))  # [P]

    # root states given category
    root_probs = freqs[None, :, None] * post[root]  # [C,S,P]
    root_given_cat = root_probs[cats, :, jnp.arange(p)]  # [P,S]
    states0 = jax.random.categorical(
        k_root, jnp.log(root_given_cat + 1e-300), axis=-1)  # [P]

    states = jnp.full((m, p), -1, jnp.int32)
    states = states.at[root].set(states0.astype(jnp.int32))

    def step(carry, inputs):
        states, key = carry
        node = inputs
        key, k1, k2 = jax.random.split(key, 3)
        parent_state = states[node]  # [P] (already sampled)
        for which, kk in ((0, k1), (1, k2)):
            child = children[node, which]
            pm = p_matrices[child]  # [C,S,S]
            # probs[P, S] = pm[cat_p, parent_state_p, :] * post[child][cat_p, :, p]
            pr = pm[cats, parent_state, :]  # [P,S]
            po = post[child][cats, :, jnp.arange(p)]  # [P,S]
            probs = pr * po
            st = jax.random.categorical(kk, jnp.log(probs + 1e-300), axis=-1)
            states = states.at[child].set(st.astype(jnp.int32))
        return (states, key), None

    # pre-order: parents before children = reverse height order, starting
    # from the root (order is child-before-parent, so reverse it)
    (states, _), _ = jax.lax.scan(step, (states, k_nodes), order[::-1])
    return states, cats.astype(jnp.int32), site_logl
