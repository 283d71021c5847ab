"""Felsenstein pruning (peeling) partial likelihoods — the BEAGLE role.

TPU-native redesign of the reference's native likelihood engine (ref:
lib/beagle.jar updatePartials/accumulateScaleFactors/
calculateRootLogLikelihoods as driven by
src/dr/evomodel/treedatalikelihood/BeagleDataLikelihoodDelegate.java:
734-1018):

  - partials live in one [nodes, categories, states, patterns] tensor;
    patterns are the innermost (lane) axis so every node op is a batched
    [S,S]x[S,P] contraction — MXU/VPU shaped;
  - the post-order schedule is jnp.argsort of internal-node heights,
    computed on device (a parent is always older than its children, so
    height order IS a topological order) — this replaces the host-side
    dirty-flag traversal of TreeTraversal.java:41-131 and makes the whole
    likelihood a single jitted function of the tree arrays;
  - per-pattern max-rescaling at EVERY internal node, unconditionally —
    replaces the underflow-exception/rescale/retry machinery
    (BeagleDataLikelihoodDelegate.java:946-1004) with branchless code;
  - gradients: a custom linear-time VJP implementing the pre-order
    adjoint recursion (the role of beagle.updatePrePartials +
    calculateEdgeDerivative, ref: preorder/AbstractBeagleGradientDelegate
    .java:120,211-232). Scale factors are stop-gradient — exact, since
    the likelihood is invariant to the scaling values.

Functional double-buffering: proposed states are new pytrees; rejection
keeps the old one (replaces BufferIndexHelper.java:39-116).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def peel_order_from_heights(heights: jnp.ndarray, n_taxa: int,
                            parent: jnp.ndarray | None = None) -> jnp.ndarray:
    """Topological (child-before-parent) order over internal nodes.

    heights: [M] node heights. Returns int32[N-1] internal-node indices
    sorted by height. Valid because heights[parent] >= heights[child] is
    a tree invariant enforced by every operator. Trees with ZERO-LENGTH
    internal branches (parent height == child height, e.g. multifurcating
    newicks resolved with 0-length edges) make the height sort ambiguous;
    pass `parent` to break ties by root-distance (deeper nodes peel
    first), which is exact for any valid tree.
    """
    h = heights[n_taxa:]
    if parent is None:
        return jnp.argsort(h).astype(jnp.int32) + n_taxa
    m = heights.shape[0]
    # depth (edge count from root) by pointer doubling: O(M log M)
    jump = jnp.where(parent >= 0, parent, jnp.arange(m))
    d = (parent >= 0).astype(jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(m, 2)))))
    for _ in range(steps):
        d = d + d[jump]
        jump = jump[jump]
    # primary: height ascending; secondary: depth descending
    key = jnp.lexsort((-d[n_taxa:], h))
    return key.astype(jnp.int32) + n_taxa


def _node_op(p_l, p_r, post_l, post_r):
    """One peeling node op: (P_l @ post_l) * (P_r @ post_r).

    p_*: [C,S,S], post_*: [C,S,P] -> [C,S,P].
    """
    dt = post_l.dtype
    xl = jnp.einsum("csj,cjp->csp", p_l, post_l, preferred_element_type=dt, precision=jax.lax.Precision.HIGHEST)
    xr = jnp.einsum("csj,cjp->csp", p_r, post_r, preferred_element_type=dt, precision=jax.lax.Precision.HIGHEST)
    return xl * xr


@jax.custom_vjp
def peel_site_loglik(
    tip_partials: jnp.ndarray,  # [N, S, P] (category-independent tips)
    children: jnp.ndarray,  # int32[M, 2]
    order: jnp.ndarray,  # int32[N-1] peel order over internal nodes
    root: jnp.ndarray,  # int32 scalar
    p_matrices: jnp.ndarray,  # [M, C, S, S] branch-above-node matrices
    freqs: jnp.ndarray,  # [S]
    category_weights: jnp.ndarray,  # [C]
) -> jnp.ndarray:
    """Per-pattern log-likelihood [P]. Sum with pattern weights outside."""
    site_logl, _, _ = _peel_forward(
        tip_partials, children, order, root, p_matrices, freqs, category_weights
    )
    return site_logl


_PEEL_CHUNK = 8


def _chunked(order: jnp.ndarray, chunk: int = _PEEL_CHUNK) -> jnp.ndarray:
    """[K] -> [K/chunk, chunk], padded by REPEATING the last node.

    Reprocessing an already-peeled node recomputes the identical value
    from its (unchanged) children, so the padding is a no-op — this
    keeps the scan trip count low (sequential-step launch overhead is
    the cost driver for small-pattern partitions, e.g. the 1-pattern
    56-state geography CTMC) while XLA fuses the intra-chunk chain."""
    k = order.shape[0]
    pad = (-k) % chunk
    if pad:
        order = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1], (pad,))])
    return order.reshape(-1, chunk)


# category*pattern threshold below which the LEVEL-PARALLEL peel wins:
# small-pattern partitions (e.g. the 1-pattern 56-state geography CTMC)
# are bound by sequential scan-step latency, not FLOPs — processing all
# same-depth nodes in one batched masked update turns ~N scan steps into
# ~tree-depth while_loop iterations (valid because a parent is always
# STRICTLY shallower than its children)
_LEVEL_PEEL_MAX_CP = 8

# escape hatch: the level-parallel sweeps carry lax.while_loop, which
# reverse-mode cannot transpose — second-order consumers (Hessian
# reports, jacrev-of-grad) flip this off around their traces to get the
# scan-based sequential path, which differentiates to any order
_LEVEL_PEEL_ENABLED = True


class sequential_peel_only:
    """Context manager: force the sequential scan peel (re-entrant)."""

    def __enter__(self):
        global _LEVEL_PEEL_ENABLED
        self._prev = _LEVEL_PEEL_ENABLED
        _LEVEL_PEEL_ENABLED = False
        return self

    def __exit__(self, *exc):
        global _LEVEL_PEEL_ENABLED
        _LEVEL_PEEL_ENABLED = self._prev
        return False


def _internal_depths(children, n_tips):
    """Depth-from-root (edge count) of every node, from the children
    arrays alone (parent derived by scatter; pointer doubling)."""
    m = children.shape[0]
    ids = jnp.arange(n_tips, m)
    par = jnp.full((m,), -1, jnp.int32)
    par = par.at[children[n_tips:, 0]].set(ids.astype(jnp.int32))
    par = par.at[children[n_tips:, 1]].set(ids.astype(jnp.int32))
    jump = jnp.where(par >= 0, par, jnp.arange(m))
    d = (par >= 0).astype(jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(m, 2)))))
    for _ in range(steps):
        d = d + d[jump]
        jump = jump[jump]
    return d


def _peel_forward_levels(tip_partials, children, root, p_matrices,
                         freqs, cat_w):
    """Level-parallel forward peel: one masked batched node-op per tree
    level, deepest first. Exact same post/logscale as the sequential
    scan (node ops are independent within a level)."""
    n_tips, s, p = tip_partials.shape
    m = children.shape[0]
    c = p_matrices.shape[1]
    dt = p_matrices.dtype
    mi = m - n_tips

    post = jnp.zeros((m, c, s, p), dt)
    post = post.at[:n_tips].set(
        jnp.broadcast_to(tip_partials[:, None], (n_tips, c, s, p))
    )
    logscale = jnp.zeros((m, p), dt)

    depth = _internal_depths(children, n_tips)
    d_int = depth[n_tips:]  # [Mi]
    dmax = jnp.max(d_int)
    l_idx = children[n_tips:, 0]
    r_idx = children[n_tips:, 1]
    # loop-invariant child-edge matrices, gathered once
    p_l = p_matrices[l_idx]  # [Mi,C,S,S]
    p_r = p_matrices[r_idx]

    def body(carry):
        k, post, logscale = carry
        xl = jnp.einsum("mcsj,mcjp->mcsp", p_l, post[l_idx],
                        preferred_element_type=dt,
                        precision=jax.lax.Precision.HIGHEST)
        xr = jnp.einsum("mcsj,mcjp->mcsp", p_r, post[r_idx],
                        preferred_element_type=dt,
                        precision=jax.lax.Precision.HIGHEST)
        x = xl * xr
        scale = jnp.max(x, axis=(1, 2))  # [Mi,P]
        scale = jnp.where(scale > 0, scale, 1.0)
        new_post = x / scale[:, None, None, :]
        new_ls = (logscale[l_idx] + logscale[r_idx] + jnp.log(scale))
        mask = (d_int == k)
        post = post.at[n_tips:].set(
            jnp.where(mask[:, None, None, None], new_post, post[n_tips:]))
        logscale = logscale.at[n_tips:].set(
            jnp.where(mask[:, None], new_ls, logscale[n_tips:]))
        return k - 1, post, logscale

    _, post, logscale = jax.lax.while_loop(
        lambda cr: cr[0] >= 0, body, (dmax, post, logscale))

    site_lik = jnp.einsum(
        "c,s,csp->p", cat_w, freqs, post[root], preferred_element_type=dt
    )
    site_logl = jnp.log(site_lik) + logscale[root]
    return site_logl, post, site_lik


def _peel_bwd_levels(residuals, g):
    """Level-parallel adjoint sweep: parents strictly shallower than
    children, so processing levels SHALLOWEST-first preserves the
    pre-order dependency. Same outputs as the sequential bwd."""
    children, order, root, p_matrices, freqs, cat_w, post, site_lik = \
        residuals
    m, c, s, p = post.shape
    n_tips = (m + 1) // 2
    dt = post.dtype

    g_over_lik = (g / site_lik).astype(dt)
    adj = jnp.zeros((m, c, s, p), dt)
    adj = adj.at[root].set(
        cat_w[:, None, None] * freqs[None, :, None]
        * g_over_lik[None, None, :]
    )
    d_p = jnp.zeros_like(p_matrices)

    depth = _internal_depths(children, n_tips)
    d_int = depth[n_tips:]
    dmax = jnp.max(d_int)
    l_idx = children[n_tips:, 0]
    r_idx = children[n_tips:, 1]
    p_l = p_matrices[l_idx]
    p_r = p_matrices[r_idx]
    post_l_all = post[l_idx]
    post_r_all = post[r_idx]

    def body(carry):
        k, adj, d_p = carry
        xl = jnp.einsum("mcsj,mcjp->mcsp", p_l, post_l_all,
                        preferred_element_type=dt,
                        precision=jax.lax.Precision.HIGHEST)
        xr = jnp.einsum("mcsj,mcjp->mcsp", p_r, post_r_all,
                        preferred_element_type=dt,
                        precision=jax.lax.Precision.HIGHEST)
        x = xl * xr
        scale = jnp.max(x, axis=(1, 2))
        scale = jnp.where(scale > 0, scale, 1.0)
        b = adj[n_tips:] / scale[:, None, None, :]
        bl = b * xr
        br = b * xl
        adj_l = jnp.einsum("mcip,mcij->mcjp", bl, p_l,
                           preferred_element_type=dt)
        adj_r = jnp.einsum("mcip,mcij->mcjp", br, p_r,
                           preferred_element_type=dt)
        dp_l = jnp.einsum("mcip,mcjp->mcij", bl, post_l_all,
                          preferred_element_type=dt)
        dp_r = jnp.einsum("mcip,mcjp->mcij", br, post_r_all,
                          preferred_element_type=dt)
        mask = (d_int == k)
        # child indices are unique across nodes (one parent each), so
        # the masked scatters are race-free
        adj = adj.at[l_idx].set(
            jnp.where(mask[:, None, None, None], adj_l, adj[l_idx]))
        adj = adj.at[r_idx].set(
            jnp.where(mask[:, None, None, None], adj_r, adj[r_idx]))
        d_p = d_p.at[l_idx].set(
            jnp.where(mask[:, None, None, None], dp_l, d_p[l_idx]))
        d_p = d_p.at[r_idx].set(
            jnp.where(mask[:, None, None, None], dp_r, d_p[r_idx]))
        return k + 1, adj, d_p

    _, adj, d_p = jax.lax.while_loop(
        lambda cr: cr[0] <= dmax, body, (jnp.asarray(0, dmax.dtype),
                                         adj, d_p))

    root_post = post[root]
    d_freqs = jnp.einsum(
        "c,csp,p->s", cat_w, root_post, g_over_lik,
        preferred_element_type=dt
    )
    d_cat_w = jnp.einsum(
        "s,csp,p->c", freqs, root_post, g_over_lik,
        preferred_element_type=dt
    )
    return (None, None, None, None, d_p, d_freqs, d_cat_w)


def _peel_forward(tip_partials, children, order, root, p_matrices, freqs, cat_w):
    n_tips, s, p = tip_partials.shape
    m = children.shape[0]
    c = p_matrices.shape[1]
    dt = p_matrices.dtype

    if _LEVEL_PEEL_ENABLED and c * p <= _LEVEL_PEEL_MAX_CP:
        return _peel_forward_levels(
            tip_partials, children, root, p_matrices, freqs, cat_w)

    post = jnp.zeros((m, c, s, p), dt)
    post = post.at[:n_tips].set(
        jnp.broadcast_to(tip_partials[:, None], (n_tips, c, s, p))
    )
    logscale = jnp.zeros((m, p), dt)

    def step(carry, nodes):
        post, logscale = carry
        for i in range(nodes.shape[0]):
            node = nodes[i]
            l = children[node, 0]
            r = children[node, 1]
            x = _node_op(p_matrices[l], p_matrices[r], post[l], post[r])
            scale = jnp.max(x, axis=(0, 1))  # [P]
            scale = jnp.where(scale > 0, scale, 1.0)
            post = post.at[node].set(x / scale)
            logscale = logscale.at[node].set(
                logscale[l] + logscale[r] + jnp.log(scale)
            )
        return (post, logscale), None

    (post, logscale), _ = jax.lax.scan(step, (post, logscale),
                                       _chunked(order))

    site_lik = jnp.einsum(
        "c,s,csp->p", cat_w, freqs, post[root], preferred_element_type=dt
    )
    site_logl = jnp.log(site_lik) + logscale[root]
    return site_logl, post, site_lik


def _peel_fwd(tip_partials, children, order, root, p_matrices, freqs, cat_w):
    site_logl, post, site_lik = _peel_forward(
        tip_partials, children, order, root, p_matrices, freqs, cat_w
    )
    residuals = (children, order, root, p_matrices, freqs, cat_w, post, site_lik)
    return site_logl, residuals


def _peel_bwd(residuals, g):
    """Pre-order adjoint sweep. g: cotangent of site_logl, shape [P]."""
    children, order, root, p_matrices, freqs, cat_w, post, site_lik = residuals
    m, c, s, p = post.shape
    dt = post.dtype
    if _LEVEL_PEEL_ENABLED and c * p <= _LEVEL_PEEL_MAX_CP:
        return _peel_bwd_levels(residuals, g)

    # adjoint wrt stored (rescaled) post partials
    g_over_lik = (g / site_lik).astype(dt)  # [P]
    adj = jnp.zeros((m, c, s, p), dt)
    adj = adj.at[root].set(
        cat_w[:, None, None] * freqs[None, :, None] * g_over_lik[None, None, :]
    )
    d_p = jnp.zeros_like(p_matrices)

    def step(carry, nodes):
        adj, d_p = carry
        for i in range(nodes.shape[0]):
            adj, d_p = _bwd_node(adj, d_p, nodes[i])
        return (adj, d_p), None

    def _bwd_node(adj, d_p, node):
        l = children[node, 0]
        r = children[node, 1]
        p_l = p_matrices[l]
        p_r = p_matrices[r]
        post_l = post[l]
        post_r = post[r]
        xl = jnp.einsum("csj,cjp->csp", p_l, post_l, preferred_element_type=dt, precision=jax.lax.Precision.HIGHEST)
        xr = jnp.einsum("csj,cjp->csp", p_r, post_r, preferred_element_type=dt, precision=jax.lax.Precision.HIGHEST)
        x = xl * xr
        scale = jnp.max(x, axis=(0, 1))
        scale = jnp.where(scale > 0, scale, 1.0)  # stop-gradient: exact
        b = adj[node] / scale  # adjoint wrt pre-scale x
        bl = b * xr  # adjoint wrt xl
        br = b * xl
        # children adjoints: A_child[c,j,p] = sum_i b*other[c,i,p] P[c,i,j]
        adj = adj.at[l].set(
            jnp.einsum("cip,cij->cjp", bl, p_l, preferred_element_type=dt)
        )
        adj = adj.at[r].set(
            jnp.einsum("cip,cij->cjp", br, p_r, preferred_element_type=dt)
        )
        # edge-matrix gradients: dP[c,i,j] = sum_p b*other[c,i,p] post[c,j,p]
        d_p = d_p.at[l].set(
            jnp.einsum("cip,cjp->cij", bl, post_l, preferred_element_type=dt)
        )
        d_p = d_p.at[r].set(
            jnp.einsum("cip,cjp->cij", br, post_r, preferred_element_type=dt)
        )
        return adj, d_p

    (adj, d_p), _ = jax.lax.scan(step, (adj, d_p),
                                 _chunked(order[::-1]))

    root_post = post[root]
    d_freqs = jnp.einsum(
        "c,csp,p->s", cat_w, root_post, g_over_lik, preferred_element_type=dt
    )
    d_cat_w = jnp.einsum(
        "s,csp,p->c", freqs, root_post, g_over_lik, preferred_element_type=dt
    )
    # tip partials are data; no cotangent needed (None); ints get None too
    return (None, None, None, None, d_p, d_freqs, d_cat_w)


peel_site_loglik.defvjp(_peel_fwd, _peel_bwd)


def peel_loglikelihood(
    tip_partials,
    children,
    order,
    root,
    p_matrices,
    freqs,
    category_weights,
    pattern_weights,
) -> jnp.ndarray:
    """Total log-likelihood: weighted sum of per-pattern logL accumulated
    high — f64 under x64, compensated f32 otherwise (the role of
    calculateRootLogLikelihoods + pattern-weight reduction,
    BeagleDataLikelihoodDelegate.java:934; accumulation precision per the
    0.1 self-check contract, MarkovChain.java:55)."""
    from beast_mcmc_tpu.utils.accum import stable_dot

    site_logl = peel_site_loglik(
        tip_partials, children, order, root, p_matrices, freqs, category_weights
    )
    return stable_dot(pattern_weights, site_logl)


def pad_patterns(tip_partials: jnp.ndarray, pattern_weights: jnp.ndarray, multiple: int = 128):
    """Pad the pattern axis for lane alignment; padded columns get all-ones
    partials (numerically inert) and zero weight."""
    n, s, p = tip_partials.shape
    target = -(-p // multiple) * multiple
    if target == p:
        return tip_partials, pattern_weights
    pad = target - p
    tp = jnp.pad(tip_partials, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
    w = jnp.pad(pattern_weights, (0, pad))
    return tp, w
