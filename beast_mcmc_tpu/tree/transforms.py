"""Node-height <-> ratios change of variables for constrained-height HMC.

TPU-native role of the reference's NodeHeightTransform / ratios delegate
(ref: src/dr/evomodel/treedatalikelihood/discrete/NodeHeightTransform.java:42,
NodeHeightToRatiosTransformDelegate.java): internal-node heights are
reparameterized as

    h(node) = anchor(node) + ratio(node) * (h(parent(node)) - anchor(node))

where anchor(node) is the maximum tip height under the node (so the
order constraints h(node) > max child tip height and h(node) < h(parent)
become box constraints ratio in (0,1)), and the root height stays free
above the global anchor.  The map ratios -> heights is triangular, so

    log|J| = sum over internal non-root nodes of log(h(parent) - anchor)

Everything is jit-safe with static shapes: topology orders come from
pointer-doubling depths over the flat parent array (no recursion), so the
transform re-derives itself from whatever topology the chain currently
holds — the Java version rebuilds its update-order maps on tree-change
events; here it is just part of the traced function.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def node_depths(parent: jnp.ndarray) -> jnp.ndarray:
    """Hop count to the root for every node, by pointer doubling."""
    n = parent.shape[0]
    idx = jnp.arange(n)
    hop = jnp.where(parent >= 0, parent, idx)
    depth = (parent >= 0).astype(jnp.int32)
    for _ in range(int(np.ceil(np.log2(max(n, 2))))):
        depth = depth + depth[hop]
        hop = hop[hop]
    return depth


def _internal_orders(parent: jnp.ndarray, n_taxa: int):
    """(top_down, bottom_up) traversal orders over internal nodes."""
    depth = node_depths(parent)
    internal = jnp.arange(n_taxa, parent.shape[0])
    top_down = internal[jnp.argsort(depth[n_taxa:], stable=True)]
    return top_down, top_down[::-1]


def subtree_anchors(
    parent: jnp.ndarray,
    children: jnp.ndarray,
    tip_heights: jnp.ndarray,  # [n_taxa]
    n_taxa: int,
) -> jnp.ndarray:
    """anchor[node] = max tip height in node's subtree (tips: own height)."""
    n_nodes = parent.shape[0]
    _, bottom_up = _internal_orders(parent, n_taxa)
    anchors = jnp.concatenate(
        [tip_heights, jnp.full((n_nodes - n_taxa,), -jnp.inf, tip_heights.dtype)]
    )

    def up(a, node):
        val = jnp.maximum(a[children[node, 0]], a[children[node, 1]])
        return a.at[node].set(val), None

    anchors, _ = jax.lax.scan(up, anchors, bottom_up)
    return anchors


def heights_to_ratios(
    parent: jnp.ndarray,
    children: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    n_taxa: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (ratios [n_internal], root_height).  ratio of the root slot is 1
    by convention (unused); order matches node index n_taxa..n_nodes-1."""
    anchors = subtree_anchors(parent, children, heights[:n_taxa], n_taxa)
    internal = jnp.arange(n_taxa, parent.shape[0])
    par = parent[internal]
    span = heights[jnp.maximum(par, 0)] - anchors[internal]
    r = (heights[internal] - anchors[internal]) / jnp.where(span > 0, span, 1.0)
    is_root = internal == root
    return jnp.where(is_root, 1.0, r), heights[root]


def ratios_to_heights(
    parent: jnp.ndarray,
    children: jnp.ndarray,
    tip_heights: jnp.ndarray,
    ratios: jnp.ndarray,  # [n_internal], node-index order
    root_height,
    root,
    n_taxa: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (heights [n_nodes], log|J| of the ratios->heights map)."""
    n_nodes = parent.shape[0]
    anchors = subtree_anchors(parent, children, tip_heights, n_taxa)
    top_down, _ = _internal_orders(parent, n_taxa)
    heights = jnp.concatenate(
        [tip_heights, jnp.zeros((n_nodes - n_taxa,), tip_heights.dtype)]
    )
    heights = heights.at[root].set(root_height)

    def down(carry, node):
        h, logj = carry
        span = h[parent[node]] - anchors[node]
        val = anchors[node] + ratios[node - n_taxa] * span
        is_root = node == root
        h = h.at[node].set(jnp.where(is_root, h[node], val))
        logj = logj + jnp.where(is_root, 0.0, jnp.log(span))
        return (h, logj), None

    (heights, logj), _ = jax.lax.scan(
        down, (heights, jnp.zeros((), tip_heights.dtype)), top_down
    )
    return heights, logj
