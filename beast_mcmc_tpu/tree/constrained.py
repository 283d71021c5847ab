"""Constrained tree model for Thorney BEAST at 10^4+ tips.

Role of the reference's ConstrainedTreeModel (ref:
src/dr/evomodel/bigfasttree/thorney/ConstrainedTreeModel.java:45): a
binary time-tree whose topology may only vary WITHIN the polytomies of a
(multifurcating) constraints tree — the backbone relationships are fixed,
divergence times are free everywhere. The reference maintains explicit
subtree objects and routes operators through them
(ConstrainedTreeOperator.java, UniformSubtreePruneRegraft.java); here the
constraint is a static per-node GROUP LABEL over the flat arrays: each
polytomy's randomly-resolved internal nodes share a group id, and a
topology move is legal exactly when the edges it re-wires lie inside one
group. Operators compute the (dynamic) eligible-edge set with one
vectorized mask and correct the Hastings ratio by the forward/reverse
eligible counts — no subtree objects, no host-side bookkeeping, jit-safe
at any scale.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from beast_mcmc_tpu.utils.accum import prefix_sum

from beast_mcmc_tpu.inference.operators import (
    NEG_INF,
    Operator,
    other_child,
    replace_child,
)


# ---------------------------------------------------------------------------
# host-side construction
# ---------------------------------------------------------------------------


def parse_multifurcating_newick(text: str):
    """Minimal multifurcating Newick parser (host-side): returns
    (names, kids) where kids is a list per node (tips first, then internal
    nodes in postorder; last node is the root) and names the tip labels."""
    text = text.strip().rstrip(";")
    names: List[str] = []
    kids: List[List[int]] = []
    internal_kids: List[List[int]] = []

    pos = 0

    def parse():
        nonlocal pos
        if text[pos] == "(":
            pos += 1
            ch = [parse()]
            while text[pos] == ",":
                pos += 1
                ch.append(parse())
            if text[pos] != ")":
                raise ValueError(f"expected ) at {pos}")
            pos += 1
            # optional label / branch length
            while pos < len(text) and text[pos] not in ",()":
                pos += 1
            internal_kids.append(ch)
            return ("i", len(internal_kids) - 1)
        start = pos
        while pos < len(text) and text[pos] not in ",():":
            pos += 1
        name = text[start:pos]
        while pos < len(text) and text[pos] not in ",()":
            pos += 1
        names.append(name)
        return ("t", len(names) - 1)

    root = parse()
    n = len(names)
    mapped = []
    for ch in internal_kids:
        mapped.append(
            [c[1] if c[0] == "t" else n + c[1] for c in ch]
        )
    return names, mapped, (root[1] if root[0] == "t" else n + root[1])


def build_constrained_tree(
    newick: str, rng: np.random.Generator, root_height: float = 1.0
):
    """Resolve a multifurcating constraints tree to a random binary tree.

    Returns (parent, children, heights, root, groups) flat arrays:
    `groups[node]` is the polytomy-resolution group of the EDGE ABOVE
    node's parent context — an NNI at node i is constraint-legal iff
    groups[parent(i)] == groups[grandparent(i)] (both wires inside one
    resolved polytomy). Inserted resolution nodes share their polytomy's
    group id; every original node gets a unique id (its edges are fixed).
    (ref: ConstrainedTreeModel.java subtree construction.)
    """
    names, kids, croot = parse_multifurcating_newick(newick)
    n_tips = len(names)
    n_internal_binary = n_tips - 1
    m = 2 * n_tips - 1
    parent = np.full(m, -1, np.int32)
    children = np.full((m, 2), -1, np.int32)
    heights = np.zeros(m)
    groups = np.zeros(m, np.int32)

    next_internal = [n_tips]
    next_group = [0]

    def depth_of(idx):
        # constraint-node depth (#tips below) for height spreading
        if idx < n_tips:
            return 1
        return sum(depth_of(c) for c in kids[idx - n_tips])

    import sys

    sys.setrecursionlimit(200000)

    def build(idx, top_height):
        """Returns (flat node id, height). Resolves polytomies randomly
        inside (child_max, top_height)."""
        if idx < n_tips:
            groups[idx] = next_group[0]
            next_group[0] += 1
            return idx, 0.0
        ch = kids[idx - n_tips]
        gid = next_group[0]
        next_group[0] += 1
        sub_top = top_height * 0.9
        built = [build(c, sub_top) for c in ch]
        # random sequential coalescence of the children within
        # (max child height, top_height)
        lo = max(h for _, h in built)
        levels = np.sort(
            rng.uniform(lo + 1e-9, top_height, size=len(built) - 1)
        )
        active = list(built)
        for k in range(len(built) - 1):
            i, j = rng.choice(len(active), size=2, replace=False)
            a, b = active[i], active[j]
            node = next_internal[0]
            next_internal[0] += 1
            h = float(levels[k])
            heights[node] = h
            groups[node] = gid
            children[node] = (a[0], b[0])
            parent[a[0]] = node
            parent[b[0]] = node
            active = [x for t, x in enumerate(active) if t not in (i, j)]
            active.append((node, h))
        return active[0]

    root_id, _ = build(croot, root_height)
    return (
        parent,
        children,
        heights,
        int(root_id),
        groups,
        names,
    )


def clades_of_constraints(newick: str):
    """Tip-name frozensets of every internal constraints-tree node —
    the invariants a constrained chain must preserve."""
    names, kids, croot = parse_multifurcating_newick(newick)
    n_tips = len(names)
    out = []

    def tips_below(idx):
        if idx < n_tips:
            return {names[idx]}
        s = set()
        for c in kids[idx - n_tips]:
            s |= tips_below(c)
        return s

    for i in range(len(kids)):
        out.append(frozenset(tips_below(n_tips + i)))
    return out


# ---------------------------------------------------------------------------
# constrained operators
# ---------------------------------------------------------------------------


def _eligible_nni_mask(tree, groups):
    """bool[M]: NNI at node i re-wires only intra-group edges, i.e.
    groups[parent(i)] == groups[grandparent(i)] (and i is not the root or
    a root child)."""
    m = tree.parent.shape[0]
    ip = tree.parent
    igp = tree.parent[jnp.maximum(ip, 0)]
    ok = (ip >= 0) & (igp >= 0)
    same = groups[jnp.maximum(ip, 0)] == groups[jnp.maximum(igp, 0)]
    return ok & same


@dataclasses.dataclass
class ConstrainedNNIOperator(Operator):
    """NNI restricted to polytomy-resolution groups (the constrained
    topology move of thorney BEAST; ref: ConstrainedTreeOperator.java +
    UniformSubtreePruneRegraft.java — same stationary distribution over
    the constraint-respecting tree space). Uniform over the dynamic
    eligible-edge set via Gumbel-max; Hastings = |eligible_fwd| /
    |eligible_rev|."""

    groups: np.ndarray = None
    modifies_params = ()

    def propose(self, params, tree, key, tuning):
        groups = jnp.asarray(self.groups)
        dt = tree.heights.dtype
        mask = _eligible_nni_mask(tree, groups)
        n_fwd = jnp.sum(mask)
        g = jax.random.gumbel(key, mask.shape)
        i = jnp.argmax(jnp.where(mask, g, -jnp.inf)).astype(
            tree.parent.dtype)
        ip = tree.parent[i]
        igp = tree.parent[ip]
        uncle = other_child(tree.children, igp, ip)
        valid = (
            (n_fwd > 0)
            & (tree.heights[uncle] < tree.heights[ip])
            & (tree.heights[i] < tree.heights[igp])
        )
        parent = tree.parent.at[i].set(igp).at[uncle].set(ip)
        children = replace_child(tree.children, ip, i, uncle)
        children = replace_child(children, igp, uncle, i)
        new_tree = tree.replace(parent=parent, children=children)
        n_rev = jnp.sum(_eligible_nni_mask(new_tree, groups))
        logh = jnp.log(n_fwd.astype(dt)) - jnp.log(
            jnp.maximum(n_rev, 1).astype(dt)
        )
        logh = jnp.where(valid & (n_rev > 0), logh, NEG_INF)
        # keep the old tree on invalid proposals (NaN-safe bookkeeping)
        sel = lambda a, b: jnp.where(valid, a, b)
        out_tree = tree.replace(
            parent=sel(new_tree.parent, tree.parent),
            children=sel(new_tree.children, tree.children),
        )
        return params, out_tree, logh


@dataclasses.dataclass
class ConstrainedUniformSPROperator(Operator):
    """Uniform subtree prune-regraft over branch-length measure, within
    polytomy-resolution groups (ref:
    src/dr/evomodel/bigfasttree/thorney/UniformSubtreePruneRegraft
    .java:68-190 + ConstrainedTreeOperator.java).

    Prune node i's parent edge; regraft uniformly over the total edge
    length above h_i on eligible edges (those whose parent node carries
    the same group label as i's parent), with the parent's NEW height the
    sampled point. i is drawn uniformly among nodes whose parent AND
    grandparent share a group (so the reverse attachment edge is always
    eligible); the pruned tree, i, and the group are identical in the
    reverse move, so the attachment point comes from the same length
    measure both ways and the Hastings ratio reduces to the forward/
    reverse i-pick-set size ratio.

    With all-equal groups this is the reference's unconstrained thorney
    UniformSubtreePruneRegraft. All steps are O(M) masked vector ops —
    no per-clade subtree objects (jit-safe at 10^4+ tips).
    """

    groups: np.ndarray = None
    modifies_params = ()

    def propose(self, params, tree, key, tuning):
        groups = jnp.asarray(self.groups)
        m = tree.parent.shape[0]
        fdt = tree.heights.dtype
        h = tree.heights
        k1, k2 = jax.random.split(key)

        # pick i uniformly where parent+grandparent exist and share a group
        mask_i = _eligible_nni_mask(tree, groups)
        n_fwd = jnp.sum(mask_i)
        gmb = jax.random.gumbel(k1, mask_i.shape)
        i = jnp.argmax(jnp.where(mask_i, gmb, -jnp.inf)).astype(
            tree.parent.dtype)
        ip = tree.parent[i]
        sib = other_child(tree.children, ip, i)
        gp = tree.parent[ip]
        g = groups[ip]
        hi = h[i]

        # pruned tree: bridge sib -> gp
        p_parent = tree.parent.at[sib].set(gp)
        p_children = replace_child(tree.children, gp, ip, sib)

        # eligible segments above h_i on edges whose parent is in group g
        px = jnp.maximum(p_parent, 0)
        hp = jnp.where(p_parent < 0, -jnp.inf, h[px])
        seg_lo = jnp.maximum(hi, h)
        seg = jnp.maximum(hp - seg_lo, 0.0)
        eligible = (p_parent >= 0) & (groups[px] == g)
        # the pruned subtree {i, iP} is not part of the remaining tree
        # (the reference's traversal never descends into it)
        eligible = eligible.at[ip].set(False).at[i].set(False)
        seg = jnp.where(eligible, seg, 0.0)
        total = jnp.sum(seg)

        # uniform point over the total length measure
        u = jax.random.uniform(k2, (), fdt) * total
        cum = prefix_sum(seg)
        j = jnp.argmax(cum > u).astype(ip.dtype)
        into = u - (cum[j] - seg[j])  # offset inside segment j
        new_height = seg_lo[j] + into
        jp = p_parent[j]

        # splice iP into <jP, j> at new_height
        children = replace_child(p_children, jp, j, ip)
        children = replace_child(children, ip, sib, j)
        parent = p_parent.at[ip].set(jp).at[j].set(ip)
        heights = h.at[ip].set(new_height)
        valid = (total > 0) & (n_fwd > 0)

        sel = lambda a, b: jnp.where(valid, a, b)
        out = tree.replace(
            parent=sel(parent, tree.parent),
            children=sel(children, tree.children),
            heights=sel(heights, tree.heights),
        )
        # attachment density 1/total cancels (same pruned tree + group in
        # reverse); only the i-pick-set sizes differ
        n_rev = jnp.sum(_eligible_nni_mask(out, groups))
        logq = jnp.log(jnp.maximum(n_fwd, 1).astype(fdt)) - jnp.log(
            jnp.maximum(n_rev, 1).astype(fdt))
        logq = jnp.where(valid & (n_rev > 0), logq, NEG_INF)
        return params, out, logq
