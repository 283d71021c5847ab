"""SPR-family tree operators: SubtreeSlide, SubtreeLeap, FNPR.

Roles of the reference's SubtreeSlideOperator (ref:
src/dr/evomodel/operators/SubtreeSlideOperator.java:89-330 — slide a
parent node up/down by delta, prune-regrafting across intersected edges;
Hastings = ratio of intersecting-edge counts), SubtreeLeapOperator (ref:
SubtreeLeapOperator.java:176-362 — patristic-distance leap to any edge at
distance delta, Hastings = |D|/|D'|) and FNPR (ref:
src/dr/evomodel/operators/FNPR.java:63-120 — fixed-height prune-regraft,
symmetric).

TPU-native redesign: the reference's recursive `intersectingEdges`
tree-walks become vectorized masks over the flat node arrays —
  subtree membership  : pointer-doubling reachability, O(M log M), no
                        recursion (replaces the Java recursion);
  intersecting edges  : subtree_mask & (h[n] < h <= h[parent[n]]);
  uniform pick        : cumsum + argmax over the mask.
All control flow is lax.switch/while_loop with static shapes; invalid
draws return log-Hastings = -inf (same MH semantics as the reference's
retry loops for the symmetric FNPR, exact for the others).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from beast_mcmc_tpu.utils.accum import prefix_sum
import numpy as np

from beast_mcmc_tpu.inference.operators import (
    NEG_INF,
    Operator,
    other_child,
    replace_child,
    sample_excluding,
)


def subtree_mask(parent: jnp.ndarray, top) -> jnp.ndarray:
    """bool[M]: nodes in the subtree rooted at `top` (inclusive), by
    parent-pointer doubling (log2(M) unrolled steps)."""
    m = parent.shape[0]
    idx = jnp.arange(m)
    q = jnp.where(parent < 0, idx, parent)  # root self-loop
    reach = idx == top
    for _ in range(int(np.ceil(np.log2(max(m, 2)))) + 1):
        reach = reach | reach[q]
        q = q[q]
    return reach


def intersecting_edges(parent, heights, smask, h):
    """Edges (parent[n], n) inside `smask` whose branch spans height h:
    heights[n] < h < heights[parent[n]] (the reference's
    intersectingEdges recursion, SubtreeSlideOperator.java:334-356)."""
    p = jnp.maximum(parent, 0)
    above = jnp.where(parent < 0, jnp.inf, heights[p])
    return smask & (heights < h) & (above > h)


def sample_masked(key, mask):
    """(uniform index among mask==True, count). Undefined index if count
    is 0 — callers must gate on count."""
    c = prefix_sum(mask.astype(jnp.int32))
    count = c[-1]
    k = jax.random.randint(key, (), 0, jnp.maximum(count, 1))
    idx = jnp.argmax(c == (k + 1)).astype(jnp.int32)
    return idx, count


@dataclasses.dataclass
class SubtreeSlideOperator(Operator):
    """ref: SubtreeSlideOperator.java. delta ~ N(0, size) (gaussian) or
    U(-size/2, size/2); slides parent(i) by delta, changing topology when
    the new height crosses other edges."""

    size: float = 1.0
    gaussian: bool = True
    adaptable: bool = True

    modifies_params = ()  # tree-only proposal

    def initial_adapt(self) -> float:
        return float(np.log(self.size))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        fdt = tree.heights.dtype
        k1, k2, k3 = jax.random.split(key, 3)
        i = sample_excluding(k1, m, tree.root[None])
        if self.gaussian:
            delta = jax.random.normal(k2, dtype=fdt) * tuning
        else:
            delta = (jax.random.uniform(k2, dtype=fdt) - 0.5) * tuning

        parent, children, heights, root = (
            tree.parent, tree.children, tree.heights, tree.root)
        ip = parent[i]
        cip = other_child(children, ip, i)
        pip = parent[ip]  # -1 when ip is root
        old_h = heights[ip]
        new_h = old_h + delta

        up = delta > 0
        topo_up = up & (pip >= 0) & (heights[jnp.maximum(pip, 0)] < new_h)
        down_invalid = (~up) & (new_h < heights[i])
        topo_down = (~up) & (~down_invalid) & (heights[cip] > new_h)
        case = jnp.where(
            down_invalid, 3, jnp.where(topo_up, 1, jnp.where(topo_down, 2, 0))
        )

        def no_topo(_):
            return parent, children, heights.at[ip].set(new_h), root, jnp.asarray(0.0, fdt)

        def slide_up(_):
            # walk up: find edge (new_parent, new_child) spanning new_h
            def cond(c):
                nc, npar = c
                return (npar >= 0) & (heights[jnp.maximum(npar, 0)] < new_h)

            def body(c):
                nc, npar = c
                return npar, parent[npar]

            new_child, new_parent = jax.lax.while_loop(cond, body, (ip, pip))
            is_new_root = new_parent < 0

            ch = replace_child(children, ip, cip, new_child)
            ch = replace_child(ch, pip, ip, cip)  # pip >= 0 in this case
            par = parent.at[cip].set(pip).at[new_child].set(ip)
            # non-root: insert ip on (new_parent, new_child)
            ch_nr = replace_child(ch, jnp.maximum(new_parent, 0), new_child, ip)
            par_nr = par.at[ip].set(new_parent)
            # new-root: ip becomes root above the old root (== new_child)
            par_r = par.at[ip].set(-1)
            ch = jnp.where(is_new_root, ch, ch_nr)
            par = jnp.where(is_new_root, par_r, par_nr)
            rt = jnp.where(is_new_root, ip, root).astype(root.dtype)
            h = heights.at[ip].set(new_h)
            # sources: edges in the NEW tree under new_child spanning old_h
            smask = subtree_mask(par, new_child)
            n_src = jnp.sum(intersecting_edges(par, h, smask, old_h))
            logq = -jnp.log(n_src.astype(fdt))
            return par, ch, h, rt, logq

        def slide_down(_):
            smask = subtree_mask(parent, cip)
            emask = intersecting_edges(parent, heights, smask, new_h)
            new_child, count = sample_masked(k3, emask)
            new_gp = parent[new_child]
            was_root = pip < 0
            ch = replace_child(children, ip, cip, new_child)
            ch_nr = replace_child(ch, jnp.maximum(pip, 0), ip, cip)
            ch = jnp.where(was_root, ch, ch_nr)
            ch = replace_child(ch, new_gp, new_child, ip)
            par = (
                parent.at[cip].set(pip)
                .at[new_child].set(ip)
                .at[ip].set(new_gp)
            )
            rt = jnp.where(was_root, cip, root).astype(root.dtype)
            h = heights.at[ip].set(new_h)
            logq = jnp.where(
                count > 0, jnp.log(count.astype(fdt)), NEG_INF
            )
            return par, ch, h, rt, logq

        def invalid(_):
            return parent, children, heights, root, jnp.asarray(NEG_INF, fdt)

        par, ch, h, rt, logq = jax.lax.switch(
            case, [no_topo, slide_up, slide_down, invalid], None
        )
        new_tree = tree.replace(parent=par, children=ch, heights=h, root=rt)
        return params, new_tree, logq


def _get_destinations(parent, children, heights, node, par, sib, delta):
    """SubtreeLeap destination set (ref: SubtreeLeapOperator.java:295-362):
    all edges at patristic distance delta from parent(node), as
    (mask[M], height[M]) with one insertion height per destination edge."""
    m = parent.shape[0]
    fdt = heights.dtype
    h_par = heights[par]
    h_node = heights[node]

    # downward destinations on the sibling's side
    h_below = h_par - delta
    smask = subtree_mask(parent, sib)
    mask0 = intersecting_edges(parent, heights, smask, h_below) & (
        h_below > h_node
    )
    dest_mask = mask0
    dest_h = jnp.where(mask0, h_below, jnp.zeros((m,), fdt))

    # walk up from par; at each crossed ancestor, mirror down its other side
    h_above = h_par + delta

    def cond(c):
        node1, done, dm, dh = c
        return ~done

    def body(c):
        node1, done, dm, dh = c
        parent1 = parent[node1]
        at_root = parent1 < 0
        p1 = jnp.maximum(parent1, 0)
        crossed = (~at_root) & (heights[p1] < h_above)
        # terminal: this edge (or the root) holds the destination height
        dm_term = dm.at[node1].set(True)
        dh_term = dh.at[node1].set(h_above)
        # crossing: mirror down the other child of parent1
        sibling1 = other_child(children, p1, node1)
        h_below1 = 2.0 * heights[p1] - h_above
        smask1 = subtree_mask(parent, sibling1)
        mask1 = intersecting_edges(parent, heights, smask1, h_below1) & (
            h_below1 > h_node
        )
        dm_cross = dm | mask1
        dh_cross = jnp.where(mask1, h_below1, dh)
        dm = jnp.where(crossed, dm_cross, dm_term)
        dh = jnp.where(crossed, dh_cross, dh_term)
        return p1, done | ~crossed, dm, dh

    _, _, dest_mask, dest_h = jax.lax.while_loop(
        cond, body,
        (par, jnp.asarray(False), dest_mask, dest_h),
    )
    return dest_mask, dest_h


@dataclasses.dataclass
class SubtreeLeapOperator(Operator):
    """ref: SubtreeLeapOperator.java — prune parent(node), regraft at
    patristic distance delta = |N(0, size)| (normal kernel), picking
    uniformly among all destination edges; Hastings = |D|/|D'|."""

    size: float = 1.0
    adaptable: bool = True
    target_acceptance: float = 0.225  # reference default for tree ops

    modifies_params = ()  # tree-only proposal

    def initial_adapt(self) -> float:
        return float(np.log(self.size))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        fdt = tree.heights.dtype
        k1, k2, k3 = jax.random.split(key, 3)
        delta = jnp.abs(jax.random.normal(k1, dtype=fdt)) * tuning
        node = sample_excluding(k2, m, tree.root[None])

        parent, children, heights, root = (
            tree.parent, tree.children, tree.heights, tree.root)
        par = parent[node]
        sib = other_child(children, par, node)
        gp = parent[par]  # -1 when par is root

        dmask, dheights = _get_destinations(
            parent, children, heights, node, par, sib, delta
        )
        j, count = sample_masked(k3, dmask)
        new_h = dheights[j]
        jp = parent[j]
        no_topo = (j == par) | (jp == par)

        def keep(_):
            return parent, children, root

        def move(_):
            was_root = gp < 0
            # detach: sibling takes par's place (or becomes root)
            ch = replace_child(children, jnp.maximum(gp, 0), par, sib)
            ch = jnp.where(was_root, children, ch)
            par_arr = parent.at[sib].set(gp)
            # attach on edge (jp, j) — or above the root when j is root
            j_is_root = jp < 0
            ch = replace_child(ch, par, sib, j)
            ch_attach = replace_child(ch, jnp.maximum(jp, 0), j, par)
            ch = jnp.where(j_is_root, ch, ch_attach)
            par_arr = par_arr.at[j].set(par).at[par].set(jp)
            rt = jnp.where(was_root, sib, root)
            rt = jnp.where(j_is_root, par, rt).astype(root.dtype)
            return par_arr, ch, rt

        par_arr, ch, rt = jax.lax.cond(no_topo, keep, move, None)
        h = heights.at[par].set(new_h)
        new_tree = tree.replace(parent=par_arr, children=ch, heights=h, root=rt)

        # reverse destination count from the new state
        sib_new = other_child(ch, par, node)
        rmask, _ = _get_destinations(par_arr, ch, h, node, par, sib_new, delta)
        rcount = jnp.sum(rmask)
        logq = jnp.log(count.astype(fdt)) - jnp.log(rcount.astype(fdt))
        logq = jnp.where(count > 0, logq, NEG_INF)
        return params, new_tree, logq


@dataclasses.dataclass
class FNPROperator(Operator):
    """ref: FNPR.java:63-120 — prune parent(i), regraft at its ORIGINAL
    height onto a uniformly drawn edge spanning that height. Symmetric;
    invalid draws -> -inf (replacing the reference's retry loop, which is
    also symmetric)."""

    modifies_params = ()  # tree-only proposal

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        fdt = tree.heights.dtype
        parent, children, heights, root = (
            tree.parent, tree.children, tree.heights, tree.root)
        k1, k2 = jax.random.split(key)
        i = sample_excluding(k1, m, root[None])
        ifa = parent[i]
        igf = parent[ifa]  # -1 when ifa is root
        ibro = other_child(children, ifa, i)
        h_fa = heights[ifa]
        new_child = jax.random.randint(k2, (), 0, m, dtype=parent.dtype)
        ngf = parent[new_child]
        valid = (
            (ifa != root)
            & (new_child != root)
            & (heights[new_child] < h_fa)
            & (heights[jnp.maximum(ngf, 0)] > h_fa)
            & (new_child != ifa)
            & (ngf != ifa)
        )
        ch = replace_child(children, ifa, ibro, new_child)
        ch = replace_child(ch, jnp.maximum(igf, 0), ifa, ibro)
        ch = replace_child(ch, jnp.maximum(ngf, 0), new_child, ifa)
        par = (
            parent.at[ibro].set(igf)
            .at[new_child].set(ifa)
            .at[ifa].set(ngf)
        )
        new_tree = tree.replace(parent=par, children=ch)
        logq = jnp.where(valid, 0.0, NEG_INF).astype(fdt)
        return params, new_tree, logq


@dataclasses.dataclass
class NNIOperator(Operator):
    """Nearest-neighbour interchange (ref:
    src/dr/evomodel/operators/NNI.java — pick a random non-root node whose
    parent is non-root, swap it with its uncle; equivalent move set to
    narrow exchange but drawn edge-first). Symmetric; invalid when the
    uncle is older than the node's parent."""

    modifies_params = ()  # tree-only proposal

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        root = tree.root
        # any node except root and the root's children (its parent must
        # have a grandparent)
        ex = jnp.stack([root, tree.children[root, 0], tree.children[root, 1]])
        i = sample_excluding(key, m, ex)
        ip = tree.parent[i]
        igp = tree.parent[ip]
        uncle = other_child(tree.children, igp, ip)
        valid = (tree.heights[uncle] < tree.heights[ip]) & (
            tree.heights[i] < tree.heights[igp]
        )
        parent = tree.parent.at[i].set(igp).at[uncle].set(ip)
        children = replace_child(tree.children, ip, i, uncle)
        children = replace_child(children, igp, uncle, i)
        tree = tree.replace(parent=parent, children=children)
        return params, tree, jnp.where(valid, 0.0, NEG_INF)


@dataclasses.dataclass
class FixedHeightSPROperator(Operator):
    """Fixed-height subtree prune-regraft (ref:
    src/dr/evomodel/operators/FixedHeightSubtreePruneRegraftOperator.java:66-133
    — prune the parent edge of a random node i (root and root children
    excluded) and regraft it, at its unchanged height, onto a uniform
    edge intersecting that height). The intersecting-edge count at the
    fixed height is conserved by the move, so the proposal is symmetric
    (the reference returns 0.0)."""

    modifies_params = ()  # tree-only proposal

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        root = tree.root
        h = tree.heights
        k1, k2 = jax.random.split(key)
        ex = jnp.stack([root, tree.children[root, 0], tree.children[root, 1]])
        i = sample_excluding(k1, m, ex)
        ip = tree.parent[i]
        cip = other_child(tree.children, ip, i)
        pip = tree.parent[ip]
        height = h[ip]
        # edges spanning `height`, excluding i's own edge and the sibling
        # edge (both touch iP exactly at `height`)
        allmask = jnp.ones((m,), bool)
        cand = intersecting_edges(tree.parent, h, allmask, height)
        cand = cand.at[i].set(False).at[cip].set(False)
        j, count = sample_masked(k2, cand)
        jp = tree.parent[j]
        valid = count > 0
        # detach iP (bridge CiP to PiP), splice iP into <jP, j>
        children = replace_child(tree.children, pip, ip, cip)
        children = replace_child(children, jp, j, ip)
        children = replace_child(children, ip, cip, j)
        parent = tree.parent.at[cip].set(pip).at[ip].set(jp).at[j].set(ip)
        tree = tree.replace(parent=parent, children=children)
        return params, tree, jnp.where(valid, 0.0, NEG_INF)


@dataclasses.dataclass
class ScaleNodeHeightOperator(Operator):
    """Scale one random internal (non-root) node height within its
    (oldest child, parent) window (ref:
    src/dr/evomodel/operators/ScaleNodeHeightOperator.java with
    NodeHeightOperatorParser.OperatorType SCALEALL=false; root handled by
    RootHeightScaleOperator)."""

    scale_factor: float = 0.9
    adaptable: bool = True

    modifies_params = ()  # tree-only proposal

    def initial_adapt(self) -> float:
        return math.log((1.0 / self.scale_factor - 1.0))

    def tuning(self, adapt_value):
        return 1.0 / (jnp.exp(adapt_value) + 1.0)

    def propose(self, params, tree, key, tuning):
        from beast_mcmc_tpu.inference.operators import _scale_draw

        m = tree.parent.shape[0]
        n_taxa = (m + 1) // 2
        k1, k2 = jax.random.split(key)
        r = jax.random.randint(k1, (), 0, m - n_taxa - 1,
                               dtype=tree.parent.dtype) + n_taxa
        node = r + (r >= tree.root).astype(r.dtype)
        s = _scale_draw(k2, tuning)
        new_h = tree.heights[node] * s
        lo = jnp.maximum(tree.heights[tree.children[node, 0]],
                         tree.heights[tree.children[node, 1]])
        hi = tree.heights[tree.parent[node]]
        ok = (new_h > lo) & (new_h < hi)
        tree = tree.replace(heights=tree.heights.at[node].set(new_h))
        return params, tree, jnp.where(ok, -jnp.log(s), NEG_INF)


@dataclasses.dataclass
class RandomWalkNodeHeightOperator(Operator):
    """Random-walk move on one random internal (non-root) node height
    (ref: src/dr/evomodel/operators/RandomWalkNodeHeightOperator.java);
    symmetric, rejected outside the (oldest child, parent) window."""

    window: float = 1.0
    adaptable: bool = True

    modifies_params = ()  # tree-only proposal

    def initial_adapt(self) -> float:
        return math.log((self.window))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        n_taxa = (m + 1) // 2
        k1, k2 = jax.random.split(key)
        r = jax.random.randint(k1, (), 0, m - n_taxa - 1,
                               dtype=tree.parent.dtype) + n_taxa
        node = r + (r >= tree.root).astype(r.dtype)
        delta = (jax.random.uniform(k2, dtype=tree.heights.dtype) * 2 - 1) * tuning
        new_h = tree.heights[node] + delta
        lo = jnp.maximum(tree.heights[tree.children[node, 0]],
                         tree.heights[tree.children[node, 1]])
        hi = tree.heights[tree.parent[node]]
        ok = (new_h > lo) & (new_h < hi)
        tree = tree.replace(heights=tree.heights.at[node].set(new_h))
        return params, tree, jnp.where(ok, 0.0, NEG_INF)


# ---------------------------------------------------------------------------
# tip-date sampling operators (ref: <leafHeight> parameters of
# TreeModelParser.java; the reference moves sampled tip heights with the
# generic scale/random-walk/uniform operators bound to those parameters)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TipHeightRandomWalkOperator(Operator):
    """Symmetric window move on one sampled tip's height; invalid when the
    tip would rise above its parent (or below zero)."""

    tip: int = 0
    window: float = 1.0
    adaptable: bool = True
    modifies_params = ()

    def initial_adapt(self) -> float:
        return float(np.log(self.window))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        h = tree.heights[self.tip]
        delta = jax.random.uniform(key, (), tree.heights.dtype,
                                   -tuning, tuning)
        h1 = h + delta
        parent_h = tree.heights[tree.parent[self.tip]]
        ok = (h1 >= 0.0) & (h1 < parent_h)
        logh = jnp.where(ok, 0.0, -jnp.inf)
        heights = tree.heights.at[self.tip].set(jnp.where(ok, h1, h))
        return params, tree.replace(heights=heights), logh


@dataclasses.dataclass
class TipHeightUniformOperator(Operator):
    """Uniform draw of one sampled tip's height on [0, parentHeight).
    The range depends only on the (unchanged) parent height -> symmetric."""

    tip: int = 0
    modifies_params = ()

    def propose(self, params, tree, key, tuning):
        parent_h = tree.heights[tree.parent[self.tip]]
        h1 = jax.random.uniform(key, (), tree.heights.dtype) * parent_h
        heights = tree.heights.at[self.tip].set(h1)
        return params, tree.replace(heights=heights), jnp.asarray(
            0.0, tree.heights.dtype)


@dataclasses.dataclass
class TipHeightScaleOperator(Operator):
    """BEAST scale draw on one sampled tip's height; log-Hastings -log s
    (ScaleOperator.java single-dimension case)."""

    tip: int = 0
    scale_factor: float = 0.75
    adaptable: bool = True
    modifies_params = ()

    def initial_adapt(self) -> float:
        return float(np.log(1.0 / self.scale_factor - 1.0))

    def tuning(self, adapt_value):
        return 1.0 / (jnp.exp(adapt_value) + 1.0)

    def propose(self, params, tree, key, tuning):
        u = jax.random.uniform(key, (), tree.heights.dtype)
        s = tuning + u * (1.0 / tuning - tuning)
        h = tree.heights[self.tip]
        h1 = h * s
        parent_h = tree.heights[tree.parent[self.tip]]
        ok = h1 < parent_h
        logh = jnp.where(ok, -jnp.log(s), -jnp.inf)
        heights = tree.heights.at[self.tip].set(jnp.where(ok, h1, h))
        return params, tree.replace(heights=heights), logh


def mrca_heights_from(parent: jnp.ndarray, heights: jnp.ndarray,
                      a) -> jnp.ndarray:
    """heights[MRCA(a, x)] for every node x, in O(M log M).

    Binary lifting: build parent jump tables up[k][x] = 2^k-th ancestor,
    mark a's ancestor-or-self chain (up-closed along any node's path to
    the root), then lift each x to its highest ancestor NOT on the chain;
    its parent is the MRCA. (Role of TreeUtils.getCommonAncestor in ref:
    src/dr/evomodel/operators/SubtreeJumpOperator.java:219-236, done for
    all x at once instead of one pointer chase per destination.)
    """
    m = parent.shape[0]
    idx = jnp.arange(m)
    safe = jnp.where(parent < 0, idx, parent)  # root self-loop

    # BOUNDED chain walk (depth <= m): a while_loop here would spin
    # forever if handed a cyclic parent array (e.g. a discarded garbage
    # splice from a zero-candidate proposal)
    def chain_step(_, c):
        cur, mask = c
        nxt = safe[cur]
        return nxt, mask.at[nxt].set(True)

    _, anc_a = jax.lax.fori_loop(
        0, m, chain_step,
        (jnp.asarray(a, safe.dtype), jnp.zeros((m,), bool).at[a].set(True)))

    # jump tables
    ups = [safe]
    steps = max(int(np.ceil(np.log2(max(m, 2)))), 1)
    for _ in range(steps):
        ups.append(ups[-1][ups[-1]])

    # lift every x to the highest ancestor still below the chain
    cur = idx
    for up in reversed(ups):
        nxt = up[cur]
        cur = jnp.where(anc_a[nxt], cur, nxt)
    mrca = jnp.where(anc_a[idx], idx, safe[cur])
    return heights[mrca]


@dataclasses.dataclass
class SubtreeJumpOperator(Operator):
    """Adaptive fixed-height SPR with distance-weighted destinations
    (ref: src/dr/evomodel/operators/SubtreeJumpOperator.java:82-175).

    Prune the parent edge of node i (root and root children excluded)
    and regraft at its unchanged height onto an intersecting edge chosen
    with probability ∝ Cauchy(h_MRCA(iP, j) − h_iP; scale=size) — bolder
    moves for larger `size`, which is the adapted tuning parameter.
    Hastings = log P(reverse pick = old sibling) − log P(forward pick).

    Note: the reference's getNormalizedProbabilities computes the Cauchy
    log-pdfs into `lpdfs` but normalizes the zero-filled `weights` array
    (SubtreeJumpOperator.java:218-243), silently degrading to uniform
    weights; here the intended Cauchy weighting is implemented (any
    self-consistent forward/reverse weighting is a valid MH proposal).
    """

    size: float = 1.0
    uniform: bool = False
    adaptable: bool = True
    modifies_params = ()

    def initial_adapt(self) -> float:
        return math.log(self.size)

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def _log_weights(self, parent, heights, ip, height, cand, size):
        fdt = heights.dtype
        if self.uniform:
            return jnp.where(cand, 0.0, NEG_INF).astype(fdt)
        d = mrca_heights_from(parent, heights, ip) - height
        logw = -jnp.log1p(jnp.square(d / size))  # Cauchy kernel (scale s)
        return jnp.where(cand, logw, NEG_INF).astype(fdt)

    def propose(self, params, tree, key, tuning):
        m = tree.parent.shape[0]
        fdt = tree.heights.dtype
        root = tree.root
        h = tree.heights
        size = tuning if self.adaptable else jnp.asarray(self.size, fdt)
        k1, k2 = jax.random.split(key)
        ex = jnp.stack([root, tree.children[root, 0], tree.children[root, 1]])
        i = sample_excluding(k1, m, ex)
        ip = tree.parent[i]
        cip = other_child(tree.children, ip, i)
        pip = tree.parent[ip]
        height = h[ip]
        allmask = jnp.ones((m,), bool)
        cand = intersecting_edges(tree.parent, h, allmask, height)
        cand = cand.at[i].set(False).at[cip].set(False)
        count = jnp.sum(cand)
        logw = self._log_weights(tree.parent, h, ip, height, cand, size)
        norm = jax.nn.log_softmax(logw)
        j = jax.random.categorical(k2, logw).astype(jnp.int32)
        log_forward = norm[j]
        jp = tree.parent[j]
        # detach iP (bridge CiP to PiP), splice iP into <jP, j>
        children = replace_child(tree.children, pip, ip, cip)
        children = replace_child(children, jp, j, ip)
        children = replace_child(children, ip, cip, j)
        parent = tree.parent.at[cip].set(pip).at[ip].set(jp).at[j].set(ip)
        # zero candidates: the categorical draw above is garbage and the
        # splice can create a CYCLE — keep the original arrays (the move
        # is rejected via -inf anyway; a cyclic parent would hang the
        # MRCA chain walk and corrupt downstream peels)
        valid = count > 0
        parent = jnp.where(valid, parent, tree.parent)
        children = jnp.where(valid, children, tree.children)
        # reverse: same height, destinations in the NEW tree, pick = CiP
        cand2 = intersecting_edges(parent, h, allmask, height)
        cand2 = cand2.at[i].set(False).at[j].set(False)
        logw2 = self._log_weights(parent, h, ip, height, cand2, size)
        log_reverse = jax.nn.log_softmax(logw2)[cip]
        tree = tree.replace(parent=parent, children=children)
        logq = jnp.where(valid, log_reverse - log_forward, NEG_INF)
        return params, tree, logq.astype(fdt)


@dataclasses.dataclass
class GibbsPruneAndRegraftOperator(Operator):
    """Gibbs-weighted fixed-height prune-and-regraft (ref:
    src/dr/evomodel/operators/GibbsPruneAndRegraft.java:81-158).

    Prune node i's parent edge and regraft onto an intersecting edge j
    chosen with probability ∝ the POSTERIOR of the regrafted tree. The
    reference evaluates each candidate tree serially through BEAGLE;
    here the candidate surgeries are vmapped and scored in ONE batched
    posterior evaluation — the peeling einsums batch over candidates on
    the MXU, so the cost is one [M, patterns, states] batch instead of M
    round trips. Hastings (GibbsPruneAndRegraft.java:148-155):
      log( (back/(sum − fwd + back)) / (fwd/sum) ).
    Expensive per call (M posterior evaluations' FLOPs) — intended for
    small/medium trees or low schedule weight, exactly like the ref.
    """

    modifies_params = ()
    _log_posterior = None

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, (
            "GibbsPruneAndRegraftOperator requires make_mcmc_step binding")
        m = tree.parent.shape[0]
        fdt = tree.heights.dtype
        root = tree.root
        h = tree.heights
        k1, k2 = jax.random.split(key)
        ex = jnp.stack([root, tree.children[root, 0], tree.children[root, 1]])
        i = sample_excluding(k1, m, ex)
        ip = tree.parent[i]
        cip = other_child(tree.children, ip, i)
        pip = tree.parent[ip]
        height = h[ip]
        allmask = jnp.ones((m,), bool)
        cand = intersecting_edges(tree.parent, h, allmask, height)
        cand = cand.at[i].set(False).at[cip].set(False)
        count = jnp.sum(cand)

        def regraft(j):
            jp = tree.parent[j]
            children = replace_child(tree.children, pip, ip, cip)
            children = replace_child(children, jp, j, ip)
            children = replace_child(children, ip, cip, j)
            parent = tree.parent.at[cip].set(pip).at[ip].set(jp).at[j].set(ip)
            return tree.replace(parent=parent, children=children)

        def score(j):
            return self._log_posterior(params, regraft(j))

        idx = jnp.arange(m, dtype=jnp.int32)
        # masked-out candidates still trace but are -inf weighted
        scores = jax.vmap(score)(idx)
        scores = jnp.where(cand, scores, NEG_INF)
        offset = jnp.max(scores)
        probs = jnp.exp(scores - offset)
        total = jnp.sum(probs)
        j = jax.random.categorical(k2, scores).astype(jnp.int32)
        forward = probs[j]
        back_ll = self._log_posterior(params, tree)
        back = jnp.exp(back_ll - offset)
        log_fwd_prob = jnp.log(forward) - jnp.log(total)
        log_back_prob = jnp.log(back) - jnp.log(total - forward + back)
        logq = jnp.where(count > 0, log_back_prob - log_fwd_prob, NEG_INF)
        return params, regraft(j), logq.astype(fdt)


@dataclasses.dataclass
class TipLeapOperator(Operator):
    """ref: TipLeapOperatorParser (tipLeap) -> SubtreeLeapOperator
    restricted to a set of TIP nodes: prune the tip's parent edge and
    regraft at patristic distance |N(0, size)|; Hastings = |D|/|D'|.
    tips: static tuple of eligible tip indices (all tips by default)."""

    size: float = 1.0
    tips: tuple = ()
    n_tips: int = 0
    adaptable: bool = True
    target_acceptance: float = 0.225

    modifies_params = ()

    def initial_adapt(self) -> float:
        return float(np.log(self.size))

    def tuning(self, adapt_value):
        return jnp.exp(adapt_value)

    def propose(self, params, tree, key, tuning):
        fdt = tree.heights.dtype
        k1, k2, k3 = jax.random.split(key, 3)
        delta = jnp.abs(jax.random.normal(k1, dtype=fdt)) * tuning
        pool = jnp.asarray(self.tips if self.tips
                           else tuple(range(self.n_tips)))
        node = pool[jax.random.randint(k2, (), 0, pool.shape[0])]

        parent, children, heights, root = (
            tree.parent, tree.children, tree.heights, tree.root)
        par = parent[node]
        sib = other_child(children, par, node)
        gp = parent[par]
        dmask, dheights = _get_destinations(
            parent, children, heights, node, par, sib, delta
        )
        # a tip's parent must stay above the tip
        dmask = dmask & (dheights > heights[node])
        j, count = sample_masked(k3, dmask)
        new_h = dheights[j]
        jp = parent[j]
        no_topo = (j == par) | (jp == par)

        def keep(_):
            return parent, children, root

        def move(_):
            was_root = gp < 0
            ch = replace_child(children, jnp.maximum(gp, 0), par, sib)
            ch = jnp.where(was_root, children, ch)
            par_arr = parent.at[sib].set(gp)
            j_is_root = jp < 0
            ch = replace_child(ch, par, sib, j)
            ch_attach = replace_child(ch, jnp.maximum(jp, 0), j, par)
            ch = jnp.where(j_is_root, ch, ch_attach)
            par_arr = par_arr.at[j].set(par).at[par].set(jp)
            rt = jnp.where(was_root, sib, root)
            rt = jnp.where(j_is_root, par, rt).astype(root.dtype)
            return par_arr, ch, rt

        par_arr, ch, rt = jax.lax.cond(no_topo, keep, move, None)
        h = heights.at[par].set(jnp.maximum(new_h, heights[node]))
        new_tree = tree.replace(parent=par_arr, children=ch, heights=h,
                                root=rt)
        sib_new = other_child(ch, par, node)
        rmask, rh = _get_destinations(par_arr, ch, h, node, par, sib_new,
                                      delta)
        rmask = rmask & (rh > h[node])
        rcount = jnp.sum(rmask)
        logq = jnp.log(count.astype(fdt)) - jnp.log(rcount.astype(fdt))
        logq = jnp.where((count > 0) & (new_h > heights[node]), logq,
                         NEG_INF)
        return params, new_tree, logq


@dataclasses.dataclass
class GibbsSubtreeSwapOperator(Operator):
    """Likelihood-informed wide subtree swap (ref:
    src/dr/evomodel/operators/GibbsSubtreeSwap.java:96-160 `wide`):
    pick node i; enumerate every eligible swap partner j (distinct
    parents, mutual height compatibility); score each SWAPPED tree by
    the posterior; draw j ~ softmax; Hastings is the forward/backward
    Gibbs-weight ratio, with the backward normalizer computed by
    enumerating partners in the swapped tree. The reference evaluates
    candidates serially through BEAGLE; here both enumerations are
    vmapped batched posterior evaluations."""

    modifies_params = ()
    _log_posterior = None

    def bind_log_posterior(self, log_posterior):
        self._log_posterior = log_posterior

    def propose(self, params, tree, key, tuning):
        assert self._log_posterior is not None, (
            "GibbsSubtreeSwapOperator requires make_mcmc_step binding")
        m = tree.parent.shape[0]
        fdt = tree.heights.dtype
        root = tree.root
        h = tree.heights
        k1, k2 = jax.random.split(key)
        i = sample_excluding(k1, m, root[None])
        ip = tree.parent[i]

        def swapped(t, a, b):
            ap = t.parent[a]
            bp = t.parent[b]
            parent = t.parent.at[a].set(bp).at[b].set(ap)
            ch = replace_child(t.children, ap, a, b)
            ch = replace_child(ch, bp, b, a)
            return t.replace(parent=parent, children=ch)

        def partner_mask(t, a):
            apar = t.parent[a]
            jp = t.parent
            ok = (
                (jnp.arange(m) != a)
                & (jnp.arange(m) != root)
                & (jp != apar) & (jnp.arange(m) != apar) & (jp != a)
                & (t.heights < t.heights[apar])
                & (t.heights[a] < t.heights[jp])
            )
            return ok

        cand = partner_mask(tree, i)

        def score(j):
            return self._log_posterior(params, swapped(tree, i, j))

        idx = jnp.arange(m, dtype=jnp.int32)
        scores = jnp.where(cand, jax.vmap(score)(idx), NEG_INF)
        count = jnp.sum(cand)
        j = jax.random.categorical(k2, scores).astype(jnp.int32)
        offset = jnp.max(scores)
        probs = jnp.exp(scores - offset)
        fwd_total = jnp.sum(probs)
        fwd = probs[j]

        new_tree = swapped(tree, i, j)
        # backward: partners of i in the NEW tree, scored by swapping back
        cand_b = partner_mask(new_tree, i)

        def score_b(k):
            return self._log_posterior(params, swapped(new_tree, i, k))

        scores_b = jnp.where(cand_b, jax.vmap(score_b)(idx), NEG_INF)
        probs_b = jnp.exp(scores_b - offset)
        back_total = jnp.sum(probs_b)
        back = probs_b[j]  # swapping back with the same partner j
        logq = (jnp.log(back) - jnp.log(back_total)
                - (jnp.log(fwd) - jnp.log(fwd_total)))
        logq = jnp.where(count > 0, logq, NEG_INF)
        return params, new_tree, logq
