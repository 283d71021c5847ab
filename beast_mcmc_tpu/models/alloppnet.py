"""AlloppNet: allopolyploid species-network inference.

Role of the reference's alloppnet package (ref: src/dr/evomodel/alloppnet/
speciation/AlloppSpeciesNetworkModel.java, AlloppMulLabTree.java,
AlloppDiploidHistory.java; Jones, Sagitov & Oxelman 2013): a tetraploid
clade arises by hybridization of two diploid lineages ("legs") at a
hybridization time; gene trees for each sub-genome are modelled by the
multispecies coalescent on the induced MUL-tree (multiply-labelled
species tree) in which the tetraploid subtree appears twice, each copy
spliced into one parent leg.

TPU-native design: the network state is a small pytree (diploid species
tree arrays + one tetraploid subtree + two leg edge indices + the
hybridization height). The MUL-tree is DERIVED inside jit by static-shape
array surgery (two splice nodes, fixed index layout), and the likelihood
is exactly models/msc.multispecies_coalescent_loglik on that MUL-tree —
no new coalescent code. Gene-tree tips carry a sub-genome assignment
(which of the two tetraploid copies each sequence belongs to), sampled by
a flip operator, as in the reference's AlloppSequenceAssignment.

Scope: one tetraploid subtree with two distinct legs (the reference's
2-diploid-parent "type b" networks; same-branch legs are proposed
invalid). Index layout of the MUL-tree with d diploid tips and k
tetraploid tips:
  tips:      [0..d)       diploid tips (same order as the diploid tree)
             [d..d+k)     tetraploid copy A tips
             [d+k..d+2k)  tetraploid copy B tips
  internals: diploid internals, copy-A internals, copy-B internals,
             splice A, splice B  (n-1 of them, n = d+2k)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.models.msc import multispecies_coalescent_loglik


class AlloppNetwork(NamedTuple):
    dip_parent: jnp.ndarray    # int32 [2d-1]
    dip_children: jnp.ndarray  # int32 [2d-1, 2]
    dip_heights: jnp.ndarray   # [2d-1]
    dip_root: jnp.ndarray      # int32
    tet_parent: jnp.ndarray    # int32 [2k-1]
    tet_children: jnp.ndarray  # int32 [2k-1, 2]
    tet_heights: jnp.ndarray   # [2k-1]
    tet_root: jnp.ndarray      # int32
    leg_a: jnp.ndarray         # int32 diploid node whose parent edge hosts copy A
    leg_b: jnp.ndarray         # int32 likewise for copy B
    hyb_height: jnp.ndarray    # [] hybridization time


def mul_tree(net: AlloppNetwork):
    """(parent, children, heights, root, valid) of the MUL-tree.

    valid is False when a leg edge does not span the hybridization height,
    the legs coincide, or the tetraploid root is older than the
    hybridization (the -inf states the reference's operators avoid by
    construction; here they reject via the likelihood)."""
    d = (net.dip_parent.shape[0] + 1) // 2
    k = (net.tet_parent.shape[0] + 1) // 2
    n = d + 2 * k
    m = 2 * n - 1
    it = jnp.int32
    dt = net.dip_heights.dtype

    # index maps -------------------------------------------------------
    def dip_map(i):
        return jnp.where(i < d, i, i + 2 * k).astype(it)

    def tet_map(i, copy):  # copy 0 -> A, 1 -> B
        tip = d + copy * k + i
        internal = (2 * d - 1 + 2 * k) + copy * (k - 1) + (i - k)
        return jnp.where(i < k, tip, internal).astype(it)

    splice_a = jnp.asarray(m - 2, it)
    splice_b = jnp.asarray(m - 1, it)

    parent = jnp.full((m,), -1, it)
    children = jnp.full((m, 2), -1, it)
    heights = jnp.zeros((m,), dt)

    # diploid block ----------------------------------------------------
    dip_idx = jnp.arange(net.dip_parent.shape[0])
    dmapped = dip_map(dip_idx)
    dpar = jnp.where(net.dip_parent >= 0,
                     dip_map(jnp.maximum(net.dip_parent, 0)), -1)
    parent = parent.at[dmapped].set(dpar.astype(it))
    dch = jnp.where(net.dip_children >= 0,
                    dip_map(jnp.maximum(net.dip_children, 0)), -1)
    children = children.at[dmapped].set(dch.astype(it))
    heights = heights.at[dmapped].set(net.dip_heights)

    # tetraploid copies ------------------------------------------------
    tet_idx = jnp.arange(net.tet_parent.shape[0])
    for copy, splice in ((0, splice_a), (1, splice_b)):
        tmapped = tet_map(tet_idx, copy)
        tpar = jnp.where(net.tet_parent >= 0,
                         tet_map(jnp.maximum(net.tet_parent, 0), copy),
                         splice)
        parent = parent.at[tmapped].set(tpar.astype(it))
        tch = jnp.where(net.tet_children >= 0,
                        tet_map(jnp.maximum(net.tet_children, 0), copy), -1)
        children = children.at[tmapped].set(tch.astype(it))
        heights = heights.at[tmapped].set(net.tet_heights)

    # splice the attachment nodes into the two leg edges ----------------
    la = dip_map(net.leg_a)
    lb = dip_map(net.leg_b)
    pa = parent[la]
    pb = parent[lb]
    troot_a = tet_map(net.tet_root, 0)
    troot_b = tet_map(net.tet_root, 1)

    def splice_in(parent, children, leg, old_par, node, troot):
        children = children.at[node, 0].set(leg)
        children = children.at[node, 1].set(troot)
        # replace `leg` by `node` among old_par's children (no-op if root)
        safe = jnp.maximum(old_par, 0)
        ch = children[safe]
        ch = jnp.where(ch == leg, node, ch)
        children = children.at[safe].set(
            jnp.where(old_par >= 0, ch, children[safe]))
        parent = parent.at[node].set(old_par)
        parent = parent.at[leg].set(node)
        parent = parent.at[troot].set(node)
        return parent, children

    parent, children = splice_in(parent, children, la, pa, splice_a, troot_a)
    parent, children = splice_in(parent, children, lb, pb, splice_b, troot_b)
    heights = heights.at[splice_a].set(net.hyb_height)
    heights = heights.at[splice_b].set(net.hyb_height)

    root = jnp.where(net.dip_root == net.leg_a, splice_a,
                     jnp.where(net.dip_root == net.leg_b, splice_b,
                               dip_map(net.dip_root))).astype(it)

    h = net.hyb_height
    def spans(leg):
        above = jnp.where(net.dip_parent[leg] >= 0,
                          net.dip_heights[jnp.maximum(net.dip_parent[leg], 0)],
                          jnp.inf)
        return (net.dip_heights[leg] < h) & (h < above)

    valid = (
        spans(net.leg_a)
        & spans(net.leg_b)
        & (net.leg_a != net.leg_b)
        & (net.tet_heights[net.tet_root] < h)
    )
    return parent, children, heights, root, valid


def alloppnet_gene_tree_loglik(
    gene_parent, gene_children, gene_heights,
    tip_species: jnp.ndarray,   # int32 [n_gene_tips] MUL-TREE tip index
    net: AlloppNetwork,
    pop_sizes: jnp.ndarray,     # [2(d+2k)-1] per MUL-branch pop sizes
) -> jnp.ndarray:
    """MSC log-density of one gene tree embedded in the network's
    MUL-tree. Sequences of a tetraploid individual carry a sub-genome
    assignment by pointing tip_species at copy-A or copy-B tips."""
    parent, children, heights, root, valid = mul_tree(net)
    ll = multispecies_coalescent_loglik(
        gene_parent, gene_children, gene_heights, tip_species,
        parent, heights, pop_sizes)
    neg = jnp.asarray(-jnp.inf, gene_heights.dtype)
    return jnp.where(valid, ll, neg)


def flip_assignment(tip_species: jnp.ndarray, seq_idx, pair_idx,
                    d: int, k: int) -> jnp.ndarray:
    """Swap one sequence pair between sub-genome copies A and B (ref:
    alloppnet operators AlloppSequenceReassignment): a tetraploid
    individual's two sequences sit at MUL tips (d+i, d+k+i); flipping
    exchanges their assignments."""
    a = tip_species[seq_idx]
    b = tip_species[pair_idx]
    return tip_species.at[seq_idx].set(b).at[pair_idx].set(a)
