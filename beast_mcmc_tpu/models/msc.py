"""Multispecies coalescent: gene trees embedded in a species tree.

Role of the reference's MultiSpeciesCoalescent (ref:
src/dr/evomodel/speciation/MultiSpeciesCoalescent.java — per-species-
branch coalescent density of the embedded gene lineages, Rannala & Yang
2003) and the *BEAST machinery around it (SpeciesBindings,
SpeciesTreeModel).

TPU-native: no per-branch lineage bookkeeping objects. Gene-lineage
occupancy of species branches is a masked tensor computation:
  - each gene node's "base" species = the species-tree MRCA of its
    descendant tips' species (pointer-doubling subtree masks);
  - a gene lineage occupies species branch B during
    overlap([h_g, h_parent(g)], [h_B, h_parent(B)]) iff B is an
    ancestor-or-self of the lineage's base species;
  - the density integrates C(k,2)/N_B over the global sorted grid of
    gene+species event times (lineage counts per (interval, branch) are
    mask sums), plus -log N_B at each coalescence.

Incompatible embeddings (a gene coalescence older than its species
branch allows... impossible by construction; but a gene coalescence
YOUNGER than the species divergence of its children's species) return
-inf, the reference's behavior for an inconsistent state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _ancestor_matrix(parent: jnp.ndarray) -> jnp.ndarray:
    """bool[M, M]: anc[a, d] True iff a is an ancestor-or-self of d.
    Pointer doubling, log2(M) unrolled steps."""
    m = parent.shape[0]
    idx = jnp.arange(m)
    q = jnp.where(parent < 0, idx, parent)
    anc = jnp.eye(m, dtype=bool)
    for _ in range(int(np.ceil(np.log2(max(m, 2)))) + 1):
        anc = anc | anc[:, q]  # anc[a, d] |= anc[a, q[d]]
        q = q[q]
    return anc


def multispecies_coalescent_loglik(
    gene_parent: jnp.ndarray,  # int32[G]
    gene_children: jnp.ndarray,  # int32[G, 2]
    gene_heights: jnp.ndarray,  # [G]
    tip_species: jnp.ndarray,  # int32[n_gene_tips] species-tip index
    sp_parent: jnp.ndarray,  # int32[S]
    sp_heights: jnp.ndarray,  # [S]
    pop_sizes: jnp.ndarray,  # [S] population size of each species branch
) -> jnp.ndarray:
    """Log-density of one gene tree given the species tree + pop sizes.
    Species branch s spans [sp_heights[s], sp_heights[parent(s)]) (the
    root branch extends to infinity)."""
    g = gene_parent.shape[0]
    n_tips = (g + 1) // 2
    s = sp_parent.shape[0]
    dt = gene_heights.dtype

    sp_anc = _ancestor_matrix(sp_parent)  # [S, S] anc-or-self

    # base species of each gene node: species MRCA of its descendant tips.
    # tip-incidence: gene_anc[v, tip] via ancestor matrix of the gene tree
    gene_anc = _ancestor_matrix(gene_parent)[:, :n_tips]  # [G, n_tips]
    # species under each gene node: union of tip species
    tip_onehot = jax.nn.one_hot(tip_species, s, dtype=dt)  # [n_tips, S]
    under = (gene_anc.astype(dt) @ tip_onehot) > 0  # [G, S] species present
    # base species = the lowest species node whose subtree covers `under`:
    # candidate a covers iff all present species-tips are descendants of a
    sp_tip_cover = sp_anc[:, :]  # anc-or-self over all species nodes
    # species tips are the first (s+1)//2 indices by the same convention
    n_sp_tips = (s + 1) // 2
    covers = ~jnp.any(
        under[:, None, :n_sp_tips] & ~sp_anc[None, :, :n_sp_tips], axis=-1
    )  # [G, S] species node a covers gene node v's species set
    # lowest cover = the cover with minimal height
    h_mask = jnp.where(covers, sp_heights[None, :], jnp.inf)
    base = jnp.argmin(h_mask, axis=1).astype(jnp.int32)  # [G]

    # compatibility: each gene node must be at or above its base species'
    # height (a coalescence cannot predate the species divergence)
    compatible = jnp.all(gene_heights >= sp_heights[base] - 1e-12)

    # lineage (edge above gene node v) occupies species branch B iff
    # B is ancestor-or-self of base[v]
    occ_sp = sp_anc[:, base].T  # [G, S] lineage v may occupy branch B

    sp_hi = jnp.where(
        sp_parent >= 0, sp_heights[jnp.maximum(sp_parent, 0)], jnp.inf
    )  # [S]
    g_par = jnp.maximum(gene_parent, 0)
    g_hi = jnp.where(gene_parent >= 0, gene_heights[g_par], jnp.inf)  # [G]

    # global time grid: all gene + species heights, sorted
    times = jnp.sort(jnp.concatenate([gene_heights, sp_heights]))
    t0 = times[:-1]  # [T]
    t1 = times[1:]
    dt_grid = t1 - t0

    # occupancy of (interval i, lineage v, branch B):
    # overlap of [h_v, g_hi_v], [sp_lo_B, sp_hi_B], [t0_i, t1_i] is full
    # interval (grid points include all endpoints)
    mid = 0.5 * (t0 + t1)  # [T]
    in_lineage = (mid[:, None] >= gene_heights[None, :]) & (
        mid[:, None] < g_hi[None, :]
    )  # [T, G]
    in_branch = (mid[:, None] >= sp_heights[None, :]) & (
        mid[:, None] < sp_hi[None, :]
    )  # [T, S]
    # k[T, S] = number of lineages in branch B during interval i
    k = jnp.einsum(
        "tg,gs,ts->ts",
        in_lineage.astype(dt), occ_sp.astype(dt), in_branch.astype(dt),
    )
    choose2 = k * (k - 1.0) / 2.0
    interval_term = -jnp.sum(
        choose2 * dt_grid[:, None] / pop_sizes[None, :]
    )

    # event terms: each gene coalescence (internal node) happens in the
    # species branch (ancestor chain of its base) containing its height
    internal = jnp.arange(g) >= n_tips
    in_b = (gene_heights[:, None] >= sp_heights[None, :]) & (
        gene_heights[:, None] < sp_hi[None, :]
    ) & occ_sp  # [G, S]
    event_n = jnp.einsum("gs,s->g", in_b.astype(dt), jnp.log(pop_sizes))
    event_term = -jnp.sum(jnp.where(internal, event_n, 0.0))

    logl = interval_term + event_term
    return jnp.where(compatible, logl, -jnp.inf)
