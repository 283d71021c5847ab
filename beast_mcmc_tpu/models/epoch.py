"""Epoch branch model: time-sliced substitution models convolved on
branches.

Role of the reference's EpochBranchModel + the buffer-convolution
machinery in SubstitutionModelDelegate (ref:
src/dr/evomodel/branchmodel/EpochBranchModel.java:47;
SubstitutionModelDelegate.java:303+ updateTransitionMatrices with
beagle.convolveTransitionMatrices): a branch spanning epoch boundaries
gets P = P_oldest(l_E) @ ... @ P_youngest(l_0), where l_e is the branch's
overlap with epoch e.

TPU-native: overlaps are a clip() tensor op over [M, E]; the convolution
is a static python loop over epochs of batched [M,C,S,S] matmuls (MXU).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp

from beast_mcmc_tpu.ops.eigen import EigenSystem, transition_probs
from beast_mcmc_tpu.ops.expm import transition_probs_expm


def epoch_overlaps(
    parent: jnp.ndarray, heights: jnp.ndarray, boundaries: jnp.ndarray
) -> jnp.ndarray:
    """[M, E] time-overlap of each node's parent branch with each epoch.
    Epoch e spans [b_{e-1}, b_e), b_{-1} = 0, b_{E-1} = inf; boundaries
    are the E-1 interior transition times (ascending, ref:
    EpochBranchModel transitionTimes)."""
    dt = heights.dtype
    pidx = jnp.maximum(parent, 0)
    h0 = heights
    h1 = jnp.where(parent >= 0, heights[pidx], heights)
    lo = jnp.concatenate([jnp.zeros((1,), dt), boundaries])
    hi = jnp.concatenate([boundaries, jnp.full((1,), jnp.inf, dt)])
    return jnp.clip(
        jnp.minimum(h1[:, None], hi[None, :]) - jnp.maximum(h0[:, None], lo[None, :]),
        0.0,
    )


def epoch_branch_matrices(
    models: Sequence[Union[EigenSystem, jnp.ndarray]],
    boundaries: jnp.ndarray,  # [E-1]
    parent: jnp.ndarray,
    heights: jnp.ndarray,
    branch_rates,  # [M] or scalar
    category_rates: jnp.ndarray,  # [C]
) -> jnp.ndarray:
    """[M, C, S, S] per-branch matrices: the convolution (oldest-first
    product) of each epoch model's transition matrix over the branch's
    overlap with that epoch. models[e] is an EigenSystem (reversible) or a
    raw generator Q [S,S] (expm path)."""
    dt = heights.dtype
    overlaps = epoch_overlaps(parent, heights, boundaries)  # [M, E]
    m = parent.shape[0]
    c = category_rates.shape[0]
    rates = jnp.broadcast_to(jnp.asarray(branch_rates, dt), (m,))

    acc = None
    for e, model in enumerate(models):
        t = overlaps[:, e] * rates  # [M]
        t_mc = t[:, None] * category_rates[None, :]  # [M, C]
        if isinstance(model, EigenSystem):
            p_e = transition_probs(model, t_mc)
        else:
            p_e = transition_probs_expm(model, t_mc)
        # convolution: P_total = P_old @ ... @ P_young; epoch e is older
        # than e-1, so left-multiply
        acc = p_e if acc is None else jnp.einsum(
            "mcij,mcjk->mcik", p_e, acc, preferred_element_type=dt
        )
    return acc


def ancestor_closure(parent: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """[M, M] reachability S[v, u] = 1 iff u is an ancestor-or-self of v,
    computed by parent-pointer doubling (log2(M) batched matmuls — jit-
    traceable over a dynamic topology, unlike a host-side tree walk)."""
    import numpy as np

    m = int(parent.shape[0])
    dt = dtype or jnp.float32
    import jax

    is_root = parent < 0
    p_mat = jnp.where(
        is_root[:, None], 0.0,
        jax.nn.one_hot(jnp.maximum(parent, 0), m, dtype=dt))
    s_mat = jnp.eye(m, dtype=dt) + p_mat
    for _ in range(int(np.ceil(np.log2(max(m, 2))))):
        s_mat = jnp.minimum(s_mat @ s_mat, 1.0)
    return s_mat


def clade_branch_matrices(
    base_model,
    clade_specs,  # [(tip_mask [N] bool, model, stem_weight [scalar])]
    parent: jnp.ndarray,
    heights: jnp.ndarray,
    root,
    branch_rates,
    category_rates: jnp.ndarray,
) -> jnp.ndarray:
    """[M, C, S, S] per-branch matrices for clade-specific substitution
    models (ref: BranchSpecificBranchModel.setupNodeMaps:240-366): each
    clade's MRCA subtree takes the clade model; the stem branch is the
    oldest-first convolution P_base((1-w)L) @ P_clade(wL) (the
    reference's mapping order[0] is the OLDEST segment,
    setConvolvedNodeMap:353-365). Models are EigenSystem or generator Q.
    """
    dt = heights.dtype
    m = parent.shape[0]
    rates = jnp.broadcast_to(jnp.asarray(branch_rates, dt), (m,))
    pidx = jnp.maximum(parent, 0)
    blen = jnp.where(parent >= 0, heights[pidx] - heights, 0.0) * rates

    s_mat = ancestor_closure(parent, dt)
    fracs = []
    for tip_mask, _model, w in clade_specs:
        tip_v = jnp.asarray(tip_mask, dt)
        n = tip_v.shape[0]
        cnt = tip_v @ s_mat[:n]  # [M] clade tips below each node
        cand = cnt >= jnp.sum(tip_v)
        mrca = jnp.argmin(jnp.where(cand, heights, jnp.inf))
        below = s_mat[:, mrca] > 0  # mrca is an ancestor-or-self
        wv = jnp.asarray(w, dt)
        fracs.append(jnp.where(jnp.arange(m) == mrca, wv,
                               jnp.where(below, 1.0, 0.0)).astype(dt))
    frac_base = 1.0
    for f in fracs:
        frac_base = frac_base - f

    acc = None
    for model, frac in zip(
            [base_model] + [c[1] for c in clade_specs],
            [frac_base] + fracs):
        t_mc = (blen * frac)[:, None] * category_rates[None, :]
        if isinstance(model, EigenSystem):
            p_e = transition_probs(model, t_mc)
        else:
            p_e = transition_probs_expm(model, t_mc)
        # base first = oldest segment leftmost; clade portions are the
        # younger (child-side) end of the stem branch
        acc = p_e if acc is None else jnp.einsum(
            "mcij,mcjk->mcik", acc, p_e, preferred_element_type=dt)
    return acc
