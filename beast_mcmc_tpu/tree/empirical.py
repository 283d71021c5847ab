"""Empirical tree distribution: MCMC over a fixed posterior tree sample.

Role of the reference's EmpiricalTreeDistributionModel +
EmpiricalTreeDistributionOperator (ref: src/dr/evomodel/tree/
EmpiricalTreeDistributionModel.java:46, operators/
EmpiricalTreeDistributionOperator.java:44): the tree is constrained to a
finite set read from a previous run's tree log; proposals draw a new
member uniformly. Used to condition phylogeography / trait analyses on a
fixed posterior sample of phylogenies.

TPU-native design: the whole sample is one stacked device tensor
([T, M] parents, [T, M, 2] children, ...); "switch tree" is a gather by
index, so the proposal stays inside jit with static shapes — no host
round-trip per move.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.operators import Operator
from beast_mcmc_tpu.tree.topology import TreeState, make_tree_state


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmpiricalTreeSet:
    parents: jnp.ndarray   # int32 [T, M]
    children: jnp.ndarray  # int32 [T, M, 2]
    heights: jnp.ndarray   # float [T, M]
    roots: jnp.ndarray     # int32 [T]

    @property
    def n_trees(self) -> int:
        return self.parents.shape[0]


def stack_trees(trees: Sequence, dtype=None) -> EmpiricalTreeSet:
    """Stack (parent, children, heights, root) tuples (or TreeSamples)
    over a common taxon set into one device-resident tensor set."""
    ps, cs, hs, rs = [], [], [], []
    for t in trees:
        if hasattr(t, "parent"):
            p, c, h, r = t.parent, t.children, t.heights, t.root
        else:
            p, c, h, r = t
        ps.append(np.asarray(p)); cs.append(np.asarray(c))
        hs.append(np.asarray(h)); rs.append(int(r))
    import beast_mcmc_tpu.utils.dtypes as dtypes
    dtype = dtype or dtypes.default_float()
    return EmpiricalTreeSet(
        parents=jnp.asarray(np.stack(ps), jnp.int32),
        children=jnp.asarray(np.stack(cs), jnp.int32),
        heights=jnp.asarray(np.stack(hs), dtype),
        roots=jnp.asarray(np.asarray(rs), jnp.int32),
    )


def tree_at(ts: EmpiricalTreeSet, idx) -> TreeState:
    return TreeState(
        parent=ts.parents[idx],
        children=ts.children[idx],
        heights=ts.heights[idx],
        root=ts.roots[idx],
    )


@dataclasses.dataclass
class EmpiricalTreeOperator(Operator):
    """Uniform redraw over the empirical set — symmetric, logq = 0
    (ref: EmpiricalTreeDistributionOperator.doOperation)."""

    trees: EmpiricalTreeSet = None

    def propose(self, params, tree, key, tuning):
        idx = jax.random.randint(key, (), 0, self.trees.n_trees)
        new_tree = tree_at(self.trees, idx)
        return params, new_tree, jnp.zeros((), tree.heights.dtype)
