"""SMC particle restart + online taxon insertion.

Roles of the reference's SMC driver (ref: src/dr/inference/smc/SMC.java:61
— run short chains from a folder of particle start states in checkpoint
format; CLI -particles, BeastMain.java:434,527-532) and of online BEAST
(ref: src/dr/app/realtime/CheckPointUpdaterApp.java +
CheckPointTreeModifier.java — insert new taxa into a checkpointed
analysis by distance-based placement, then resume).

TPU-native redesign: particles are a BATCH — one vmapped chain step over
the stacked particle states (the reference loops particles on threads);
insertion surgery is a host-side flat-array rewire.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.checkpoint import load_checkpoint, save_checkpoint
from beast_mcmc_tpu.inference.mcmc import MCMCState, run_chain
from beast_mcmc_tpu.tree.topology import TreeState


def load_particles(folder: str, template: MCMCState) -> MCMCState:
    """Stack every checkpoint file in `folder` into a batched state
    (leading particle axis), the reference's -particles input."""
    files = sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if f.endswith(".npz")
    )
    if not files:
        raise ValueError(f"no particle checkpoints in {folder}")
    states = [load_checkpoint(f, template) for f in files]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def run_particles(
    step_fn,
    particles: MCMCState,
    n_steps: int,
    out_folder: Optional[str] = None,
) -> MCMCState:
    """Advance every particle n_steps with one vmapped jitted chain
    (replaces SMC.java's per-particle thread loop)."""
    def one(state):
        out, _ = run_chain(step_fn, state, n_steps)
        return out

    out = jax.jit(jax.vmap(one))(particles)
    if out_folder:
        os.makedirs(out_folder, exist_ok=True)
        n = int(jax.tree_util.tree_leaves(out)[0].shape[0])
        for i in range(n):
            part = jax.tree_util.tree_map(lambda x: x[i], out)
            save_checkpoint(os.path.join(out_folder, f"particle{i:04d}"), part)
    return out


# ---------------------------------------------------------------------------
# online taxon insertion (CheckPointTreeModifier role)
# ---------------------------------------------------------------------------


def insert_taxon(
    tree: TreeState,
    attach_node: int,
    new_tip_height: float,
    attach_height: float,
) -> TreeState:
    """Graft one new tip onto the branch above `attach_node`, creating a
    new internal node at `attach_height` (must lie inside that branch and
    above the new tip). Node numbering follows the framework convention:
    the new tip becomes index N (appended after the old tips), so all old
    tip indices are preserved and internal indices shift by +1.

    (ref: CheckPointTreeModifier.incorporateAdditionalTaxa — the
    distance-based placement chooses attach_node/heights; this performs
    the topology surgery.)
    """
    parent = np.asarray(tree.parent)
    children = np.asarray(tree.children)
    heights = np.asarray(tree.heights)
    m = parent.shape[0]
    n = (m + 1) // 2
    root = int(tree.root)

    def shift(i):
        if i < 0:
            return -1
        return i if i < n else i + 1

    m2 = m + 2
    new_tip = n
    new_internal = m + 1  # after shifting, internals occupy n+1..m2-1

    parent2 = np.full(m2, -1, np.int32)
    children2 = np.full((m2, 2), -1, np.int32)
    heights2 = np.zeros(m2, heights.dtype)
    for i in range(m):
        j = shift(i)
        parent2[j] = shift(parent[i])
        heights2[j] = heights[i]
        children2[j, 0] = shift(children[i, 0])
        children2[j, 1] = shift(children[i, 1])

    a = shift(int(attach_node))
    ap = parent2[a]
    heights2[new_tip] = new_tip_height
    heights2[new_internal] = attach_height
    if not (attach_height > max(new_tip_height, heights2[a])):
        raise ValueError("attach_height must exceed the tip and node")
    if ap >= 0 and not attach_height < heights2[ap]:
        raise ValueError("attach_height must be below the parent")
    # wire: new_internal takes a's place under ap
    parent2[new_internal] = ap
    children2[new_internal] = (a, new_tip)
    parent2[a] = new_internal
    parent2[new_tip] = new_internal
    new_root = shift(root)
    if ap >= 0:
        row = children2[ap]
        children2[ap] = np.where(row == a, new_internal, row)
    else:
        new_root = new_internal
    import beast_mcmc_tpu.tree.topology as topo

    return topo.make_tree_state(
        parent2, children2, heights2, new_root, heights.dtype
    )


def distance_based_attachment(
    tree: TreeState,
    tip_distances: np.ndarray,  # [N] genetic distance of the new taxon
    new_tip_height: float,
) -> tuple:
    """Pick the attachment branch like the reference's CheckPointUpdater:
    the closest existing tip (by provided distances), attaching halfway
    up its pendant branch (bounded to stay valid). Returns
    (attach_node, attach_height)."""
    parent = np.asarray(tree.parent)
    heights = np.asarray(tree.heights)
    best = int(np.argmin(tip_distances))
    lo = max(float(heights[best]), float(new_tip_height))
    hi = float(heights[parent[best]])
    if hi <= lo:
        # walk up until there is room
        node = best
        while hi <= lo and parent[node] >= 0:
            node = int(parent[node])
            if parent[node] < 0:
                break
            lo = max(float(heights[node]), float(new_tip_height))
            hi = float(heights[parent[node]])
        best = node
    attach = lo + 0.5 * (hi - lo)
    return best, float(attach)
