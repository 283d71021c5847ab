"""Checkpoint / resume.

Role of dr.app.checkpoint.BeastCheckpointer (ref: BeastCheckpointer.java:
55,270-470): the reference serializes RNG state, state number, lnL, every
parameter, every operator's accept/reject/tuning stats, and the tree. Here
the MCMCState pytree IS all of that, so a checkpoint is one orbax/numpy
save of the pytree. On load, the log-posterior is recomputed and compared
(the reference's checkLoadState, MCMC.java:169-171).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.state import MCMCState
from beast_mcmc_tpu.tree.topology import TreeState

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: MCMCState) -> None:
    """Write the full chain state as an .npz + manifest."""
    flat, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    target = path if path.endswith(".npz") else path + ".npz"
    tmp = target + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, target)
    manifest = {
        "version": FORMAT_VERSION,
        "n_leaves": len(flat),
        "step": int(state.step),
        "log_posterior": float(state.log_posterior),
        "param_names": sorted(state.params.keys()),
    }
    with open(path + ".manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)


def load_checkpoint(
    path: str,
    template: MCMCState,
    log_posterior: Optional[Callable] = None,
    tolerance: float = 0.1,
) -> MCMCState:
    """Restore a chain state saved by save_checkpoint.

    template: a state with the same structure (from init_mcmc_state) used
    to rebuild the pytree. If log_posterior is given, the restored state's
    posterior is recomputed and compared within `tolerance` log units (the
    reference's own self-check threshold, MarkovChain.java:55).
    """
    npz_path = path if os.path.exists(path) else path + ".npz"
    data = np.load(npz_path)
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    if len(flat_t) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has {len(flat_t)}"
        )
    flat = [
        jnp.asarray(data[f"leaf_{i}"], flat_t[i].dtype)
        for i in range(len(flat_t))
    ]
    state = jax.tree_util.tree_unflatten(treedef, flat)
    if log_posterior is not None:
        lp = float(log_posterior(state.params, state.tree))
        saved = float(state.log_posterior)
        if abs(lp - saved) > tolerance:
            raise ValueError(
                f"checkpoint log-posterior mismatch: recomputed {lp:.6f} "
                f"vs saved {saved:.6f} (tolerance {tolerance})"
            )
    return state
