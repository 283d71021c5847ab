"""The MCMC state pytree.

Replaces the reference's mutable model graph + store/restore transactions
(ref: AbstractModel.java:252-326, Parameter.java:309-317, BufferIndexHelper
.java:39-116): state is ONE immutable pytree; a proposal builds a new
pytree; rejection keeps the old one. Operator statistics (accept/reject
counts, adaptable tuning values, ref: AbstractAdaptableOperator.java) live
in the state so the whole chain — including adaptation — runs inside jit.
"""

from __future__ import annotations

from typing import Any, Dict

import chex
import jax
import jax.numpy as jnp

from beast_mcmc_tpu.tree.topology import TreeState
from beast_mcmc_tpu.utils.accum import accum_dtype


@chex.dataclass(frozen=True)
class MCMCState:
    params: Dict[str, jnp.ndarray]
    tree: TreeState
    log_posterior: jnp.ndarray  # scalar
    key: jnp.ndarray  # PRNGKey
    step: jnp.ndarray  # int32
    # per-operator statistics, indexed by operator position in the schedule
    op_adapt: jnp.ndarray  # f[n_ops] transformed adaptable tuning values
    op_adapt_count: jnp.ndarray  # int32[n_ops]
    op_accept: jnp.ndarray  # int32[n_ops]
    op_reject: jnp.ndarray  # int32[n_ops]
    op_sum_accept: jnp.ndarray  # f[n_ops] sum of acceptance probabilities


def init_state(
    params: Dict[str, Any],
    tree: TreeState,
    key,
    n_ops: int,
    init_adapt: jnp.ndarray,
    dtype=jnp.float64,
) -> MCMCState:
    def cast_leaf(v):
        v = jnp.asarray(v)
        return v if jnp.issubdtype(v.dtype, jnp.integer) else v.astype(dtype)

    def cast(v):
        # params entries may be pytrees (derived caches like EigenSystem)
        return jax.tree_util.tree_map(cast_leaf, v)

    return MCMCState(
        params={k: cast(v) for k, v in params.items()},
        tree=tree,
        log_posterior=jnp.asarray(-jnp.inf, accum_dtype()),
        key=key,
        step=jnp.asarray(0, jnp.int32),
        op_adapt=jnp.asarray(init_adapt, dtype),
        op_adapt_count=jnp.zeros(n_ops, jnp.int32),
        op_accept=jnp.zeros(n_ops, jnp.int32),
        op_reject=jnp.zeros(n_ops, jnp.int32),
        op_sum_accept=jnp.zeros(n_ops, dtype),
    )
