"""Device meshes and sharding layouts.

The TPU-native replacement for every parallelism strategy in the reference
(SURVEY.md §2.5): a 2-D logical mesh

    ("chains", "patterns")

  - "patterns": site patterns are the data-parallel axis (the role of
    BEAGLE pattern-splitting across instances / -beagle_instances, ref:
    TreeDataLikelihoodParser.java:61-67, and of BEAGLE's internal
    OpenMP/GPU site parallelism). Tip partials and pattern weights are
    sharded on their pattern dimension; the per-pattern site logL is
    computed locally and the weighted total reduces over ICI (XLA inserts
    the psum from the sharded dot).
  - "chains": independent or coupled (MC3) chains, vmapped and sharded
    (the role of MCMCMC's one-thread-per-chain, MCMCMC.java:227-247).

No NCCL/MPI translation: collectives are whatever XLA SPMD inserts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAINS_AXIS = "chains"
PATTERNS_AXIS = "patterns"


def make_mesh(
    n_chain_shards: Optional[int] = None,
    n_pattern_shards: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_chain_shards is None and n_pattern_shards is None:
        n_chain_shards = 1
        n_pattern_shards = n
    elif n_chain_shards is None:
        n_chain_shards = n // n_pattern_shards
    elif n_pattern_shards is None:
        n_pattern_shards = n // n_chain_shards
    if n_chain_shards * n_pattern_shards != n:
        raise ValueError(
            f"mesh {n_chain_shards}x{n_pattern_shards} != {n} devices"
        )
    dev = np.asarray(devices).reshape(n_chain_shards, n_pattern_shards)
    return Mesh(dev, (CHAINS_AXIS, PATTERNS_AXIS))


def pattern_sharding(mesh: Mesh, pattern_axis: int) -> NamedSharding:
    """Shard an array's pattern dimension over the patterns mesh axis,
    replicated over chains."""
    spec = [None] * (pattern_axis + 1)
    spec[pattern_axis] = PATTERNS_AXIS
    return NamedSharding(mesh, P(*spec))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading chain-batch dimension over the chains mesh axis."""
    return NamedSharding(mesh, P(CHAINS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_patterns(mesh: Mesh, arr, pattern_axis: int):
    """device_put onto the pattern sharding (pads are the caller's job —
    pattern counts should be padded to a multiple of the shard count;
    ops.peeling.pad_patterns does both lane and shard padding)."""
    return jax.device_put(arr, pattern_sharding(mesh, pattern_axis))
