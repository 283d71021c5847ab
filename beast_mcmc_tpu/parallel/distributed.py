"""Multi-host runtime: jax.distributed over DCN + mesh-over-hosts.

The reference's only multi-process story is vestigial MPI scaffolding
(ref: src/dr/app/beast/BeastMPI.java:50-70 Init/Finalize/Rank;
src/dr/inference/parallel/MPIServices.java:37-110 send/receive of
primitives). The TPU-native equivalent (SURVEY.md §5.8): every host
calls `initialize()` with a coordinator address; a global Mesh spans all
hosts' devices with axes (chains, patterns); site patterns shard over
the fast axis (ICI within a slice), chains across hosts; per-pattern
logL reduces with `psum`, MC3 swap decisions are tiny cross-host
collectives instead of MPI send/recv.

On CPU (tests / CI) the cross-process collectives run over gloo — the
"fake backend" role, so the multi-host code path is exercised without
TPU pods (the reference has NO multi-node test at all, SURVEY.md §4.7).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_count: Optional[int] = None,
) -> None:
    """Join the multi-host runtime (ref role: BeastMPI.Init,
    BeastMPI.java:50-70). On TPU pods the arguments come from the
    environment and may all be None; on CPU pass them explicitly and a
    virtual local device count for testing."""
    # NOTE: must not touch the backend (jax.devices()/default_backend())
    # before jax.distributed.initialize — inspect config/env only
    platform = (jax.config.jax_platforms or "").split(",")[0] or None
    import os as _os

    platform = platform or _os.environ.get("JAX_PLATFORMS", "").split(",")[0]
    if local_device_count and platform == "cpu":
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address, num_processes=num_processes,
        process_id=process_id,
    )


def shutdown() -> None:
    """ref role: BeastMPI.Finalize."""
    jax.distributed.shutdown()


def process_index() -> int:
    """ref role: BeastMPI.COMM_WORLD.Rank (BeastMPI.java:64-66)."""
    return jax.process_index()


def global_mesh(n_chains: int = 1, axis_names=("chains", "patterns")) -> Mesh:
    """Mesh over ALL hosts' devices: `chains` is the slow (DCN-friendly)
    axis, `patterns` the fast one. n_chains must divide the global device
    count."""
    devs = np.array(jax.devices())
    if devs.size % n_chains:
        raise ValueError(
            f"{n_chains} chains do not divide {devs.size} devices"
        )
    return Mesh(devs.reshape(n_chains, -1), axis_names)


def sharded_pattern_loglik(mesh: Mesh, site_logl_fn):
    """Wrap a per-pattern site-logL function into a pattern-sharded total
    over the full mesh: every device computes its pattern shard, the
    weighted sum reduces with one psum (the TPU analog of
    pattern-splitting across BEAGLE instances,
    TreeDataLikelihoodParser.java:61-67)."""
    from jax.experimental.shard_map import shard_map

    axes = mesh.axis_names

    def total(tips, weights, *args):
        def local(tp, w):
            sl = site_logl_fn(tp, *args)
            return jax.lax.psum(jnp.dot(w, sl), axes)

        f = shard_map(
            local, mesh=mesh,
            in_specs=(P(None, None, axes), P(axes)),
            out_specs=P(),
            check_rep=False,  # scan carries inside the peel are unvarying
        )
        return f(tips, weights)

    return total


def mc3_swap_across_hosts(key, energies: jnp.ndarray,
                          temperatures: jnp.ndarray):
    """One parallel-tempering swap decision over chain energies gathered
    across hosts (ref: MCMCMC.swapChainTemperatures, MCMCMC.java:249-282
    — logRatio = (E_j - E_i)(T_i - T_j); here the energies arrive via an
    all_gather-style collective and every host computes the SAME swap
    deterministically from the shared key). Returns the permutation of
    temperature slots."""
    n = energies.shape[0]
    k1, k2 = jax.random.split(key)
    i = jax.random.randint(k1, (), 0, n)
    j_raw = jax.random.randint(k2, (), 0, n - 1)
    j = jnp.where(j_raw >= i, j_raw + 1, j_raw)
    logr = (energies[j] - energies[i]) * (temperatures[i] - temperatures[j])
    accept = jnp.log(jax.random.uniform(jax.random.fold_in(key, 7))) < logr
    perm = jnp.arange(n)
    perm = jnp.where(
        accept, perm.at[i].set(j).at[j].set(i), perm
    )
    return perm
