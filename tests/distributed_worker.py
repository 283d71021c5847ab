"""Worker for the 2-process jax.distributed test (spawned by
test_distributed.py). Args: <process_id> <num_processes> <port>."""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beast_mcmc_tpu.parallel import distributed as D

D.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid,
             local_device_count=2)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.device_count() == 2 * nproc, jax.device_count()
assert D.process_index() == pid

from beast_mcmc_tpu.ops.peeling import peel_order_from_heights, peel_site_loglik
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree

rng = np.random.default_rng(0)
n_taxa, s, c, p = 8, 4, 2, 64
parent, children, heights, root = simulate_coalescent_tree(
    rng, np.zeros(n_taxa), 1.0
)
children = jnp.asarray(children)
heights = jnp.asarray(heights)
tips = jnp.asarray(rng.random((n_taxa, s, p)) * 0.9 + 0.1)
pm = rng.random((2 * n_taxa - 1, c, s, s)) * 0.2 + 0.01
pm = jnp.asarray(pm / pm.sum(-1, keepdims=True))
freqs = jnp.full((s,), 0.25)
cw = jnp.full((c,), 0.5)
w = jnp.asarray(rng.integers(1, 4, p), jnp.float64)
order = peel_order_from_heights(heights, n_taxa)

# local (unsharded) reference value
ref = float(jnp.dot(w, peel_site_loglik(
    tips, children, order, root, pm, freqs, cw)))

# pattern-sharded global value: patterns split over all 4 devices of the
# 2-host mesh, psum over both axes
mesh = D.global_mesh(n_chains=2)
axes = mesh.axis_names
total_fn = D.sharded_pattern_loglik(
    mesh,
    lambda tp: peel_site_loglik(tp, children, order, root, pm, freqs, cw),
)
tips_sh = jax.device_put(tips, NamedSharding(mesh, P(None, None, axes)))
w_sh = jax.device_put(w, NamedSharding(mesh, P(axes)))
got = float(jax.jit(total_fn)(tips_sh, w_sh))
assert abs(got - ref) < 1e-8 * abs(ref), (got, ref)

# cross-host MC3 swap: every process computes the SAME permutation
key = jax.random.PRNGKey(42)
energies = jnp.asarray([-10.0, -12.0, -9.0, -20.0])
temps = jnp.asarray([1.0, 0.8, 0.6, 0.4])
perm = np.asarray(D.mc3_swap_across_hosts(key, energies, temps))
print(f"RESULT {pid} {got:.10f} {ref:.10f} {' '.join(map(str, perm))}",
      flush=True)
D.shutdown()
