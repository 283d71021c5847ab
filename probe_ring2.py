import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.models.treelikelihood import branch_transition_matrices
from beast_mcmc_tpu.models.substitution import gtr_eigen
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
from beast_mcmc_tpu.ops.peeling import peel_order_from_heights
from beast_mcmc_tpu.ops.pallas_stream2 import postorder_internal

log_post, ops, params0, tree0, aux = build_analysis(1610, 2048, "gtr_gamma", dtype=jnp.float32)
tips, weights, freqs = aux["tips"], aux["weights"], aux["freqs"]
eig = gtr_eigen(params0["gtr.rates"], freqs)
rates, cw = discrete_gamma_rates(params0["alpha"], 4, dtype=jnp.float32)
pm = branch_transition_matrices(eig, tree0.parent, tree0.heights, params0["clock.rate"], rates)

def sched():
    porder, pos_of = postorder_internal(tree0.children, None, 1610)
    lr_ids = tree0.children[porder].astype(jnp.int32)
    lr_pos = pos_of[lr_ids]
    pm_ordered = pm[lr_ids]
    return lr_ids.sum() + lr_pos.sum() + pm_ordered.sum()

def timeit(name, f, n=200):
    g = jax.jit(f)
    v = g(); jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v = g()
    jax.block_until_ready(v)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e6:.1f} us", flush=True)

timeit("schedule+pm-gather", sched)
timeit("postorder only", lambda: postorder_internal(tree0.children, None, 1610)[0].sum())
