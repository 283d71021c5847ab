import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.models.treelikelihood import branch_transition_matrices
from beast_mcmc_tpu.models.substitution import gtr_eigen
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
from beast_mcmc_tpu.ops.peeling import peel_order_from_heights
from beast_mcmc_tpu.ops.pallas_stream import peel_loglikelihood_stream
from beast_mcmc_tpu.ops.pallas_stream2 import peel_loglikelihood_ring

log_post, ops, params0, tree0, aux = build_analysis(1610, 2048, "gtr_gamma", dtype=jnp.float32)
tips, weights, freqs = aux["tips"], aux["weights"], aux["freqs"]
eig = gtr_eigen(params0["gtr.rates"], freqs)
rates, cw = discrete_gamma_rates(params0["alpha"], 4, dtype=jnp.float32)
pm = branch_transition_matrices(eig, tree0.parent, tree0.heights, params0["clock.rate"], rates)
order = peel_order_from_heights(tree0.heights, 1610)

def timeit(name, f, n=100):
    g = jax.jit(f)
    v = g(); jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v = g()
    jax.block_until_ready(v)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e6:.1f} us/eval  val={float(v):.3f}", flush=True)

timeit("v1 stream", lambda: peel_loglikelihood_stream(tips, tree0.children, order, tree0.root, pm, freqs, cw, weights))
timeit("v2 ring  ", lambda: peel_loglikelihood_ring(tips, tree0.children, order, tree0.root, pm, freqs, cw, weights))
