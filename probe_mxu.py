import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.models.treelikelihood import branch_transition_matrices
from beast_mcmc_tpu.models.substitution import gtr_eigen
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
from beast_mcmc_tpu.ops.peeling import peel_order_from_heights, peel_loglikelihood
from beast_mcmc_tpu.ops.pallas_peeling import peel_loglikelihood_pallas
from beast_mcmc_tpu.ops.pallas_mxu import peel_loglikelihood_mxu

log_post, ops, params0, tree0, aux = build_analysis(62, 5565, "gtr_gamma", dtype=jnp.float32)
tips, weights, freqs = aux["tips"], aux["weights"], aux["freqs"]
eig = gtr_eigen(params0["gtr.rates"], freqs)
rates, cw = discrete_gamma_rates(params0["alpha"], 4, dtype=jnp.float32)
order = peel_order_from_heights(tree0.heights, 62)

def timeit(name, f, *args, n=200):
    g = jax.jit(f)
    v = g(*args); jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v = g(*args)
    jax.block_until_ready(v)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e6:.1f} us/eval  val={float(jnp.sum(v)):.2f}", flush=True)

pm = branch_transition_matrices(eig, tree0.parent, tree0.heights, params0["clock.rate"], rates)
timeit("v1 pallas", lambda: peel_loglikelihood_pallas(tips, tree0.children, order, tree0.root, pm, freqs, cw, weights))
timeit("v2 mxu   ", lambda: peel_loglikelihood_mxu(tips, tree0.children, order, tree0.root, pm, freqs, cw, weights))
timeit("xla scan ", lambda: peel_loglikelihood(tips, tree0.children, order, tree0.root, pm, freqs, cw, weights))

# vmapped over chains (same tree, chains vary pm)
for ch in (8, 32):
    pms = jnp.broadcast_to(pm, (ch,) + pm.shape) * (1.0 + 0*jnp.arange(ch)[:, None, None, None, None])
    f1 = lambda pms: jax.vmap(lambda q: peel_loglikelihood_pallas(tips, tree0.children, order, tree0.root, q, freqs, cw, weights))(pms)
    f2 = lambda pms: jax.vmap(lambda q: peel_loglikelihood_mxu(tips, tree0.children, order, tree0.root, q, freqs, cw, weights))(pms)
    timeit(f"v1 pallas x{ch}", f1, pms, n=50)
    timeit(f"v2 mxu    x{ch}", f2, pms, n=50)
