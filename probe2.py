import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain, full_evaluation_check

log_post, operators, params0, tree0, aux = build_analysis(
    n_taxa=62, n_patterns=5565, model="gtr_gamma", dtype=jnp.float32)
lpc = aux["log_post_cached"]

# C: step WITHOUT derived cache: carried vs fresh using plain log_post
step_nc = make_mcmc_step(log_post, operators)
st = init_mcmc_state(params0, tree0, jax.random.PRNGKey(2), operators, log_post, dtype=jnp.float32)
chk_nc = jax.jit(lambda s: full_evaluation_check(step_nc, log_post, s, 64))
_, dev_nc = chk_nc(st)
print("C no-cache carried-vs-fresh:", float(dev_nc))

# D: magnitude of logL
print("D logL magnitude:", float(log_post(params0, tree0)))

# E: cached-vs-plain at the same params (fresh derived)
from beast_mcmc_tpu.inference.mcmc import init_mcmc_state as ims
st2 = init_mcmc_state(params0, tree0, jax.random.PRNGKey(2), operators, log_post, dtype=jnp.float32)
step_c = make_mcmc_step(lpc, operators, derived=aux["derived"])
chk_c = jax.jit(lambda s: full_evaluation_check(step_c, lpc, s, 0, derived=aux["derived"]))
_, dev0 = chk_c(st2)
print("E cache check at 0 steps:", float(dev0))
