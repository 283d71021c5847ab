import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, full_evaluation_check
log_post, operators, params0, tree0, aux = build_analysis(
    n_taxa=62, n_patterns=5565, model="gtr_gamma", dtype=jnp.float32)
lpc = aux["log_post_cached"]
step = make_mcmc_step(lpc, operators, derived=aux["derived"])
st = init_mcmc_state(params0, tree0, jax.random.PRNGKey(2), operators, log_post, dtype=jnp.float32)
chk = jax.jit(lambda s: full_evaluation_check(step, lpc, s, 256, derived=aux["derived"]))
_, dev = chk(st)
print("F cached carried-vs-fresh after 256 steps:", float(dev))
