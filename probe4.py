import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.models.substitution import gtr_eigen
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
import numpy as np
log_post, operators, params0, tree0, aux = build_analysis(
    n_taxa=62, n_patterns=5565, model="gtr_gamma", dtype=jnp.float32)
print("G lp0:", float(log_post(params0, tree0)))
eig = jax.jit(lambda r: gtr_eigen(r, jnp.full(4, 0.25, jnp.float32)))(params0["gtr.rates"])
print("G eig vals:", np.asarray(eig.values))
r, w = discrete_gamma_rates(params0["alpha"], 4, dtype=jnp.float32)
print("G rates:", np.asarray(r), np.asarray(w))
