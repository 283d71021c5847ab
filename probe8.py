import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.models.substitution import gtr_eigen
log_post, operators, params0, tree0, aux = build_analysis(
    n_taxa=62, n_patterns=5565, model="gtr_gamma", dtype=jnp.float32)
print("K gtr.rates:", np.asarray(params0["gtr.rates"]), params0["gtr.rates"].dtype)
freqs = aux.get("freqs", jnp.full(4,0.25,jnp.float32))
print("K freqs:", np.asarray(freqs), freqs.dtype)
eig = gtr_eigen(params0["gtr.rates"], freqs)
print("K U finite:", bool(jnp.all(jnp.isfinite(eig.U))), bool(jnp.all(jnp.isfinite(eig.U_inv))))
print("K vals:", np.asarray(eig.values))
