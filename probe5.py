import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
log_post, operators, params0, tree0, aux = build_analysis(
    n_taxa=62, n_patterns=5565, model="gtr_gamma", dtype=jnp.float32)
from beast_mcmc_tpu.models.substitution import gtr_eigen
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
from beast_mcmc_tpu.models.treelikelihood import branch_transition_matrices, tree_loglikelihood
freqs = aux["freqs"] if "freqs" in aux else jnp.full(4,0.25,jnp.float32)
eig = gtr_eigen(params0["gtr.rates"], freqs)
rates, cw = discrete_gamma_rates(params0["alpha"], 4, dtype=jnp.float32)
pm = branch_transition_matrices(eig, tree0.parent, tree0.heights, params0["clock.rate"], rates)
print("H pm finite:", bool(jnp.all(jnp.isfinite(pm))), "dtype", pm.dtype)
print("H eig dtypes:", eig.values.dtype, eig.U.dtype)
ll = tree_loglikelihood(aux["tips"], aux["weights"], tree0.parent, tree0.children,
                        tree0.heights, tree0.root, eig, freqs, rates, cw, params0["clock.rate"])
print("H ll:", float(ll))
