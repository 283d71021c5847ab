import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.models.substitution import gtr_eigen
from beast_mcmc_tpu.ops.eigen import transition_probs
r = jnp.asarray(np.array([1,2,1,1,2,1.0]), jnp.float32)
eig = gtr_eigen(r, jnp.full(4,0.25,jnp.float32))
print("J finite U:", bool(jnp.all(jnp.isfinite(eig.U))), bool(jnp.all(jnp.isfinite(eig.U_inv))), bool(jnp.all(jnp.isfinite(eig.values))))
t = jnp.linspace(0, 2.0, 10).astype(jnp.float32)
p = transition_probs(eig, t)
print("J pm finite:", bool(jnp.all(jnp.isfinite(p))))
# also t containing 0 for root
t2 = jnp.zeros((3,), jnp.float32)
p2 = transition_probs(eig, t2)
print("J pm0 finite:", bool(jnp.all(jnp.isfinite(p2))))
