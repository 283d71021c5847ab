import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.models.substitution import gtr_eigen
r = jnp.asarray(np.array([1,2,1,1,2,1.0]), jnp.float32)
eig = gtr_eigen(r, jnp.full(4,0.25,jnp.float32))
print("I U:", np.asarray(eig.U))
print("I Uinv:", np.asarray(eig.U_inv))
