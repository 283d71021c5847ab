import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.ops.jacobi import jacobi_eigh
rng = np.random.default_rng(0)
m = rng.normal(size=(4,4)); m = m + m.T
for dt in (jnp.float32, jnp.float64):
    a = jnp.asarray(m, dt)
    w, v = jacobi_eigh(a)
    print("L", dt.__name__, "w:", np.asarray(w), "finite:", bool(jnp.all(jnp.isfinite(v))))
    w2, v2 = jnp.linalg.eigh(a)
    print("L eigh", dt.__name__, np.asarray(w2))
