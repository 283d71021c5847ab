import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state, make_mcmc_step, make_multichain_step, run_chain)

N = 128
for use_pallas, label in ((False, "scan"), (None, "pallas")):
    try:
        log_post, ops, params0, tree0, aux = build_analysis(
            62, 5565, "gtr_gamma", dtype=jnp.float32, use_pallas=use_pallas)
        mstep = make_multichain_step(aux["log_post_cached"], ops,
                                     derived=aux["derived"])
        st = init_mcmc_state(params0, tree0, jax.random.PRNGKey(0), ops,
                             log_post, dtype=jnp.float32)
        for ch in (1, 8, 32):
            sts = jax.vmap(lambda k: st.replace(key=k))(
                jax.random.split(jax.random.PRNGKey(1), ch))
            def body(c, _):
                s, k = c
                k, k2 = jax.random.split(k)
                return (mstep(s, k2), k), None
            run = jax.jit(lambda s: jax.lax.scan(
                body, (s, jax.random.PRNGKey(2)), None, length=N)[0][0])
            s = run(sts); jax.block_until_ready(s.log_posterior)
            t0 = time.perf_counter()
            s = run(sts); jax.block_until_ready(s.log_posterior)
            dt = time.perf_counter() - t0
            print(f"MC {label} ch={ch}: {ch*N/dt:.1f} agg states/s "
                  f"({dt/N*1000:.3f} ms/step)", flush=True)
    except Exception as e:
        print(f"MC {label} FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)
