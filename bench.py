"""Benchmark driver: MCMC states/sec on the benchmark2-shaped analysis.

Prints ONE JSON line:
  {"metric": "mcmc_states_per_sec", "value": N, "unit": "states/sec",
   "vs_baseline": R, ...}

The problem shape mirrors the reference's benchmark2 (ref:
examples/Benchmarks/benchmark2.xml — 62 taxa, 5565 unique patterns,
GTR+Gamma(4), strict clock, constant coalescent). The reference publishes
no absolute numbers (BASELINE.md), so vs_baseline reports the speedup of
this chip over this host's CPU running the identical single-chain
workload (measured in a subprocess with JAX_PLATFORMS=cpu).
"""

import json
import os
import subprocess
import sys
import time

N_TAXA = 62
N_PATTERNS = 5565
WARMUP_STEPS = 64
BENCH_STEPS = 2048


def measure_states_per_sec(n_steps: int) -> float:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from beast_mcmc_tpu.apps.benchmarks import build_analysis
    from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain

    log_post, operators, params0, tree0, aux = build_analysis(
        n_taxa=N_TAXA, n_patterns=N_PATTERNS, model="gtr_gamma",
        dtype=jnp.float32,
    )
    # hot path: cached-derived posterior (eigen/gamma rebuilt only in
    # operator branches that change their inputs)
    step = make_mcmc_step(
        aux["log_post_cached"], operators, derived=aux["derived"]
    )
    state = init_mcmc_state(
        params0, tree0, jax.random.PRNGKey(0), operators, log_post,
        dtype=jnp.float32,
    )

    run = jax.jit(lambda s, n: run_chain(step, s, n)[0], static_argnums=1)
    # warm up with the SAME program shape so compile stays out of the timing
    state = run(state, n_steps)
    jax.block_until_ready(state.log_posterior)

    t0 = time.perf_counter()
    state = run(state, n_steps)
    jax.block_until_ready(state.log_posterior)
    dt = time.perf_counter() - t0
    assert float(state.log_posterior) == float(state.log_posterior), "NaN posterior"
    return n_steps / dt


def main():
    if "--cpu-probe" in sys.argv:
        # subprocess mode: print CPU states/sec only
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"cpu_states_per_sec": measure_states_per_sec(128)}))
        return

    tpu_sps = measure_states_per_sec(BENCH_STEPS)

    vs_baseline = 0.0
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-probe"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cpu_sps = json.loads(line)["cpu_states_per_sec"]
                vs_baseline = tpu_sps / cpu_sps
                break
    except Exception:
        pass

    print(json.dumps({
        "metric": "mcmc_states_per_sec",
        "value": round(tpu_sps, 2),
        "unit": "states/sec",
        "vs_baseline": round(vs_baseline, 2),
        "config": f"benchmark2-shape GTR+G4 {N_TAXA} taxa {N_PATTERNS} patterns f32",
        "baseline_def": "same workload on host CPU (single chain)",
    }))


if __name__ == "__main__":
    main()
