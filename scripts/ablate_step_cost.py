"""One-shot ablation of MCMC step cost on the TPU (run in background).

Builds several chain variants and times each inside a single process to
amortize tunnel/compile overhead. Results guide kernel optimization.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax as _jax_cfg

import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.priors import lognormal_logpdf, one_on_x_logpdf
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
from beast_mcmc_tpu.models.substitution import gtr_eigen
from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood

N = 128

log_post, ops, params0, tree0, aux = build_analysis(62, 5565, "gtr_gamma", dtype=jnp.float32)
tips, weights, freqs = aux["tips"], aux["weights"], aux["freqs"]

eig_fixed = jax.jit(lambda r: gtr_eigen(r, freqs))(params0["gtr.rates"])
eig_fixed = jax.tree_util.tree_map(lambda x: jax.device_get(x), eig_fixed)
eig_fixed = jax.tree_util.tree_map(jnp.asarray, eig_fixed)
rates_fixed, cw_fixed = discrete_gamma_rates(jnp.float32(0.5), 4, dtype=jnp.float32)


def lp_full(p, t):
    return log_post(p, t)


def lp_no_gamma(p, t):
    eig = gtr_eigen(p["gtr.rates"], freqs)
    ll = tree_loglikelihood(tips, weights, t.parent, t.children, t.heights,
                            t.root, eig, freqs, rates_fixed, cw_fixed, p["clock.rate"])
    return ll + one_on_x_logpdf(p["pop.size"]) + constant_coalescent_loglik(t.heights, 62, p["pop.size"])


def lp_no_eigen(p, t):
    rates, cw = discrete_gamma_rates(p["alpha"], 4, dtype=jnp.float32)
    ll = tree_loglikelihood(tips, weights, t.parent, t.children, t.heights,
                            t.root, eig_fixed, freqs, rates, cw, p["clock.rate"])
    return ll + one_on_x_logpdf(p["pop.size"]) + constant_coalescent_loglik(t.heights, 62, p["pop.size"])


def lp_lik_only(p, t):
    return tree_loglikelihood(tips, weights, t.parent, t.children, t.heights,
                              t.root, eig_fixed, freqs, rates_fixed, cw_fixed, 1.0)


def lp_dummy(p, t):
    return -jnp.sum(t.heights ** 2)


def lp_coal_only(p, t):
    return constant_coalescent_loglik(t.heights, 62, p["pop.size"])


def bench(name, lp):
    step = make_mcmc_step(lp, ops)
    state = init_mcmc_state(params0, tree0, jax.random.PRNGKey(0), ops, None, dtype=jnp.float32)
    state = state.replace(log_posterior=jnp.float32(-1e6))
    run = jax.jit(lambda s: run_chain(step, s, N)[0])
    t0 = time.perf_counter()
    s = run(state); jax.block_until_ready(s.log_posterior)
    ct = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = run(state); jax.block_until_ready(s.log_posterior)
    dt = time.perf_counter() - t0
    print(f"{name:14s}: {dt/N*1000:7.3f} ms/step  (compile {ct:.0f}s)", flush=True)


bench("dummy", lp_dummy)
bench("coal_only", lp_coal_only)
bench("lik_only", lp_lik_only)
bench("no_gamma", lp_no_gamma)
bench("no_eigen", lp_no_eigen)
bench("full", lp_full)
