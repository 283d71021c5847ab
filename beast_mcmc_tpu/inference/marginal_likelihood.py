"""Marginal-likelihood estimation: path sampling & stepping-stone.

Role of dr.inference.mcmc.MarginalLikelihoodEstimator +
dr.inference.model.PathLikelihood (ref: MarginalLikelihoodEstimator.java:
55-115,185 — anneal the path parameter beta over a beta-quantile schedule
of steps; PathLikelihood.java:44 — pathLogL = beta*logL + logPrior) and
the trace-side estimators (PathSamplingAnalysis.java,
SteppingStoneSamplingAnalysis.java).

Here the power posterior is just a tempered target: for each beta we run
the SAME jitted kernel with the posterior replaced by
  logP_beta = beta * logLik + logPrior
and collect logLik samples. Everything (all rungs) can also be run as ONE
vmapped batch across beta — the TPU-native version of the reference's
sequential chain of steps.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain


def beta_quantile_schedule(n_steps: int, alpha: float = 0.3) -> np.ndarray:
    """Beta(alpha,1)-quantile ladder 1 -> 0 (the reference's default
    'betaquantile' schedule, MarginalLikelihoodEstimator.java; alpha=0.3
    concentrates rungs near beta=0 where the integrand varies fastest)."""
    q = np.linspace(1.0, 0.0, n_steps)
    return q ** (1.0 / alpha)


def make_power_posterior(log_likelihood, log_prior):
    def power_log_post(beta):
        def lp(params, tree):
            return beta * log_likelihood(params, tree) + log_prior(params, tree)

        return lp

    return power_log_post


def sample_power_posteriors(
    log_likelihood,
    log_prior,
    operators,
    params0,
    tree0,
    betas: Sequence[float],
    chain_length: int,
    log_every: int,
    key,
    burnin_fraction: float = 0.1,
) -> np.ndarray:
    """Run one chain per beta sequentially (state handed down the ladder,
    like the reference's chain of steps). Returns logLik samples
    [n_betas, n_samples]."""
    power = make_power_posterior(log_likelihood, log_prior)
    all_samples = []
    state = None
    for i, beta in enumerate(betas):
        lp = power(float(beta))
        step = make_mcmc_step(lp, operators)
        if state is None:
            state = init_mcmc_state(params0, tree0, key, operators, lp)
        else:
            # re-evaluate the (new-beta) posterior at the inherited state
            state = state.replace(
                log_posterior=lp(state.params, state.tree))

        def collector(s):
            return {"loglik": log_likelihood(s.params, s.tree)}

        state, out = jax.jit(
            lambda s, stp=step: run_chain(stp, s, chain_length,
                                          collect_every=log_every,
                                          collector=collector))(state)
        samples = np.asarray(out["loglik"])
        n_burn = int(len(samples) * burnin_fraction)
        all_samples.append(samples[n_burn:])
    return np.asarray(all_samples)


def path_sampling_logml(log_liks: np.ndarray, betas: Sequence[float]) -> float:
    """Trapezoidal path-sampling estimator (ref: PathSamplingAnalysis.java):
    log m = int_0^1 E_beta[logL] dbeta."""
    means = log_liks.mean(axis=1)
    betas = np.asarray(betas, np.float64)
    order = np.argsort(betas)
    b = betas[order]
    m = means[order]
    return float(np.trapezoid(m, b))


def stepping_stone_logml(log_liks: np.ndarray, betas: Sequence[float]) -> float:
    """Stepping-stone estimator (ref: SteppingStoneSamplingAnalysis.java):
    log m = sum_k log E_{beta_k}[ exp((beta_{k+1}-beta_k) logL) ],
    computed with a log-sum-exp for stability."""
    betas = np.asarray(betas, np.float64)
    order = np.argsort(betas)
    b = betas[order]
    ll = log_liks[order]
    total = 0.0
    for k in range(len(b) - 1):
        d = b[k + 1] - b[k]
        x = d * ll[k]
        xmax = x.max()
        total += xmax + np.log(np.mean(np.exp(x - xmax)))
    return float(total)


def make_gss_path(log_likelihood, log_prior, log_reference):
    """Generalized stepping-stone path: the rung-beta target is
      logP_beta = beta*(logLik + logPrior) + (1-beta)*logRef
    i.e. it anneals from a normalized working/reference distribution
    (beta=0) to the posterior (beta=1) instead of from the prior.
    (ref: GeneralizedSteppingStoneSamplingAnalysis.java:45; the working
    distribution idea of Fan et al. 2011 as used by BEAST's GSS.)"""

    def power_log_post(beta):
        def lp(params, tree):
            joint = log_likelihood(params, tree) + log_prior(params, tree)
            return beta * joint + (1.0 - beta) * log_reference(params, tree)

        return lp

    return power_log_post


def sample_gss_ratios(
    log_likelihood,
    log_prior,
    log_reference,
    operators,
    params0,
    tree0,
    betas: Sequence[float],
    chain_length: int,
    log_every: int,
    key,
    burnin_fraction: float = 0.1,
) -> np.ndarray:
    """Run the GSS ladder; returns per-rung samples of
    (logLik + logPrior - logRef) — the quantity the GSS estimator
    exponentiates — shape [n_betas, n_samples]."""
    power = make_gss_path(log_likelihood, log_prior, log_reference)
    all_samples = []
    state = None
    for beta in betas:
        lp = power(float(beta))
        step = make_mcmc_step(lp, operators)
        if state is None:
            state = init_mcmc_state(params0, tree0, key, operators, lp)
        else:
            state = state.replace(log_posterior=lp(state.params, state.tree))

        def collector(s):
            joint = log_likelihood(s.params, s.tree) + log_prior(
                s.params, s.tree
            )
            return {"ratio": joint - log_reference(s.params, s.tree)}

        state, out = jax.jit(
            lambda s, stp=step: run_chain(stp, s, chain_length,
                                          collect_every=log_every,
                                          collector=collector))(state)
        samples = np.asarray(out["ratio"])
        n_burn = int(len(samples) * burnin_fraction)
        all_samples.append(samples[n_burn:])
    return np.asarray(all_samples)


def generalized_stepping_stone_logml(
    log_ratios: np.ndarray, betas: Sequence[float]
) -> float:
    """Generalized stepping-stone estimator (ref:
    GeneralizedSteppingStoneSamplingAnalysis.java:45 computeLogX):
      log m = sum_k log E_{beta_k}[ exp((beta_{k+1}-beta_k) *
                                        (logJoint - logRef)) ]
    with samples from the rung-k path target and a normalized reference
    (so beta=0 contributes log Z_ref = 0)."""
    betas = np.asarray(betas, np.float64)
    order = np.argsort(betas)
    b = betas[order]
    lr = log_ratios[order]
    total = 0.0
    for k in range(len(b) - 1):
        d = b[k + 1] - b[k]
        x = d * lr[k]
        xmax = x.max()
        total += xmax + np.log(np.mean(np.exp(x - xmax)))
    return float(total)


def harmonic_mean_logml(log_liks_posterior: np.ndarray) -> float:
    """Newton-Raftery harmonic mean (ref: trace/MarginalLikelihoodAnalysis
    harmonic mean option) — included for parity; known to be unstable."""
    x = -np.asarray(log_liks_posterior)
    xmax = x.max()
    return float(-(xmax + np.log(np.mean(np.exp(x - xmax)))))
