"""NUTS / slice / elliptical-slice / MVN operator tests.

Validation follows the reference's statistical-expectation pattern
(SURVEY.md §4.8): each sampler must reproduce analytic moments of a known
target within Monte-Carlo error. A broken U-turn criterion, slice bracket
or Jacobian shifts these moments.
"""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain
from beast_mcmc_tpu.inference.nuts import NutsOperator
from beast_mcmc_tpu.inference.samplers import (
    EllipticalSliceOperator,
    MvnOperator,
    SliceOperator,
    empirical_covariance,
)
from beast_mcmc_tpu.models.priors import gamma_logpdf, normal_logpdf
from beast_mcmc_tpu.tree.topology import make_tree_state


def dummy_tree():
    # 2-taxon placeholder tree (the samplers only move params)
    return make_tree_state(
        parent=[2, 2, -1], children=[[-1, -1], [-1, -1], [0, 1]],
        heights=[0.0, 0.0, 1.0], root=2,
    )


def run(operators, params0, log_post, n_steps, seed=0, collect_every=10):
    step = make_mcmc_step(log_post, operators)
    state = init_mcmc_state(
        params0, dummy_tree(), jax.random.PRNGKey(seed), operators, log_post
    )
    collector = lambda s: {k: v for k, v in s.params.items()}
    (state, trace) = jax.jit(
        lambda s: run_chain(step, s, n_steps, collect_every, collector)
    )(state)
    return state, {k: np.asarray(v) for k, v in trace.items()}


def test_nuts_gamma_target():
    # x ~ Gamma(shape=3, scale=2): E = 6, Var = 12
    shape, scale = 3.0, 2.0

    def log_post(params, tree):
        return jnp.sum(gamma_logpdf(params["x"], shape, scale))

    ops = [NutsOperator(parameters=["x"], step_size=0.5, max_depth=5)]
    _, trace = run(ops, {"x": jnp.asarray(4.0)}, log_post, 4000)
    xs = trace["x"][20:]
    se = xs.std() / np.sqrt(len(xs) / 10.0)  # crude autocorrelation discount
    assert abs(xs.mean() - shape * scale) < max(4 * se, 0.5), xs.mean()
    assert abs(xs.var() - shape * scale**2) < 4.0, xs.var()


def test_nuts_correlated_normal():
    # 2D normal, rho = 0.9 — NUTS handles this; a broken trajectory won't
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray([1.0, -2.0])

    def log_post(params, tree):
        d = params["x"] - mean
        return -0.5 * d @ prec @ d

    ops = [NutsOperator(
        parameters=["x"], step_size=0.3, max_depth=5, log_transform=False
    )]
    _, trace = run(ops, {"x": jnp.zeros(2)}, log_post, 4000)
    xs = trace["x"][20:]
    assert np.allclose(xs.mean(axis=0), [1.0, -2.0], atol=0.3), xs.mean(axis=0)
    emp = np.corrcoef(xs.T)[0, 1]
    assert abs(emp - 0.9) < 0.1, emp


def test_slice_gamma_target():
    shape, scale = 3.0, 2.0

    def log_post(params, tree):
        return jnp.sum(gamma_logpdf(params["x"], shape, scale))

    ops = [SliceOperator(parameter="x", width=2.0, log_transform=True)]
    _, trace = run(ops, {"x": jnp.asarray(4.0)}, log_post, 6000)
    xs = trace["x"][50:]
    assert abs(xs.mean() - 6.0) < 0.6, xs.mean()
    assert abs(xs.var() - 12.0) < 5.0, xs.var()


def test_elliptical_slice_normal_product():
    # prior N(0, 1) x likelihood N(2, 0.5^2):
    # posterior N(mu*, s*): s* = 1/(1+4) = 0.2, mu* = s* * (2/0.25) = 1.6
    def log_post(params, tree):
        x = params["x"]
        return (
            jnp.sum(normal_logpdf(x, 0.0, 1.0))
            + jnp.sum(normal_logpdf(x, 2.0, 0.5))
        )

    ops = [EllipticalSliceOperator(parameter="x", prior_mean=0.0, prior_stdev=1.0)]
    _, trace = run(ops, {"x": jnp.zeros(3)}, log_post, 6000)
    xs = trace["x"][50:]
    assert np.allclose(xs.mean(axis=0), 1.6, atol=0.15), xs.mean(axis=0)
    assert abs(xs.var() - 0.2) < 0.08, xs.var()


def test_mvn_operator_with_empirical_cov():
    cov = np.array([[0.3, 0.2], [0.2, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray([1.0, 2.0])

    def log_post(params, tree):
        d = jnp.log(params["x"]) - mean
        # lognormal in x (Jacobian term): target log x ~ N(mean, cov)
        return -0.5 * d @ prec @ d - jnp.sum(jnp.log(params["x"]))

    ops = [MvnOperator(parameters=["x"], scale=0.5, log_transform=True)]
    _, trace = run(ops, {"x": jnp.exp(mean)}, log_post, 4000)
    chol = empirical_covariance(trace["x"][40:], log_space=True)
    assert chol.shape == (2, 2)
    # second phase with adapted covariance mixes and stays correct
    ops2 = [MvnOperator(parameters=["x"], scale=1.0, chol=chol)]
    _, trace2 = run(ops2, {"x": jnp.exp(mean)}, log_post, 6000, seed=1)
    logx = np.log(trace2["x"][50:])
    assert np.allclose(logx.mean(axis=0), [1.0, 2.0], atol=0.2), logx.mean(axis=0)
