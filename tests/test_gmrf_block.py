"""GMRF skyride block-update operator (ref:
GMRFSkyrideBlockUpdateOperator.java:245-345).

Oracle: a chain driven ONLY by the block update samples the same field
posterior as an independent long random-walk MH chain on the same
skyride posterior (posterior invariance of the Laplace-approximation
proposal + its Hastings correction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.inference.gibbs import GmrfBlockUpdateOperator
from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)
from beast_mcmc_tpu.inference.operators import (
    RandomWalkOperator,
    ScaleOperator,
)
from beast_mcmc_tpu.models.coalescent import (
    gmrf_skyride_loglik,
    gmrf_skyride_uniform_prior,
)
from beast_mcmc_tpu.models.priors import gamma_logpdf
from beast_mcmc_tpu.tree.topology import (
    make_tree_state,
    simulate_coalescent_tree,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    n = 6
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n), 1.0)
    tree0 = make_tree_state(parent, children, heights, root, jnp.float64)

    def log_post(params, tree):
        g = params["skyride.logPopSize"]
        tau = params["skyride.precision"]
        return (
            gmrf_skyride_loglik(tree.heights, n, g)
            + gmrf_skyride_uniform_prior(g, tau)
            + gamma_logpdf(tau, 1.0, 1.0)
        )

    params0 = {
        "skyride.logPopSize": jnp.zeros(n - 1),
        "skyride.precision": jnp.asarray(1.0),
    }
    return log_post, params0, tree0, n


def _posterior_mean(log_post, params0, tree0, ops, steps, seed):
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(params0, tree0, jax.random.PRNGKey(seed),
                            ops, log_post)

    def collector(s):
        return {"g": s.params["skyride.logPopSize"],
                "tau": s.params["skyride.precision"]}

    state, trace = jax.jit(
        lambda s: run_chain(step, s, steps, 10, collector))(state)
    burn = trace["g"].shape[0] // 4
    return (np.asarray(trace["g"][burn:]).mean(axis=0),
            float(np.asarray(trace["tau"][burn:]).mean()),
            float(np.asarray(state.op_accept).sum()))


def test_block_update_matches_random_walk_posterior(problem):
    log_post, params0, tree0, n = problem
    block = GmrfBlockUpdateOperator(
        field="skyride.logPopSize", precision="skyride.precision",
        n_taxa=n, weight=1.0, time_aware=False)
    g_block, tau_block, acc = _posterior_mean(
        log_post, params0, tree0, [block], 20_000, 0)
    assert acc > 100  # the block update must actually move

    rw = [
        RandomWalkOperator(parameter="skyride.logPopSize", weight=3.0,
                           window=0.8),
        ScaleOperator(parameter="skyride.precision", weight=1.0,
                      scale_factor=0.75),
    ]
    g_rw, tau_rw, _ = _posterior_mean(log_post, params0, tree0, rw,
                                      60_000, 1)
    np.testing.assert_allclose(g_block, g_rw, atol=0.25)
    assert tau_block == pytest.approx(tau_rw, rel=0.3)
