"""Geodesic HMC + low-rank mass preconditioning (VERDICT r3 missing #9;
ref: GeodesicHamiltonianMonteCarloOperator.java,
MassPreconditioner.java:51)."""

import numpy as np

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.hmc import GeodesicHmcOperator, HmcOperator
from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)
from beast_mcmc_tpu.tree.topology import make_tree_state


def _dummy_tree():
    parent = np.array([2, 2, -1], np.int32)
    children = np.array([[-1, -1], [-1, -1], [0, 1]], np.int32)
    heights = np.array([0.0, 0.0, 1.0])
    return make_tree_state(parent, children, heights, 2, jnp.float64)


def test_geodesic_hmc_keeps_sphere_and_targets_vmf():
    """x on S^2 with p(x) ~ exp(kappa mu.x): the chain must stay ON the
    sphere to machine precision and concentrate around mu."""
    mu = np.array([0.0, 0.0, 1.0])
    kappa = 4.0

    def log_post(params, tree):
        x = jnp.reshape(params["x"], (1, 3))
        return kappa * jnp.sum(x @ jnp.asarray(mu))

    op = GeodesicHmcOperator(parameter="x", block_dim=3, weight=1.0,
                             n_leapfrog=8, step_size=0.3)
    tree = _dummy_tree()
    params = {"x": jnp.asarray([1.0, 0.0, 0.0])}
    step = make_mcmc_step(log_post, [op])
    st = init_mcmc_state(params, tree, jax.random.PRNGKey(0), [op],
                         log_post, dtype=jnp.float64)

    collect = []
    run = jax.jit(lambda s: run_chain(step, s, 200)[0])
    for _ in range(40):
        st = run(st)
        collect.append(np.asarray(st.params["x"]))
    xs = np.stack(collect)
    norms = np.linalg.norm(xs, axis=1)
    assert np.max(np.abs(norms - 1.0)) < 1e-8
    # vMF(kappa=4) mean resultant length ~ coth(k)-1/k ~ 0.75 toward mu
    mean_dir = xs.mean(0)
    assert mean_dir[2] > 0.45, mean_dir
    acc = int(np.asarray(st.op_accept).sum())
    assert acc > 100


def test_low_rank_preconditioning_anisotropic_gaussian():
    """HMC with low-rank Hessian mass on a badly-conditioned Gaussian
    must still sample the right marginal variances."""
    scales = jnp.asarray([100.0, 1.0, 1.0, 0.01])

    def log_post(params, tree):
        x = params["x"]
        return -0.5 * jnp.sum((x / scales) ** 2)

    op = HmcOperator(parameters=("x",), weight=1.0, n_leapfrog=15,
                     step_size=0.5, precondition="low_rank", low_rank=2,
                     log_transform=False)
    tree = _dummy_tree()
    params = {"x": jnp.zeros(4)}
    step = make_mcmc_step(log_post, [op])
    st = init_mcmc_state(params, tree, jax.random.PRNGKey(1), [op],
                         log_post, dtype=jnp.float64)
    run = jax.jit(lambda s: run_chain(step, s, 100)[0])
    xs = []
    for _ in range(60):
        st = run(st)
        xs.append(np.asarray(st.params["x"]))
    xs = np.stack(xs)
    sd = xs.std(0)
    # each dimension mixes near its true scale (low-rank mass captures
    # the two extreme curvature directions; the rest use the median)
    assert 30.0 < sd[0] < 300.0, sd
    assert 0.003 < sd[3] < 0.03, sd
    assert int(np.asarray(st.op_accept).sum()) > 1000
