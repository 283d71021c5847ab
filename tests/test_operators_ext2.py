"""Round-4 generic operators: TeamOperator, RateBitExchange,
MvnRandomWalk, SubsetRandomWalk, TransformedRandomWalk (stationarity /
mechanics)."""

import numpy as np

import jax
import jax.numpy as jnp

from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)
from beast_mcmc_tpu.inference.operators import (
    MvnRandomWalkOperator,
    RateBitExchangeOperator,
    ScaleOperator,
    SubsetRandomWalkOperator,
    TeamOperator,
    TransformedRandomWalkOperator,
)
from beast_mcmc_tpu.tree.topology import make_tree_state
from beast_mcmc_tpu.utils.transforms import LogTransform


def _tree():
    parent = np.array([2, 2, -1], np.int32)
    children = np.array([[-1, -1], [-1, -1], [0, 1]], np.int32)
    return make_tree_state(parent, children,
                           np.array([0.0, 0.0, 1.0]), 2, jnp.float64)


def _run(ops, params, log_post, n=8000, seed=0):
    step = make_mcmc_step(log_post, ops)
    st = init_mcmc_state(params, _tree(), jax.random.PRNGKey(seed), ops,
                         log_post, dtype=jnp.float64)
    run = jax.jit(lambda s: run_chain(step, s, 500)[0])
    xs = []
    for _ in range(n // 500):
        st = run(st)
        xs.append({k: np.asarray(v) for k, v in st.params.items()})
    return xs, st


def test_team_operator_samples_gaussian():
    def log_post(params, tree):
        return -0.5 * jnp.sum(params["a"] ** 2) - 0.5 * jnp.sum(
            (params["b"] - 1.0) ** 2)

    team = TeamOperator(
        sub_operators=(
            SubsetRandomWalkOperator(parameter="a", indices=(0,),
                                     window=1.5),
            SubsetRandomWalkOperator(parameter="b", indices=(0,),
                                     window=1.5),
        ),
        n_pick=1, weight=1.0)
    xs, st = _run([team], {"a": jnp.zeros(1), "b": jnp.zeros(1)},
                  log_post, n=20000)
    a = np.array([x["a"][0] for x in xs[10:]])
    b = np.array([x["b"][0] for x in xs[10:]])
    assert abs(a.mean()) < 0.6 and abs(b.mean() - 1.0) < 0.6
    assert int(np.asarray(st.op_accept).sum()) > 1000


def test_rate_bit_exchange_swaps_pairs():
    bits0 = jnp.asarray([1.0, 0.0])
    rates0 = jnp.asarray([2.0, 7.0])

    def log_post(params, tree):
        return jnp.zeros(())

    op = RateBitExchangeOperator(bit_parameter="bits",
                                 rate_parameter="rates", weight=1.0)
    # ODD stride: with a flat target every swap accepts, so an even
    # number of steps returns to the start state deterministically
    step = make_mcmc_step(log_post, [op])
    st = init_mcmc_state({"bits": bits0, "rates": rates0}, _tree(),
                         jax.random.PRNGKey(0), [op], log_post,
                         dtype=jnp.float64)
    run = jax.jit(lambda s: run_chain(step, s, 501)[0])
    xs = []
    for _ in range(4):
        st = run(st)
        xs.append({k: np.asarray(v) for k, v in st.params.items()})
    seen = {tuple(np.round(x["rates"], 3)) for x in xs}
    # pairs move together and the multiset {2,7} is invariant
    for x in xs:
        assert sorted(np.round(x["rates"], 3)) == [2.0, 7.0]
        assert sorted(x["bits"]) == [0.0, 1.0]
    assert len(seen) == 2  # both orientations visited


def test_transformed_rw_targets_lognormal():
    # walk on log(x) with Jacobian: x must be LogNormal(0,1) under a
    # standard-normal density on log x
    def log_post(params, tree):
        x = params["x"][0]
        return -0.5 * (jnp.log(x)) ** 2 - jnp.log(x)

    op = TransformedRandomWalkOperator(
        parameter="x", transform=LogTransform(), window=1.0, weight=1.0)
    xs, st = _run([op], {"x": jnp.ones(1)}, log_post, n=30000)
    lx = np.log([x["x"][0] for x in xs[10:]])
    assert abs(lx.mean()) < 0.25
    assert abs(lx.std() - 1.0) < 0.25


def test_mvn_rw_correlated_proposals():
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    chol = np.linalg.cholesky(cov)

    def log_post(params, tree):
        x = params["x"]
        prec = jnp.linalg.inv(jnp.asarray(cov))
        return -0.5 * x @ prec @ x

    op = MvnRandomWalkOperator(parameter="x", chol=chol,
                               scale_factor=0.8, weight=1.0)
    xs, st = _run([op], {"x": jnp.zeros(2)}, log_post, n=30000)
    arr = np.stack([x["x"] for x in xs[10:]])
    corr = np.corrcoef(arr.T)[0, 1]
    assert corr > 0.6, corr
