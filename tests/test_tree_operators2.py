"""NNI / FixedHeightSPR / node-height operators / Joint + Gibbs operators
(ref: src/dr/evomodel/operators/NNI.java,
FixedHeightSubtreePruneRegraftOperator.java, ScaleNodeHeightOperator.java,
RandomWalkNodeHeightOperator.java; src/dr/inference/operators/
JointOperator.java, NormalGammaPrecisionGibbsOperator.java).

Statistical-expectation oracle as in test_tree_operators.py: a chain with
only the operator under test (+ height mixing) must reproduce the known
constant-coalescent E[rootHeight]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    operator_report,
    run_chain,
)
from beast_mcmc_tpu.inference.operators import (
    JointOperator,
    NormalGammaPrecisionGibbsOperator,
    NormalNormalMeanGibbsOperator,
    RootHeightScaleOperator,
    ScaleOperator,
    UniformNodeHeightOperator,
)
from beast_mcmc_tpu.inference.trace import analyze
from beast_mcmc_tpu.inference.tree_operators import (
    FixedHeightSPROperator,
    NNIOperator,
    RandomWalkNodeHeightOperator,
    ScaleNodeHeightOperator,
)
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.priors import gamma_logpdf, normal_logpdf
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree

from test_mcmc import check_tree_valid


@pytest.mark.parametrize(
    "op",
    [
        NNIOperator(weight=5.0),
        FixedHeightSPROperator(weight=5.0),
    ],
    ids=["nni", "fhspr"],
)
def test_topology_operator_prior_expectation(op):
    n_taxa = 6
    theta = 1.0
    rng = np.random.default_rng(3)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n_taxa), pop_size=theta
    )
    tree = make_tree_state(parent, children, heights, root)

    def log_post(params, tree):
        return constant_coalescent_loglik(tree.heights, n_taxa, theta)

    ops = [
        op,
        UniformNodeHeightOperator(weight=8.0),
        RootHeightScaleOperator(weight=3.0),
    ]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({}, tree, jax.random.PRNGKey(11), ops, log_post)

    def collector(s):
        return {"rh": s.tree.heights[s.tree.root]}

    state, out = jax.jit(
        lambda s: run_chain(step, s, 60_000, collect_every=10,
                            collector=collector)
    )(state)
    rh = np.asarray(out["rh"])[300:]
    stats = analyze(rh)
    expected = theta * sum(2.0 / (k * (k - 1)) for k in range(2, n_taxa + 1))
    assert stats.ess > 80, operator_report(ops, state)
    assert abs(stats.mean - expected) < 4.0 * stats.std_error_of_mean, (
        f"E[rootHeight]={stats.mean:.4f} expected {expected:.4f}\n"
        + operator_report(ops, state)
    )
    assert int(state.op_accept[0]) > 100, operator_report(ops, state)
    check_tree_valid(
        state.tree.parent, state.tree.children, state.tree.heights,
        state.tree.root, n_taxa,
    )


@pytest.mark.parametrize(
    "op",
    [
        ScaleNodeHeightOperator(weight=8.0),
        RandomWalkNodeHeightOperator(window=0.5, weight=8.0),
    ],
    ids=["scale_h", "walk_h"],
)
def test_height_operator_prior_expectation(op):
    """Height-only operators (no topology moves) still must sample the
    correct height marginal on a fixed topology + root scaling."""
    n_taxa = 6
    theta = 1.0
    rng = np.random.default_rng(4)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n_taxa), pop_size=theta
    )
    tree = make_tree_state(parent, children, heights, root)

    def log_post(params, tree):
        return constant_coalescent_loglik(tree.heights, n_taxa, theta)

    ops = [op, RootHeightScaleOperator(weight=3.0)]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({}, tree, jax.random.PRNGKey(7), ops, log_post)
    state, out = jax.jit(
        lambda s: run_chain(
            step, s, 60_000, collect_every=10,
            collector=lambda s: {"rh": s.tree.heights[s.tree.root]},
        )
    )(state)
    rh = np.asarray(out["rh"])[300:]
    stats = analyze(rh)
    # fixed topology: root-height mean is still the coalescent expectation
    expected = theta * sum(2.0 / (k * (k - 1)) for k in range(2, n_taxa + 1))
    assert abs(stats.mean - expected) < 4.0 * stats.std_error_of_mean, (
        operator_report(ops, state)
    )
    assert int(state.op_accept[0]) > 1000, operator_report(ops, state)
    check_tree_valid(
        state.tree.parent, state.tree.children, state.tree.heights,
        state.tree.root, n_taxa,
    )


def _dummy_tree():
    parent = jnp.asarray([2, 2, -1], jnp.int32)
    children = jnp.asarray([[-1, -1], [-1, -1], [0, 1]], jnp.int32)
    heights = jnp.asarray([0.0, 0.0, 1.0])
    return make_tree_state(parent, children, heights, 2)


def test_gibbs_normal_gamma_matches_conjugate_posterior():
    """Gibbs sampling mean+precision of a normal likelihood must match the
    closed-form conjugate marginals."""
    rng = np.random.default_rng(5)
    data = rng.normal(2.0, 0.5, 40)
    tree = _dummy_tree()
    prior_shape, prior_rate = 2.0, 1.0
    prior_mean, prior_prec = 0.0, 1e-2

    def log_post(params, tree):
        ll = normal_logpdf(jnp.asarray(data), params["mu"],
                           1.0 / jnp.sqrt(params["tau"]))
        lp = gamma_logpdf(params["tau"], prior_shape, 1.0 / prior_rate)
        lp = lp + normal_logpdf(params["mu"], prior_mean,
                                1.0 / np.sqrt(prior_prec))
        return ll + lp

    ops = [
        NormalGammaPrecisionGibbsOperator(
            data_parameter="data", mean_parameter="mu",
            precision_parameter="tau", prior_shape=prior_shape,
            prior_rate=prior_rate, weight=1.0),
        NormalNormalMeanGibbsOperator(
            data_parameter="data", mean_parameter="mu",
            precision_parameter="tau", prior_mean=prior_mean,
            prior_precision=prior_prec, weight=1.0),
    ]
    params0 = {"data": jnp.asarray(data), "mu": jnp.asarray(0.0),
               "tau": jnp.asarray(1.0)}
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(params0, tree, jax.random.PRNGKey(1), ops, log_post)
    state, out = jax.jit(
        lambda s: run_chain(
            step, s, 20_000, collect_every=5,
            collector=lambda s: {"mu": s.params["mu"], "tau": s.params["tau"]},
        )
    )(state)
    mu = np.asarray(out["mu"])[200:]
    tau = np.asarray(out["tau"])[200:]
    # Gibbs moves are always accepted
    assert int(state.op_reject[0]) == 0 and int(state.op_reject[1]) == 0
    # Gibbs chain posterior means vs a long conditional-update oracle:
    # cross-check with an independent numpy Gibbs sampler
    mu_o, tau_o = 0.0, 1.0
    mus, taus = [], []
    n = len(data)
    for it in range(30_000):
        shape = prior_shape + 0.5 * n
        rate = prior_rate + 0.5 * np.sum((data - mu_o) ** 2)
        tau_o = rng.gamma(shape) / rate
        pp = prior_prec + n * tau_o
        pm = (prior_prec * prior_mean + tau_o * data.sum()) / pp
        mu_o = rng.normal(pm, 1.0 / np.sqrt(pp))
        if it > 1000:
            mus.append(mu_o)
            taus.append(tau_o)
    assert abs(mu.mean() - np.mean(mus)) < 0.05
    assert abs(tau.mean() - np.mean(taus)) < 0.3


def test_joint_operator_moves_and_bounds():
    tree = _dummy_tree()

    def log_post(params, tree):
        # lognormal(0,1) densities in a and b (incl. the 1/x Jacobian),
        # so log(a) ~ N(0,1)
        la, lb = jnp.log(params["a"]), jnp.log(params["b"])
        return -0.5 * (la**2 + lb**2) - la - lb

    joint = JointOperator(
        sub_operators=[
            ScaleOperator(parameter="a", scale_factor=0.7),
            ScaleOperator(parameter="b", scale_factor=0.7),
        ],
        weight=1.0,
    )
    params0 = {"a": jnp.asarray(1.0), "b": jnp.asarray(1.0)}
    step = make_mcmc_step(log_post, [joint])
    state = init_mcmc_state(params0, tree, jax.random.PRNGKey(9), [joint],
                            log_post)
    state, out = jax.jit(
        lambda s: run_chain(
            step, s, 8_000, collect_every=4,
            collector=lambda s: {"a": s.params["a"], "b": s.params["b"]},
        )
    )(state)
    a = np.asarray(out["a"])[200:]
    assert int(state.op_accept[0]) > 500
    # marginal of log(a) is N(0,1)
    assert abs(np.log(a).mean()) < 0.15
