"""MCMC kernel tests.

The central validation is the reference's statistical-expectation pattern
(ref: TraceAnalysisParser expectation checks, e.g.
examples/TestXML/TreePriors/testCoalescent.xml:127-129 — posterior mean
within 2 standard errors of an analytic oracle): sampling from the
constant coalescent PRIOR with the full tree-operator suite must
reproduce E[rootHeight] = theta * sum_{k=2..n} 2/(k(k-1)). A wrong
Hastings ratio in any tree operator shifts this mean.
"""

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
    TREE_HEIGHTS,
    DeltaExchangeOperator,
    NarrowExchangeOperator,
    RandomWalkOperator,
    RootHeightScaleOperator,
    ScaleOperator,
    UniformNodeHeightOperator,
    UpDownOperator,
    WideExchangeOperator,
    WilsonBaldingOperator,
)
from beast_mcmc_tpu.inference.trace import analyze
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.priors import lognormal_logpdf, one_on_x_logpdf
from beast_mcmc_tpu.models.sitemodel import single_rate
from beast_mcmc_tpu.models.substitution import hky_eigen
from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree

from fixtures import primate_patterns, primate_tree


def check_tree_valid(parent, children, heights, root, n_taxa):
    """Host-side structural sanity (the role of TreeModel's edit-transaction
    checks + the negative-branch assertion, TreeTraversal.java:119-121)."""
    parent = np.asarray(parent)
    children = np.asarray(children)
    heights = np.asarray(heights)
    m = parent.shape[0]
    root = int(root)
    assert parent[root] == -1
    # every non-root node's parent lists it as a child
    for i in range(m):
        if i == root:
            continue
        p = parent[i]
        assert p >= n_taxa, f"node {i} parent {p} is a tip"
        assert i in children[p], f"node {i} not a child of its parent {p}"
        assert heights[p] > heights[i], f"height inversion at {i}"
    # internal nodes have two distinct children that point back
    for i in range(n_taxa, m):
        c0, c1 = children[i]
        assert c0 != c1
        assert parent[c0] == i and parent[c1] == i
    # connectivity: walking up from every tip reaches the root
    for i in range(n_taxa):
        seen = 0
        j = i
        while j != root:
            j = parent[j]
            seen += 1
            assert seen <= m

def tree_op_suite():
    return [
        UniformNodeHeightOperator(weight=10.0),
        RootHeightScaleOperator(weight=3.0),
        NarrowExchangeOperator(weight=5.0),
        WideExchangeOperator(weight=3.0),
        WilsonBaldingOperator(weight=3.0),
    ]


@pytest.mark.parametrize("n_taxa", [4, 8])
def test_prior_sampling_root_height_expectation(n_taxa):
    """Sample the constant coalescent prior; E[rootHeight] must match
    theta * sum_{k=2..n} 2/(k(k-1)) within ~3 stderr."""
    theta = 1.0
    rng = np.random.default_rng(42)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n_taxa), pop_size=theta
    )
    tree = make_tree_state(parent, children, heights, root)

    def log_post(params, tree):
        return constant_coalescent_loglik(tree.heights, n_taxa, theta)

    ops = tree_op_suite()
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({}, tree, jax.random.PRNGKey(7), ops, log_post)

    def collector(s):
        return {"root_height": s.tree.heights[s.tree.root]}

    n_steps = 60_000
    (state, out) = jax.jit(
        lambda s: run_chain(step, s, n_steps, collect_every=10, collector=collector)
    )(state)

    rh = np.asarray(out["root_height"])[200:]  # burn-in
    stats = analyze(rh)
    expected = theta * sum(2.0 / (k * (k - 1)) for k in range(2, n_taxa + 1))
    assert stats.ess > 100, operator_report(ops, state)
    assert abs(stats.mean - expected) < 3.5 * stats.std_error_of_mean, (
        f"E[rootHeight]={stats.mean:.4f} expected {expected:.4f} "
        f"+/- {stats.std_error_of_mean:.4f}\n" + operator_report(ops, state)
    )
    # structural validity after tens of thousands of topology moves
    check_tree_valid(
        state.tree.parent, state.tree.children, state.tree.heights,
        state.tree.root, n_taxa,
    )


def test_prior_sampling_dated_tips_reference_oracle():
    """The reference's own serially-sampled oracle (ref: examples/TestXML/
    TreePriors/testCoalescent.xml:164-167 — 4 taxa, two tips at 5000 days,
    two at 0, Theta=10000; 'the expectation for 4 leaves with Theta=10000
    and tau=5000' is E[rootHeight] = 19344.2178)."""
    theta = 10000.0
    tip_heights = np.asarray([5000.0, 5000.0, 0.0, 0.0])
    n_taxa = 4
    rng = np.random.default_rng(11)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, tip_heights, pop_size=theta
    )
    tree = make_tree_state(parent, children, heights, root)

    def log_post(params, tree):
        return constant_coalescent_loglik(tree.heights, n_taxa, theta)

    ops = tree_op_suite()
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({}, tree, jax.random.PRNGKey(3), ops, log_post)

    def collector(s):
        return {"root_height": s.tree.heights[s.tree.root]}

    (state, out) = jax.jit(
        lambda s: run_chain(step, s, 80_000, collect_every=10,
                            collector=collector)
    )(state)
    rh = np.asarray(out["root_height"])[400:]
    stats = analyze(rh)
    expected = 19344.2178
    assert stats.ess > 100, operator_report(ops, state)
    assert abs(stats.mean - expected) < 3.5 * stats.std_error_of_mean, (
        f"E[rootHeight]={stats.mean:.1f} expected {expected} "
        f"+/- {stats.std_error_of_mean:.1f}\n" + operator_report(ops, state)
    )
    check_tree_valid(
        state.tree.parent, state.tree.children, state.tree.heights,
        state.tree.root, n_taxa,
    )


def test_posterior_strict_clock_end_to_end():
    """The minimal end-to-end slice (SURVEY.md §7.2 step 6): HKY + strict
    clock + constant coalescent on the primate data; short chain must mix,
    keep the tree valid, and improve the posterior."""
    pats = primate_patterns()
    parent, children, heights, root, taxa = primate_tree()
    n_taxa = len(taxa)
    tree = make_tree_state(parent, children, heights, root)
    tips = jnp.swapaxes(jnp.asarray(pats.tip_partials()), 1, 2)
    weights = jnp.asarray(pats.weights)
    freqs = jnp.asarray(pats.empirical_frequencies())
    rates, cat_weights = single_rate()

    def log_post(params, tree):
        eig = hky_eigen(params["kappa"], freqs)
        ll = tree_loglikelihood(
            tips, weights, tree.parent, tree.children, tree.heights,
            tree.root, eig, freqs, rates, cat_weights, params["clock.rate"],
        )
        prior = (
            lognormal_logpdf(params["kappa"], 1.0, 1.25)
            + one_on_x_logpdf(params["pop.size"])
            + constant_coalescent_loglik(tree.heights, n_taxa, params["pop.size"])
        )
        return ll + prior

    ops = [
        ScaleOperator(parameter="kappa", weight=1.0),
        ScaleOperator(parameter="pop.size", weight=3.0),
        UpDownOperator(up=("clock.rate",), down=(TREE_HEIGHTS,), weight=3.0),
        *tree_op_suite(),
    ]
    params = {
        "kappa": jnp.asarray(2.0),
        "pop.size": jnp.asarray(0.05),
        "clock.rate": jnp.asarray(1.0),
    }
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(params, tree, jax.random.PRNGKey(1), ops, log_post)
    lp0 = float(state.log_posterior)
    assert np.isfinite(lp0)

    def collector(s):
        return {
            "lp": s.log_posterior,
            "kappa": s.params["kappa"],
            "root_height": s.tree.heights[s.tree.root],
        }

    (state, out) = jax.jit(
        lambda s: run_chain(step, s, 4000, collect_every=10, collector=collector)
    )(state)

    assert np.isfinite(np.asarray(out["lp"])).all()
    assert float(state.log_posterior) > lp0  # moved uphill from a cold start
    # kappa should move towards its MLE (~30 on this data)
    assert float(state.params["kappa"]) > 5.0
    check_tree_valid(
        state.tree.parent, state.tree.children, state.tree.heights,
        state.tree.root, n_taxa,
    )
    # acceptance bookkeeping: all steps accounted for
    assert int(state.op_accept.sum() + state.op_reject.sum()) == 4000


def test_scale_operator_respects_bounds():
    ops = [ScaleOperator(parameter="x", weight=1.0, lower=0.5, upper=2.0)]

    def log_post(params, tree):
        return jnp.asarray(0.0)

    parent, children, heights, root = simulate_coalescent_tree(
        np.random.default_rng(0), np.zeros(3), 1.0
    )
    tree = make_tree_state(parent, children, heights, root)
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({"x": jnp.asarray(1.0)}, tree, jax.random.PRNGKey(0), ops, log_post)
    (state, _) = jax.jit(lambda s: run_chain(step, s, 2000))(state)
    assert 0.5 <= float(state.params["x"]) <= 2.0


def test_delta_exchange_preserves_sum():
    ops = [DeltaExchangeOperator(parameter="freqs", weight=1.0, delta=0.05)]

    def log_post(params, tree):
        return jnp.asarray(0.0)

    parent, children, heights, root = simulate_coalescent_tree(
        np.random.default_rng(0), np.zeros(3), 1.0
    )
    tree = make_tree_state(parent, children, heights, root)
    step = make_mcmc_step(log_post, ops)
    f0 = jnp.asarray([0.25, 0.25, 0.25, 0.25])
    state = init_mcmc_state({"freqs": f0}, tree, jax.random.PRNGKey(3), ops, log_post)
    (state, _) = jax.jit(lambda s: run_chain(step, s, 500))(state)
    np.testing.assert_allclose(float(state.params["freqs"].sum()), 1.0, atol=1e-12)
    assert (np.asarray(state.params["freqs"]) >= 0).all()


def test_adaptation_moves_towards_target():
    """Robbins-Monro should push a badly-tuned scale operator's acceptance
    towards 0.234 (ref: MarkovChain.java:559-590)."""
    ops = [ScaleOperator(parameter="x", weight=1.0, scale_factor=0.999)]

    def log_post(params, tree):
        return -0.5 * (params["x"] - 1.0) ** 2 * 1e4  # sharp target

    parent, children, heights, root = simulate_coalescent_tree(
        np.random.default_rng(0), np.zeros(3), 1.0
    )
    tree = make_tree_state(parent, children, heights, root)
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({"x": jnp.asarray(1.0)}, tree, jax.random.PRNGKey(5), ops, log_post)
    (state, _) = jax.jit(lambda s: run_chain(step, s, 6000))(state)
    acc_rate = float(state.op_accept[0]) / 6000.0
    assert 0.1 < acc_rate < 0.45, acc_rate
    # tuning moved away from 0.999 towards smaller scale factors
    assert float(ops[0].tuning(state.op_adapt[0])) < 0.99
