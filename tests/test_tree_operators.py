"""SPR-family tree operator tests (SubtreeSlide / SubtreeLeap / FNPR).

Two validation layers, mirroring the reference's operator test strategy
(ref: src/test/dr/evomodel/operators/ExchangeOperatorTest.java — proposal
correctness via sampled tree-space distributions):

1. structural validity after tens of thousands of moves;
2. the statistical-expectation oracle: sampling the constant-coalescent
   prior with ONLY the operator under test (plus height mixing) must
   reproduce E[rootHeight] = theta * sum 2/(k(k-1)) — any Hastings-ratio
   error in a prune-regraft move shifts this mean.
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
    RootHeightScaleOperator,
    UniformNodeHeightOperator,
)
from beast_mcmc_tpu.inference.tree_operators import (
    FNPROperator,
    SubtreeLeapOperator,
    SubtreeSlideOperator,
    intersecting_edges,
    sample_masked,
    subtree_mask,
)
from beast_mcmc_tpu.inference.trace import analyze
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree

from test_mcmc import check_tree_valid


def test_subtree_mask_and_intersections():
    # fixed 4-taxon tree: ((0,1)4,(2,3)5)6 with heights 1, 2, 3
    parent = jnp.asarray([4, 4, 5, 5, 6, 6, -1], jnp.int32)
    children = jnp.asarray(
        [[-1, -1]] * 4 + [[0, 1], [2, 3], [4, 5]], jnp.int32
    )
    heights = jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
    mask = np.asarray(subtree_mask(parent, 5))
    assert mask.tolist() == [False, False, True, True, False, True, False]
    mask_all = np.asarray(subtree_mask(parent, 6))
    assert mask_all.all()
    # edges spanning height 1.5: (6,4), (5,2), (5,3)
    em = np.asarray(
        intersecting_edges(parent, heights, jnp.asarray(subtree_mask(parent, 6)), 1.5)
    )
    assert em.tolist() == [False, False, True, True, True, False, False]
    # uniform sampling over the mask
    counts = np.zeros(7)
    for s in range(300):
        idx, c = sample_masked(jax.random.PRNGKey(s), jnp.asarray(em))
        assert int(c) == 3
        counts[int(idx)] += 1
    assert counts[[2, 3, 4]].min() > 60


@pytest.mark.parametrize(
    "op",
    [
        SubtreeSlideOperator(size=0.5, weight=5.0),
        SubtreeLeapOperator(size=0.5, weight=5.0),
        FNPROperator(weight=5.0),
    ],
    ids=["slide", "leap", "fnpr"],
)
@pytest.mark.parametrize("n_taxa", [5, 8])
def test_prior_expectation_single_operator(op, n_taxa):
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

    n_steps = 60_000
    (state, out) = jax.jit(
        lambda s: run_chain(step, s, n_steps, collect_every=10, collector=collector)
    )(state)
    rh = np.asarray(out["rh"])[300:]
    stats = analyze(rh)
    expected = theta * sum(2.0 / (k * (k - 1)) for k in range(2, n_taxa + 1))
    assert stats.ess > 80, operator_report(ops, state)
    assert abs(stats.mean - expected) < 4.0 * stats.std_error_of_mean, (
        f"E[rootHeight]={stats.mean:.4f} expected {expected:.4f} "
        f"+/- {stats.std_error_of_mean:.4f}\n" + operator_report(ops, state)
    )
    # topology must actually move (accepted topology proposals)
    assert int(state.op_accept[0]) > 100, operator_report(ops, state)
    check_tree_valid(
        state.tree.parent, state.tree.children, state.tree.heights,
        state.tree.root, n_taxa,
    )


def test_leap_dated_tips_validity():
    """Serially sampled tips (heterochronous) exercise the root-change and
    mirrored-descent paths of SubtreeLeap."""
    n_taxa = 6
    rng = np.random.default_rng(5)
    tip_h = np.array([0.0, 0.1, 0.4, 0.7, 1.0, 1.5])
    parent, children, heights, root = simulate_coalescent_tree(rng, tip_h, 1.0)
    tree = make_tree_state(parent, children, heights, root)

    def log_post(params, tree):
        return constant_coalescent_loglik(tree.heights, n_taxa, 1.0)

    ops = [SubtreeLeapOperator(size=1.0, weight=1.0)]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({}, tree, jax.random.PRNGKey(2), ops, log_post)
    state, _ = jax.jit(lambda s: run_chain(step, s, 20_000))(state)
    assert int(state.op_accept[0]) > 1000
    check_tree_valid(
        state.tree.parent, state.tree.children, state.tree.heights,
        state.tree.root, n_taxa,
    )
    # dated tips preserved
    np.testing.assert_allclose(np.asarray(state.tree.heights[:n_taxa]), tip_h)
