"""ARG (ancestral recombination graph): marginal-genealogy likelihoods via
dummy-child peeling, coalescent-with-recombination prior, ARG operators
(ref: src/dr/evomodel/arg/ARGModel.java, likelihood/ARGLikelihood.java,
coalescent/ARGCoalescentLikelihood.java:220-253)."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.arg import (
    ARGState,
    arg_coalescent_loglik,
    arg_from_tree,
    arg_loglikelihood,
    arg_partition_site_loglik,
    effective_parent,
    partition_flip_move,
    reassort_height_move,
)
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.substitution import hky_eigen
from beast_mcmc_tpu.ops.eigen import transition_probs
from beast_mcmc_tpu.ops.peeling import (
    peel_order_from_heights,
    peel_site_loglik,
)
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree

FREQS = jnp.asarray([0.3, 0.25, 0.2, 0.25])
EIG = hky_eigen(2.5, FREQS)
CATW = jnp.asarray([1.0])


def _transition_fn(t):
    return transition_probs(EIG, t)[:, None, :, :]  # [M,1,S,S]


def _tip_partials(rng, n, npat):
    states = rng.integers(0, 4, (n, npat))
    tp = np.zeros((n, 4, npat))
    for i in range(n):
        tp[i, states[i], np.arange(npat)] = 1.0
    return jnp.asarray(tp)


def _tree_site_loglik(parent, children, heights, root, tips):
    m = len(parent)
    n = tips.shape[0]
    pidx = np.maximum(parent, 0)
    t = np.where(parent >= 0, heights[pidx] - heights, 0.0)
    p = _transition_fn(jnp.asarray(t))
    order = peel_order_from_heights(jnp.asarray(heights), n)
    return peel_site_loglik(tips, jnp.asarray(children, jnp.int32), order,
                            jnp.asarray(root, jnp.int32), p, FREQS, CATW)


def test_arg_without_reassortment_equals_tree():
    rng = np.random.default_rng(0)
    n = 7
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n), 1.0)
    tips = _tip_partials(rng, n, 12)
    arg = arg_from_tree(jnp.asarray(parent), jnp.asarray(children),
                        jnp.asarray(heights), root, n_partitions=2,
                        max_reassort=3)
    want = np.asarray(_tree_site_loglik(parent, children, heights, root, tips))
    for p in range(2):
        got = np.asarray(arg_partition_site_loglik(
            arg, p, tips, _transition_fn, FREQS, CATW))
        np.testing.assert_allclose(got, want, rtol=1e-9)


def _manual_one_event_arg():
    """3 taxa; reassortment node 5 above tip 0 at h=.5; its right parent is
    a new coalescent node 6 at h=1.5 spliced into the old 3->4 edge."""
    m = 7
    parent_left = jnp.asarray([5, 3, 4, 6, -1, 3, 4], jnp.int32)
    parent_right = jnp.asarray([5, 3, 4, 6, -1, 6, 4], jnp.int32)
    children = jnp.asarray(
        [[-1, -1], [-1, -1], [-1, -1], [5, 1], [6, 2], [0, -1], [3, 5]],
        jnp.int32)
    heights = jnp.asarray([0.0, 0.0, 0.0, 1.0, 2.0, 0.5, 1.5])
    side = jnp.zeros((m, 2), bool).at[5, 1].set(True)  # partition 1 -> right
    return ARGState(
        parent_left=parent_left, parent_right=parent_right,
        children=children, heights=heights, side=side,
        is_reassort=jnp.zeros((m,), bool).at[5].set(True),
        active=jnp.ones((m,), bool),
        root=jnp.asarray(4, jnp.int32),
    )


def test_arg_marginal_trees_match_hand_built():
    rng = np.random.default_rng(1)
    tips = _tip_partials(rng, 3, 16)
    arg = _manual_one_event_arg()

    # partition 0 marginal tree: ((0,1)@1, 2)@2
    tree_a = _tree_site_loglik(
        np.asarray([3, 3, 4, 4, -1]),
        np.asarray([[-1, -1], [-1, -1], [-1, -1], [0, 1], [3, 2]]),
        np.asarray([0.0, 0.0, 0.0, 1.0, 2.0]), 4, tips)
    got_a = arg_partition_site_loglik(arg, 0, tips, _transition_fn, FREQS,
                                      CATW)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(tree_a),
                               rtol=1e-9)

    # partition 1 marginal tree: ((0,1)@1.5, 2)@2
    tree_b = _tree_site_loglik(
        np.asarray([3, 3, 4, 4, -1]),
        np.asarray([[-1, -1], [-1, -1], [-1, -1], [0, 1], [3, 2]]),
        np.asarray([0.0, 0.0, 0.0, 1.5, 2.0]), 4, tips)
    got_b = arg_partition_site_loglik(arg, 1, tips, _transition_fn, FREQS,
                                      CATW)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(tree_b),
                               rtol=1e-9)
    assert np.abs(np.asarray(got_a) - np.asarray(got_b)).max() > 1e-6

    # total over partitions
    w = jnp.ones((16,))
    tot = arg_loglikelihood(arg, [tips, tips], [w, w], _transition_fn,
                            FREQS, CATW)
    np.testing.assert_allclose(
        float(tot), float(jnp.dot(w, got_a) + jnp.dot(w, got_b)), rtol=1e-10)


def test_effective_parent_routing():
    arg = _manual_one_event_arg()
    ep0 = np.asarray(effective_parent(arg, 0))
    ep1 = np.asarray(effective_parent(arg, 1))
    assert ep0[5] == 3 and ep1[5] == 6
    assert ep0[0] == 5 and ep1[0] == 5  # tip routing unchanged


def test_arg_coalescent_prior_reduces_to_kingman():
    rng = np.random.default_rng(2)
    n = 6
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n), 1.0)
    arg = arg_from_tree(jnp.asarray(parent), jnp.asarray(children),
                        jnp.asarray(heights), root, 1, 2)
    theta = 1.7
    got = float(arg_coalescent_loglik(arg, n, theta, 0.0))
    want = float(constant_coalescent_loglik(jnp.asarray(heights), n, theta))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_arg_coalescent_prior_manual_oracle():
    arg = _manual_one_event_arg()
    theta, rho = 2.0, 0.8
    got = float(arg_coalescent_loglik(arg, 3, theta, rho))
    # events backward: k=3 from t=0; reassort @.5 (k->4); coal @1 (k->3);
    # coal @1.5 (k->2); coal @2 (k->1)
    ll = 0.0
    k = 3
    times = [(0.5, "r"), (1.0, "c"), (1.5, "c"), (2.0, "c")]
    t_prev = 0.0
    for t, ty in times:
        rate = k * (k - 1 + rho) / (2 * theta)
        ll += -rate * (t - t_prev) + np.log(rate)
        if ty == "c":
            ll += np.log((k - 1) / (k - 1 + rho)) - np.log(k * (k - 1) / 2)
            k -= 1
        else:
            ll += np.log(rho / (k - 1 + rho)) - np.log(k)
            k += 1
        t_prev = t
    np.testing.assert_allclose(got, ll, rtol=1e-10)


def test_arg_operators():
    arg = _manual_one_event_arg()
    key = jax.random.PRNGKey(0)
    # height move stays inside (child, min parents) = (0, min(1, 1.5))
    hs = []
    for i in range(200):
        new, logh = reassort_height_move(arg, jax.random.fold_in(key, i),
                                         window=0.4)
        if np.isfinite(float(logh)):
            h = float(new.heights[5])
            assert 0.0 < h < 1.0
            hs.append(h)
    assert len(hs) > 100

    # flip move toggles exactly one routing bit
    new, logh = partition_flip_move(arg, key)
    assert float(logh) == 0.0
    diff = np.asarray(new.side) != np.asarray(arg.side)
    assert diff.sum() == 1 and diff[5].any()

    # no reassortment -> both moves reject
    rng = np.random.default_rng(3)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(4), 1.0)
    plain = arg_from_tree(jnp.asarray(parent), jnp.asarray(children),
                          jnp.asarray(heights), root, 1, 1)
    _, lh = reassort_height_move(plain, key, 0.1)
    assert float(lh) == -np.inf
    _, lh2 = partition_flip_move(plain, key)
    assert float(lh2) == -np.inf
