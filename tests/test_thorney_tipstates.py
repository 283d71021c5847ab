"""Thorney Poisson branch-length likelihood, tip error models, free rates."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.sitemodel import free_rates, single_rate
from beast_mcmc_tpu.models.substitution import hky_eigen
from beast_mcmc_tpu.models.thorney import (
    mutation_counts_from_branch_lengths,
    poisson_branch_length_loglik,
)
from beast_mcmc_tpu.models.tipstates import (
    hypermutant_error_partials,
    sequence_error_partials,
)
from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree

from fixtures import primate_patterns, primate_tree


def test_thorney_matches_scipy_poisson():
    from math import lgamma, log

    rng = np.random.default_rng(0)
    n = 10
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n), 1.0
    )
    m = len(parent)
    muts = rng.poisson(5.0, m).astype(float)
    rate, scale = 0.8, 100.0
    got = float(poisson_branch_length_loglik(
        jnp.asarray(muts), jnp.asarray(parent), jnp.asarray(heights),
        rate, scale,
    ))
    ref = 0.0
    for i in range(m):
        if parent[i] < 0:
            continue
        mean = (heights[parent[i]] - heights[i]) * rate * scale
        k = muts[i]
        ref += k * log(mean) - mean - lgamma(k + 1)
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_thorney_gradient_and_mle():
    """The rate MLE given counts k_b and times t_b is sum k / (scale sum t)
    — gradient must vanish there."""
    rng = np.random.default_rng(1)
    n = 20
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n), 1.0
    )
    m = len(parent)
    muts = rng.poisson(8.0, m).astype(float)
    muts[root] = 0.0
    bl = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0)
    scale = 50.0
    mle = muts[np.arange(m) != root].sum() / (scale * bl.sum())
    g = jax.grad(
        lambda r: poisson_branch_length_loglik(
            jnp.asarray(muts), jnp.asarray(parent), jnp.asarray(heights),
            r, scale,
        )
    )(mle)
    np.testing.assert_allclose(float(g), 0.0, atol=1e-6)
    counts = mutation_counts_from_branch_lengths(jnp.asarray([0.012]), 1000)
    assert float(counts[0]) == 12.0


def test_sequence_error_zero_rate_is_exact_tips():
    states = jnp.asarray([[0, 1, 2, 3, 5]])
    p = np.asarray(sequence_error_partials(states, 0.0))
    np.testing.assert_allclose(p[0, :, 0], [1, 0, 0, 0])
    np.testing.assert_allclose(p[0, :, 3], [0, 0, 0, 1])
    np.testing.assert_allclose(p[0, :, 4], [1, 1, 1, 1])  # ambiguity


def test_sequence_error_all_substitutions_table():
    states = jnp.asarray([[2]])  # G observed
    p = np.asarray(sequence_error_partials(states, 0.3))
    # G row: pU at G, ts partner A gets (1-pU)/3, C/T same (ALL_SUBS)
    np.testing.assert_allclose(p[0, :, 0], [0.1, 0.1, 0.7, 0.1])
    p2 = np.asarray(sequence_error_partials(states, 0.3, transitions_only=True))
    np.testing.assert_allclose(p2[0, :, 0], [0.3, 0.0, 0.7, 0.0])


def test_sequence_error_age_related():
    states = jnp.asarray([[0], [0]])
    ages = jnp.asarray([0.0, 2.0])
    p = np.asarray(sequence_error_partials(
        states, 0.0, age_related_rate=0.5, tip_ages=ages
    ))
    np.testing.assert_allclose(p[0, 0, 0], 1.0)
    np.testing.assert_allclose(p[1, 0, 0], np.exp(-1.0))


def test_sequence_error_likelihood_effect():
    """Error model changes the tree likelihood smoothly; rate 0 == exact."""
    pats = primate_patterns()
    parent, children, heights, root, taxa = primate_tree()
    states = jnp.asarray(pats.tip_states_unambiguous())  # [N, P] int
    weights = jnp.asarray(pats.weights)
    freqs = jnp.asarray(pats.empirical_frequencies())
    cr, cw = single_rate()
    eig = hky_eigen(jnp.asarray(2.0), freqs)

    def ll(err):
        tips = sequence_error_partials(states, err)
        return tree_loglikelihood(
            tips, weights, jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), root, eig, freqs, cr, cw, 1.0,
        )

    exact_tips = jnp.swapaxes(jnp.asarray(pats.tip_partials()), 1, 2)
    base = float(tree_loglikelihood(
        exact_tips, weights, jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, eig, freqs, cr, cw, 1.0,
    ))
    np.testing.assert_allclose(float(ll(0.0)), base, rtol=1e-9)
    assert float(ll(0.01)) != base
    g = jax.grad(lambda e: ll(e))(0.01)
    assert np.isfinite(float(g))


def test_hypermutant_partials():
    states = jnp.asarray([[0, 0, 2]])
    ctx = jnp.asarray([[True, False, True]])
    p_on = np.asarray(hypermutant_error_partials(
        states, ctx, jnp.asarray([True]), 0.4
    ))
    np.testing.assert_allclose(p_on[0, :, 0], [0.6, 0, 0.4, 0])  # context A
    np.testing.assert_allclose(p_on[0, :, 1], [1, 0, 0, 0])  # plain A
    np.testing.assert_allclose(p_on[0, :, 2], [0, 0, 1, 0])  # G untouched
    p_off = np.asarray(hypermutant_error_partials(
        states, ctx, jnp.asarray([False]), 0.4
    ))
    np.testing.assert_allclose(p_off[0, :, 0], [1, 0, 0, 0])


def test_free_rates_normalization():
    r, w = free_rates(jnp.asarray([0.2, 1.0, 4.0]), jnp.asarray([2.0, 1.0, 1.0]))
    np.testing.assert_allclose(float(jnp.sum(r * w)), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-12)
