"""Golden likelihood oracles.

Expected logL constants are the reference's published test oracles for the
6-taxon primate alignment + fixed tree (ref: src/test/dr/evomodel/
treelikelihood/LikelihoodTest.java:106-253; SURVEY.md Appendix B). The
reference asserts at 5 decimal places; we assert within 2e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.models.sitemodel import (
    discrete_gamma_rates,
    invariant_only_rates,
    single_rate,
)
from beast_mcmc_tpu.models.substitution import gtr_eigen, hky_eigen, jc_eigen
from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
from beast_mcmc_tpu.ops.eigen import transition_probs

from fixtures import primate_patterns, primate_tree


@pytest.fixture(scope="module")
def setup():
    pats = primate_patterns()
    parent, children, heights, root, taxa = primate_tree()
    tip_partials = jnp.asarray(pats.tip_partials())
    # transpose to [N, S, P]
    tip_partials = jnp.swapaxes(tip_partials, 1, 2)
    return {
        "pats": pats,
        "tips": tip_partials,
        "weights": jnp.asarray(pats.weights),
        "parent": jnp.asarray(parent),
        "children": jnp.asarray(children),
        "heights": jnp.asarray(heights),
        "root": jnp.asarray(root),
        "freqs_emp": jnp.asarray(pats.empirical_frequencies()),
    }


def _loglik(st, eig, freqs, rates, weights):
    return tree_loglikelihood(
        st["tips"], st["weights"], st["parent"], st["children"],
        st["heights"], st["root"], eig, freqs, rates, weights,
        branch_rates=1.0,
    )


def test_jc69(setup):
    rates, weights = single_rate()
    ll = _loglik(setup, jc_eigen(), jnp.full(4, 0.25), rates, weights)
    np.testing.assert_allclose(float(ll), -1992.20564, atol=2e-5)


def test_k80(setup):
    freqs = jnp.full(4, 0.25)
    rates, weights = single_rate()
    ll = _loglik(setup, hky_eigen(27.402591, freqs), freqs, rates, weights)
    np.testing.assert_allclose(float(ll), -1856.30305, atol=2e-5)


def test_hky85(setup):
    freqs = setup["freqs_emp"]
    rates, weights = single_rate()
    ll = _loglik(setup, hky_eigen(29.739445, freqs), freqs, rates, weights)
    np.testing.assert_allclose(float(ll), -1825.21317, atol=2e-5)


def test_hky85_gamma(setup):
    freqs = setup["freqs_emp"]
    rates, weights = discrete_gamma_rates(0.137064, 4)
    ll = _loglik(setup, hky_eigen(38.829740, freqs), freqs, rates, weights)
    np.testing.assert_allclose(float(ll), -1789.75936, atol=2e-5)


def test_hky85_invariant(setup):
    freqs = setup["freqs_emp"]
    rates, weights = invariant_only_rates(0.701211)
    ll = _loglik(setup, hky_eigen(38.564672, freqs), freqs, rates, weights)
    np.testing.assert_allclose(float(ll), -1789.91240, atol=2e-5)


def test_hky85_gamma_invariant(setup):
    freqs = setup["freqs_emp"]
    rates, weights = discrete_gamma_rates(0.587649, 4, p_invariant=0.486548)
    ll = _loglik(setup, hky_eigen(39.464538, freqs), freqs, rates, weights)
    np.testing.assert_allclose(float(ll), -1789.63923, atol=2e-5)


def test_gtr(setup):
    freqs = setup["freqs_emp"]
    rates, weights = single_rate()
    eig = gtr_eigen(jnp.ones(6), freqs)
    ll = _loglik(setup, eig, freqs, rates, weights)
    np.testing.assert_allclose(float(ll), -1969.14584, atol=2e-5)


def test_gtr_invariant(setup):
    freqs = setup["freqs_emp"]
    rates, weights = invariant_only_rates(0.5)
    eig = gtr_eigen(jnp.ones(6), freqs)
    ll = _loglik(setup, eig, freqs, rates, weights)
    np.testing.assert_allclose(float(ll), -1948.84175, atol=2e-5)


def test_transition_probs_rows_sum_to_one(setup):
    eig = hky_eigen(5.0, setup["freqs_emp"])
    p = transition_probs(eig, jnp.array([0.0, 0.01, 0.1, 1000.0]))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-10)
    np.testing.assert_allclose(p[0], jnp.eye(4), atol=1e-10)
    # stationarity at long times
    np.testing.assert_allclose(p[-1], jnp.broadcast_to(setup["freqs_emp"], (4, 4)), atol=1e-6)


def test_gradient_matches_finite_difference(setup):
    """The custom pre-order VJP must agree with finite differences of the
    full likelihood wrt node heights (the O(N) gradient surface used by
    HMC, ref: discrete/NodeHeightGradientForDiscreteTrait)."""
    freqs = setup["freqs_emp"]
    rates, weights = discrete_gamma_rates(0.5, 4)
    eig = hky_eigen(10.0, freqs)

    def ll(heights):
        return tree_loglikelihood(
            setup["tips"], setup["weights"], setup["parent"],
            setup["children"], heights, setup["root"], eig, freqs,
            rates, weights, branch_rates=1.0,
        )

    h0 = setup["heights"]
    g = jax.grad(ll)(h0)
    eps = 1e-6
    for i in [6, 8, 10]:  # internal nodes
        hp = h0.at[i].add(eps)
        hm = h0.at[i].add(-eps)
        fd = (ll(hp) - ll(hm)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-4)


def test_gradient_wrt_kappa(setup):
    freqs = setup["freqs_emp"]
    rates, weights = single_rate()

    def ll(kappa):
        return tree_loglikelihood(
            setup["tips"], setup["weights"], setup["parent"],
            setup["children"], setup["heights"], setup["root"],
            hky_eigen(kappa, freqs), freqs, rates, weights, branch_rates=1.0,
        )

    g = jax.grad(ll)(10.0)
    fd = (ll(10.0 + 1e-5) - ll(10.0 - 1e-5)) / 2e-5
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_jit_and_vmap(setup):
    """The likelihood jits and vmaps over a batch of height vectors
    (multi-chain support)."""
    freqs = setup["freqs_emp"]
    rates, weights = single_rate()
    eig = hky_eigen(29.739445, freqs)

    @jax.jit
    def ll(heights):
        return tree_loglikelihood(
            setup["tips"], setup["weights"], setup["parent"],
            setup["children"], heights, setup["root"], eig, freqs,
            rates, weights, branch_rates=1.0,
        )

    batch = jnp.stack([setup["heights"], setup["heights"] * 1.1])
    lls = jax.vmap(ll)(batch)
    np.testing.assert_allclose(float(lls[0]), -1825.21317, atol=2e-5)
    assert lls[1] != lls[0]
