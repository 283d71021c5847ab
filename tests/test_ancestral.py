"""Ancestral reconstruction, Markov jumps, and simulator tests with
analytic / round-trip oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.apps.seqgen import simulate_alignment
from beast_mcmc_tpu.data.alignment import SitePatterns
from beast_mcmc_tpu.models.sitemodel import single_rate
from beast_mcmc_tpu.models.substitution import hky_eigen, jc_eigen
from beast_mcmc_tpu.models.treelikelihood import branch_transition_matrices, tree_loglikelihood
from beast_mcmc_tpu.ops.ancestral import sample_ancestral_states
from beast_mcmc_tpu.ops.eigen import normalized_q, transition_probs
from beast_mcmc_tpu.ops.markov_jumps import (
    expected_jumps,
    expected_reward,
    joint_jump_matrix,
)
from beast_mcmc_tpu.ops.peeling import peel_order_from_heights
from beast_mcmc_tpu.tree.topology import parse_newick

from fixtures import PRIMATE_NEWICK, PRIMATE_TAXA, primate_patterns


def test_expected_jumps_total_vs_unconditional():
    """Unconditional expected total jumps: sum_ab pi_a J_ab = mean rate * t
    (Q normalized to mean rate 1). Checks the spectral integral."""
    freqs = jnp.asarray([0.3, 0.2, 0.2, 0.3])
    eig = hky_eigen(5.0, freqs)
    q = jnp.einsum("ij,j,jk->ik", eig.U, eig.values, eig.U_inv)
    label = 1.0 - jnp.eye(4)
    for t in [0.05, 0.5, 2.0]:
        j = joint_jump_matrix(eig, q, label, t)
        total = float(jnp.einsum("a,ab->", freqs, j))
        np.testing.assert_allclose(total, t, rtol=1e-8)


def test_expected_jumps_two_state_monte_carlo():
    """2-state chain: conditional expected jumps vs direct simulation."""
    rng = np.random.default_rng(0)
    freqs = jnp.asarray([0.5, 0.5])
    from beast_mcmc_tpu.ops.eigen import reversible_eigen

    eig = reversible_eigen(jnp.ones((2, 2)), freqs)
    q = np.array([[-1.0, 1.0], [1.0, -1.0]])  # normalized symmetric chain
    t = 1.2
    p = np.asarray(transition_probs(eig, jnp.asarray(t)))
    label = jnp.asarray(1.0 - np.eye(2))
    e = np.asarray(expected_jumps(eig, jnp.asarray(q), label, t, jnp.asarray(p)))

    # simulate: jump times of a rate-1 alternating chain
    n = 200_000
    counts = {(0, 0): [], (0, 1): []}
    for _ in range(n):
        s, time, k = 0, 0.0, 0
        while True:
            time += rng.exponential(1.0)
            if time > t:
                break
            s = 1 - s
            k += 1
        if (0, s) in counts:
            counts[(0, s)].append(k)
    mc00 = np.mean(counts[(0, 0)])
    mc01 = np.mean(counts[(0, 1)])
    np.testing.assert_allclose(e[0, 0], mc00, rtol=0.02)
    np.testing.assert_allclose(e[0, 1], mc01, rtol=0.02)


def test_expected_reward_sums_to_t():
    freqs = jnp.asarray([0.3, 0.2, 0.2, 0.3])
    eig = hky_eigen(3.0, freqs)
    t = 0.7
    p = transition_probs(eig, jnp.asarray(t))
    r = expected_reward(eig, jnp.ones(4), t, p)
    # total dwell time over all states = t regardless of endpoints
    np.testing.assert_allclose(np.asarray(r), t, rtol=1e-7)


def test_ancestral_states_match_data_at_tips():
    pats = primate_patterns()
    parent, children, heights, root, taxa = parse_newick(
        PRIMATE_NEWICK, taxa=PRIMATE_TAXA)
    tips = jnp.swapaxes(jnp.asarray(pats.tip_partials()), 1, 2)
    freqs = jnp.asarray(pats.empirical_frequencies())
    eig = hky_eigen(20.0, freqs)
    rates, cat_w = single_rate()
    p_mats = branch_transition_matrices(
        eig, jnp.asarray(parent), jnp.asarray(heights), 1.0, rates)
    order = peel_order_from_heights(jnp.asarray(heights), 6)
    states, cats, site_logl = sample_ancestral_states(
        tips, jnp.asarray(children), order, root, p_mats, freqs, cat_w,
        jax.random.PRNGKey(0))
    assert states.shape == (11, pats.n_patterns)
    assert (np.asarray(states) >= 0).all() and (np.asarray(states) < 4).all()
    # unambiguous tips must reproduce the observed states
    obs = np.asarray(pats.states)
    unamb = obs < 4
    np.testing.assert_array_equal(np.asarray(states[:6])[unamb], obs[unamb])


def test_simulator_roundtrip_likelihood():
    """Simulate a big alignment on a fixed tree; the empirical base
    frequencies approach the model's stationary distribution."""
    parent, children, heights, root, taxa = parse_newick(
        PRIMATE_NEWICK, taxa=PRIMATE_TAXA)
    freqs = jnp.asarray([0.35, 0.15, 0.2, 0.3])
    eig = hky_eigen(8.0, freqs)
    rates, cat_w = single_rate()
    aln = simulate_alignment(
        jax.random.PRNGKey(1), taxa, parent, children, heights, root,
        eig, freqs, rates, cat_w, 1.0, n_sites=20000)
    assert aln.n_taxa == 6 and aln.n_sites == 20000
    counts = np.bincount(aln.states.reshape(-1), minlength=4)
    emp = counts / counts.sum()
    np.testing.assert_allclose(emp, np.asarray(freqs), atol=0.01)
    # and the inferred likelihood at the truth beats a wrong kappa
    pats = SitePatterns.from_alignment(aln)
    tips = jnp.swapaxes(jnp.asarray(pats.tip_partials()), 1, 2)
    w = jnp.asarray(pats.weights)

    def ll(kappa):
        return float(tree_loglikelihood(
            tips, w, jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), root, hky_eigen(kappa, freqs), freqs,
            rates, cat_w, 1.0))

    assert ll(8.0) > ll(2.0) and ll(8.0) > ll(30.0)
