"""Multispecies coalescent, stochastic Dollo, latent liability tests."""

import itertools

import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.dollo import (
    stochastic_dollo_loglik,
    stochastic_dollo_site_likelihoods,
)
from beast_mcmc_tpu.models.liability import liability_consistency_loglik
from beast_mcmc_tpu.models.msc import multispecies_coalescent_loglik
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree


# ------------------------------------------------------------------ MSC


def test_msc_one_species_equals_constant_coalescent():
    rng = np.random.default_rng(0)
    n = 6
    gp, gc, gh, gr = simulate_coalescent_tree(rng, np.zeros(n), 0.7)
    got = float(multispecies_coalescent_loglik(
        jnp.asarray(gp), jnp.asarray(gc), jnp.asarray(gh),
        jnp.zeros(n, jnp.int32),
        sp_parent=jnp.asarray([-1], jnp.int32),
        sp_heights=jnp.asarray([0.0]),
        pop_sizes=jnp.asarray([0.7]),
    ))
    ref = float(constant_coalescent_loglik(jnp.asarray(gh), n, 0.7))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def numpy_msc_two_species(gh, gp, species, sp_split, n_a, n_b):
    """Brute-force 2-species MSC (species branches: A=[0,T), B=[0,T),
    root=[T,inf)) with pops (na, nb, nr)."""
    # lineage intervals: node v alive [h_v, h_parent)
    m = len(gp)

    def lineages_in(branch_lo, branch_hi, member):
        # event times inside
        events = sorted(
            set([branch_lo] + [h for h in gh if branch_lo < h < branch_hi]
                + ([branch_hi] if np.isfinite(branch_hi) else
                   [max(gh) + 1.0]))
        )
        out = 0.0
        for t0, t1 in zip(events[:-1], events[1:]):
            mid = 0.5 * (t0 + t1)
            k = sum(
                1 for v in range(m)
                if member[v] and gh[v] <= mid
                and (gp[v] < 0 or gh[gp[v]] > mid)
            )
            out += k * (k - 1) / 2 * (t1 - t0)
        return out

    return lineages_in


def test_msc_two_species_brute_force():
    # hand-built gene tree on 4 tips: species A = {0,1}, B = {2,3}
    # heights: tips 0; coal(0,1)=0.3 (in A), coal(2,3)=0.5 (in B),
    # root joins at 2.0 (in root branch); species split T = 1.0
    gp = np.array([4, 4, 5, 5, 6, 6, -1])
    gc = np.array([[-1, -1]] * 4 + [[0, 1], [2, 3], [4, 5]])
    gh = np.array([0.0, 0.0, 0.0, 0.0, 0.3, 0.5, 2.0])
    species = np.array([0, 0, 1, 1])
    # species tree: tips A=0,B=1 at height 0, root=2 at height 1.0
    sp_parent = np.array([2, 2, -1])
    sp_heights = np.array([0.0, 0.0, 1.0])
    pops = np.array([0.5, 0.8, 1.5])

    got = float(multispecies_coalescent_loglik(
        jnp.asarray(gp), jnp.asarray(gc), jnp.asarray(gh),
        jnp.asarray(species), jnp.asarray(sp_parent),
        jnp.asarray(sp_heights), jnp.asarray(pops),
    ))
    # brute force:
    # branch A [0,1): lineages {0,1} until 0.3, then {4}: integral
    #   [0,0.3): k=2 -> 1*0.3 ; [0.3,1): k=1 -> 0
    # events in A: coal at 0.3 -> -log 0.5
    # branch B [0,1): k=2 on [0,0.5) -> 0.5 ; coal at 0.5 -> -log 0.8
    # root [1,inf): lineages {4,5} until 2.0: k=2 on [1,2) -> 1.0
    #   coal at 2.0 -> -log 1.5
    expected = (
        -(1 * 0.3) / 0.5 - np.log(0.5)
        - (1 * 0.5) / 0.8 - np.log(0.8)
        - (1 * 1.0) / 1.5 - np.log(1.5)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_msc_incompatible_returns_neg_inf():
    # cross-species coalescence BELOW the species divergence:
    # node 4 = coal(tip0 in A, tip2 in B) at height 0.3 < split 1.0
    gp = np.array([4, 5, 4, 5, 6, 6, -1])
    gh = np.array([0.0, 0.0, 0.0, 0.0, 0.3, 0.5, 2.0])
    gc = np.array([[-1, -1]] * 4 + [[0, 2], [1, 3], [4, 5]])
    species = np.array([0, 0, 1, 1])
    sp_parent = np.array([2, 2, -1])
    sp_heights = np.array([0.0, 0.0, 1.0])
    got = float(multispecies_coalescent_loglik(
        jnp.asarray(gp), jnp.asarray(gc), jnp.asarray(gh),
        jnp.asarray(species), jnp.asarray(sp_parent),
        jnp.asarray(sp_heights), jnp.ones(3),
    ))
    assert got == -np.inf


# ------------------------------------------------------------------ Dollo


def dollo_tree():
    # ((0:1,1:1)3:1,2:2)4
    parent = jnp.asarray([3, 3, 4, 4, -1], jnp.int32)
    children = jnp.asarray([[-1, -1]] * 3 + [[0, 1], [3, 2]], jnp.int32)
    heights = jnp.asarray([0.0, 0.0, 0.0, 1.0, 2.0])
    return parent, children, heights


def test_dollo_pattern_sum_equals_total_weight():
    """Summing the per-pattern likelihood over ALL 2^N patterns must give
    the total origin weight (a gain happened somewhere, all outcomes
    partition the space)."""
    parent, children, heights = dollo_tree()
    delta = 0.7
    pats = np.array(list(itertools.product([0, 1], repeat=3))).T  # [3, 8]
    liks = np.asarray(stochastic_dollo_site_likelihoods(
        jnp.asarray(pats), parent, children, heights, delta
    ))
    bl = np.array([1.0, 1.0, 2.0, 1.0, 0.0])
    total_w = np.sum((1 - np.exp(-delta * bl[:4])) / delta) + 1.0 / delta
    np.testing.assert_allclose(liks.sum(), total_w, rtol=1e-9)


def test_dollo_single_tip_pattern_brute_force():
    """P(present only at tip 2): origins on branch above 2 or above-root
    with survival only down to tip 2 and loss on the other side."""
    parent, children, heights = dollo_tree()
    delta = 0.7
    e = np.exp
    # origin on branch above tip 2 (length 2): integral over gain point s
    # (time above the tip) of e^{-delta s} ds = (1-e^{-2 delta})/delta
    w2 = (1 - e(-2 * delta)) / delta
    # origin above the root (weight 1/delta): survive root->2 (e^{-2d}),
    # die on the other side before reaching tips 0 AND 1:
    # from root, branch to node 3 (t=1): either dies on it (1-e^{-d}),
    # or survives (e^{-d}) and dies on both tip branches (1-e^{-d})^2
    die_left = (1 - e(-delta)) + e(-delta) * (1 - e(-delta)) ** 2
    via_root = (1.0 / delta) * e(-2 * delta) * die_left
    expected = w2 + via_root
    lik = float(stochastic_dollo_site_likelihoods(
        jnp.asarray([[0], [0], [1]]), parent, children, heights, delta
    )[0])
    np.testing.assert_allclose(lik, expected, rtol=1e-9)


def test_dollo_conditioned_loglik_finite_and_gradient():
    import jax

    parent, children, heights = dollo_tree()
    pats = jnp.asarray([[1, 0], [1, 0], [0, 1]])
    f = lambda d: stochastic_dollo_loglik(
        pats, parent, children, heights, d, gain_rate=0.3
    )
    v = float(f(0.7))
    g = float(jax.grad(f)(0.7))
    assert np.isfinite(v) and np.isfinite(g)
    # conditioning makes the gain rate drop out entirely (it scales both
    # the site likelihood and P(observable) linearly)... it does not: the
    # all-absent term breaks proportionality; but likelihood must change
    # smoothly with delta
    assert abs(float(f(0.9)) - v) > 1e-6


# -------------------------------------------------------------- liability


def test_liability_consistency():
    latent = jnp.asarray([[-0.5, 2.0], [0.3, 0.1]])
    thresholds = jnp.asarray([[0.0], [1.0]])  # binary per dim
    data_ok = jnp.asarray([[0, 1], [1, 0]])
    data_bad = jnp.asarray([[1, 1], [1, 0]])
    assert float(liability_consistency_loglik(latent, data_ok, thresholds)) == 0.0
    assert float(liability_consistency_loglik(latent, data_bad, thresholds)) == -np.inf
    # smooth mode penalizes violations quadratically
    v = float(liability_consistency_loglik(
        latent, data_bad, thresholds, smooth=0.1))
    assert v < 0 and np.isfinite(v)
