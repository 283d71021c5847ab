"""Bayesian skyline, SIR coalescent, serially-sampled birth-death tests.

Oracles: the reference's own pinned values (BirthDeathSSLikelihoodTest
-19.0198), limiting-case equalities (skyline with one shared N == constant
coalescent; SIR in the early-epidemic limit == exponential growth), and a
brute-force numpy skyline.
"""

import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.coalescent import (
    bayesian_skyline_loglik,
    constant_coalescent_loglik,
    exponential_growth_loglik,
    sir_coalescent_loglik,
)
from beast_mcmc_tpu.models.speciation import (
    bdss_p0,
    serial_birth_death_loglik,
)
from beast_mcmc_tpu.tree.topology import parse_newick, simulate_coalescent_tree


def test_skyline_reduces_to_constant():
    rng = np.random.default_rng(1)
    n = 8
    _, _, heights, _ = simulate_coalescent_tree(rng, np.zeros(n), 1.0)
    h = jnp.asarray(heights)
    ref = constant_coalescent_loglik(h, n, 2.5)
    got = bayesian_skyline_loglik(
        h, n, jnp.full(3, 2.5), jnp.asarray([2, 3, 2])
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-10)


def test_skyline_two_groups_brute_force():
    # 4 contemporaneous taxa, internal heights 1.0, 2.0, 3.5
    n = 4
    heights = jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.5])
    pop = np.array([0.7, 2.0])
    groups = np.array([1, 2])  # event 0 -> N1; events 1,2 -> N2
    got = float(bayesian_skyline_loglik(heights, n, jnp.asarray(pop), jnp.asarray(groups)))
    # brute force: intervals (0,1): k=4, N=0.7 ; (1,2): k=3, N=2.0 ;
    # (2,3.5): k=2, N=2.0 ; events at 1 (N1), 2 (N2), 3.5 (N2)
    expected = (
        -6 * 1.0 / 0.7 - np.log(0.7)
        - 3 * 1.0 / 2.0 - np.log(2.0)
        - 1 * 1.5 / 2.0 - np.log(2.0)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_skyline_serial_samples_brute_force():
    # dated tips: 2 at 0, 1 at 0.5; coalescences at 1.0 and 2.0
    n = 3
    heights = jnp.asarray([0.0, 0.0, 0.5, 1.0, 2.0])
    pop = np.array([1.5, 3.0])
    groups = np.array([1, 1])
    got = float(bayesian_skyline_loglik(heights, n, jnp.asarray(pop), jnp.asarray(groups)))
    # intervals: (0,0.5) k=2 N=1.5; (0.5,1.0) k=3 N=1.5; event@1 N=1.5;
    # (1,2) k=2 N=3.0; event@2 N=3.0
    expected = (
        -1 * 0.5 / 1.5 - 3 * 0.5 / 1.5 - np.log(1.5)
        - 1 * 1.0 / 3.0 - np.log(3.0)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_bdss_reference_oracle():
    """The reference's own pinned value (ref:
    src/test/dr/evomodel/speciation/BirthDeathSSLikelihoodTest.java:86 —
    logL = -19.0198 for the fixed 4-tip serial tree, origin 6)."""
    parent, children, heights, root, taxa = parse_newick(
        "((3:1.5,4:0.5):1,(1:2,2:1):3);"
    )
    got = float(
        serial_birth_death_loglik(
            jnp.asarray(heights), 4,
            birth_rate=2.0, death_rate=1.0, psi=0.5, origin=6.0,
            sampling_prob=0.0, has_final_sample=False,
        )
    )
    np.testing.assert_allclose(got, -19.0198, atol=1e-4)


def test_bdss_p0_oracle():
    """ref: BirthDeathSSLikelihoodTest.java:95 — p0(1, 0.5, 1, 0, 1)."""
    got = float(bdss_p0(1.0, 0.5, 1.0, 0.0, 1.0))
    np.testing.assert_allclose(got, 0.28236670080320814, rtol=1e-12)


def test_bdss_origin_below_root_invalid():
    parent, children, heights, root, taxa = parse_newick(
        "((3:1.5,4:0.5):1,(1:2,2:1):3);"
    )
    got = float(
        serial_birth_death_loglik(
            jnp.asarray(heights), 4,
            birth_rate=2.0, death_rate=1.0, psi=0.5, origin=4.0,
        )
    )
    assert got == -np.inf


def test_sir_early_epidemic_matches_exponential_growth():
    """With S ~= 1 (tiny i0, R0 near 1 era), the SIR Ne reduces to
    exponential growth with rate beta - gamma."""
    rng = np.random.default_rng(7)
    n = 6
    _, _, heights, _ = simulate_coalescent_tree(rng, np.zeros(n), 0.01)
    h = jnp.asarray(heights) * 0.05  # keep the tree well inside S~=1 regime
    r0, gamma, i0, n_total = 1.5, 1.0, 1e-6, 1e7
    beta = r0 * gamma
    r = beta - gamma
    n0 = n_total * i0 / (2 * beta)
    got = float(sir_coalescent_loglik(h, n, r0, gamma, i0, n_total,
                                      t_max=float(h.max()) * 2, n_grid=2048))
    ref = float(exponential_growth_loglik(h, n, n0, r))
    np.testing.assert_allclose(got, ref, rtol=2e-3)
