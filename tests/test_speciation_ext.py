"""Episodic serially-sampled birth-death, calibrated speciation, multilocus
skygrid (ref: src/dr/evomodel/birthdeath/
BirthDeathEpisodicSeriallySampledModel.java,
src/dr/evomodel/speciation/CalibratedSpeciationLikelihood.java,
src/dr/evomodel/coalescent/GMRFMultilocusSkyrideLikelihood.java)."""

import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.models.coalescent import (
    gmrf_log_prior,
    multilocus_skygrid_loglik,
    skygrid_loglik,
)
from beast_mcmc_tpu.models.priors import lognormal_logpdf
from beast_mcmc_tpu.models.speciation import (
    calibrated_speciation_loglik,
    episodic_serial_birth_death_loglik,
    mrca_node,
    serial_birth_death_loglik,
    yule_loglik,
)
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree


def _serial_tree(n_taxa, seed=0):
    rng = np.random.default_rng(seed)
    tip_h = rng.uniform(0, 1.0, n_taxa)
    tip_h[0] = 0.0
    parent, children, heights, root = simulate_coalescent_tree(rng, tip_h, 1.0)
    return parent, children, heights, root, tip_h


@pytest.mark.parametrize("k", [1, 4, 7])
def test_episodic_reduces_to_constant_rate(k):
    """K equal intervals with identical rates and r=1 must equal the
    Stadler-2010 constant-rate serial BD oracle exactly."""
    parent, children, heights, root, tip_h = _serial_tree(8, seed=1)
    n = 8
    b, d, psi, x0 = 2.0, 1.0, 0.5, float(heights.max()) * 1.3
    want = float(serial_birth_death_loglik(
        jnp.asarray(heights), n, b, d, psi, x0))
    got = float(episodic_serial_birth_death_loglik(
        jnp.asarray(heights), n, x0,
        jnp.full(k, b), jnp.full(k, d), jnp.full(k, psi),
        treatment_probs=1.0, grid_end=x0 * 1.5, num_intervals=k))
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize("k", [1, 5])
def test_episodic_with_present_sampling_matches_oracle(k):
    """rho-sampling at present (contemporaneous tips) vs the 2010 oracle
    with has_final_sample. The log(4 rho) vs log(rho) convention offset
    cancels against the q normalisation (see module docstring)."""
    rng = np.random.default_rng(2)
    n = 10
    tip_h = np.zeros(n)
    tip_h[5:] = rng.uniform(0.1, 0.8, 5)
    parent, children, heights, root = simulate_coalescent_tree(rng, tip_h, 1.0)
    b, d, psi, rho = 2.0, 0.7, 0.4, 0.6
    x0 = float(heights.max()) * 1.2
    want = float(serial_birth_death_loglik(
        jnp.asarray(heights), n, b, d, psi, x0, sampling_prob=rho,
        has_final_sample=True))
    got = float(episodic_serial_birth_death_loglik(
        jnp.asarray(heights), n, x0,
        jnp.full(k, b), jnp.full(k, d), jnp.full(k, psi),
        treatment_probs=1.0, rho_present=rho, grid_end=x0 * 1.4,
        num_intervals=k))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_episodic_rate_shift_changes_likelihood_monotonically():
    """A genuine rate shift must move the likelihood, and the direction
    must be consistent: higher late birth rate on a short-branch-late tree
    vs the constant model."""
    parent, children, heights, root, tip_h = _serial_tree(8, seed=3)
    n = 8
    x0 = float(heights.max()) * 1.3
    base = float(episodic_serial_birth_death_loglik(
        jnp.asarray(heights), n, x0,
        jnp.asarray([2.0, 2.0]), jnp.asarray([1.0, 1.0]),
        jnp.asarray([0.5, 0.5]), grid_end=x0 * 1.5, num_intervals=2))
    shifted = float(episodic_serial_birth_death_loglik(
        jnp.asarray(heights), n, x0,
        jnp.asarray([2.0, 3.5]), jnp.asarray([1.0, 1.0]),
        jnp.asarray([0.5, 0.5]), grid_end=x0 * 1.5, num_intervals=2))
    assert base != shifted
    assert np.isfinite(base) and np.isfinite(shifted)
    # origin below root -> -inf
    bad = float(episodic_serial_birth_death_loglik(
        jnp.asarray(heights), n, float(heights.max()) * 0.5,
        2.0, 1.0, 0.5, grid_end=x0 * 1.5, num_intervals=2))
    assert bad == -np.inf


def test_mrca_node_and_calibration():
    # ((0,1)4,(2,3)5)6 heights 0,0,0,0,1,2,3
    parent = jnp.asarray([4, 4, 5, 5, 6, 6, -1], jnp.int32)
    heights = jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
    tips01 = jnp.asarray([True, True, False, False, False, False, False])
    tips03 = jnp.asarray([True, False, False, True, False, False, False])
    assert int(mrca_node(parent, heights, tips01)) == 4
    assert int(mrca_node(parent, heights, tips03)) == 6

    yule = yule_loglik(heights, 4, 6, 1.0)
    cal = calibrated_speciation_loglik(
        yule, parent, heights,
        [(tips01, lambda h: lognormal_logpdf(h, 0.0, 0.5))],
    )
    want = float(yule) + float(lognormal_logpdf(jnp.asarray(1.0), 0.0, 0.5))
    np.testing.assert_allclose(float(cal), want, rtol=1e-12)


def test_multilocus_skygrid_sums_loci_with_ploidy():
    rng = np.random.default_rng(4)
    trees = []
    ns = [6, 9]
    for n in ns:
        _, _, heights, _ = simulate_coalescent_tree(rng, np.zeros(n), 1.0)
        trees.append(jnp.asarray(heights))
    gamma = jnp.asarray([0.1, -0.2, 0.4])
    cuts = jnp.asarray([0.5, 1.5])
    got = multilocus_skygrid_loglik(trees, ns, gamma, cuts,
                                    ploidy_factors=[1.0, 2.0])
    want = (skygrid_loglik(trees[0], 6, gamma, cuts)
            + skygrid_loglik(trees[1], 9, gamma + jnp.log(2.0), cuts))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-12)
    # GMRF prior applies once over the shared field
    assert np.isfinite(float(gmrf_log_prior(gamma, 2.0)))
