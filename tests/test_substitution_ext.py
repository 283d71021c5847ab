"""Non-reversible / GLM / covarion / epoch substitution-model tests.

Oracles: the reversible eigen path (complex_q with symmetric rates must
reproduce GTR exactly), scipy expm, invariance constructions (covarion
with identical classes == base model; epoch with identical models ==
homogeneous), and brute-force numpy convolution.
"""

import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.epoch import epoch_branch_matrices, epoch_overlaps
from beast_mcmc_tpu.models.substitution import (
    complex_q,
    covarion_q,
    expand_tip_partials_hidden,
    glm_rates,
    gtr_eigen,
    hky_eigen,
)
from beast_mcmc_tpu.models.treelikelihood import (
    tree_loglikelihood,
    tree_loglikelihood_pmats,
    tree_loglikelihood_q,
)
from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates, single_rate
from beast_mcmc_tpu.ops.eigen import transition_probs
from beast_mcmc_tpu.ops.expm import transition_probs_expm
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree

from fixtures import primate_patterns, primate_tree


def primate_setup():
    pats = primate_patterns()
    parent, children, heights, root, taxa = primate_tree()
    tips = jnp.swapaxes(jnp.asarray(pats.tip_partials()), 1, 2)
    weights = jnp.asarray(pats.weights)
    freqs = jnp.asarray(pats.empirical_frequencies())
    return tips, weights, parent, children, heights, root, freqs


def test_expm_path_matches_eigen_path():
    tips, weights, parent, children, heights, root, freqs = primate_setup()
    rates6 = jnp.asarray([1.2, 3.0, 0.7, 0.9, 4.1, 1.0])
    eig = gtr_eigen(rates6, freqs)
    cat_r, cat_w = discrete_gamma_rates(0.5, 4)
    ll_eigen = float(tree_loglikelihood(
        tips, weights, jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, eig, freqs, cat_r, cat_w, 1.0,
    ))
    # same model through the non-reversible generator route:
    # full rate vector r_ij = s_ij (symmetric) -> Q identical to GTR
    s = np.zeros((4, 4))
    iu = np.triu_indices(4, 1)
    s[iu] = np.asarray(rates6)
    s = s + s.T
    off = ~np.eye(4, dtype=bool)
    q = complex_q(jnp.asarray(s[off]), freqs)
    ll_expm = float(tree_loglikelihood_q(
        tips, weights, jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, q, freqs, cat_r, cat_w, 1.0,
    ))
    np.testing.assert_allclose(ll_expm, ll_eigen, rtol=1e-8)


def test_complex_q_rows_and_normalization():
    freqs = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    rates = jnp.arange(1.0, 13.0)
    q = np.asarray(complex_q(rates, freqs))
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(-np.sum(np.asarray(freqs) * np.diag(q)), 1.0)


def test_nonreversible_differs_from_reversible():
    """An asymmetric rate matrix must NOT equal its symmetrized version
    (guards against silently symmetrizing)."""
    tips, weights, parent, children, heights, root, freqs = primate_setup()
    rng = np.random.default_rng(0)
    r = rng.uniform(0.5, 2.0, 12)
    cat_r, cat_w = single_rate()
    q1 = complex_q(jnp.asarray(r), freqs)
    r_sym = r.copy()
    # symmetrize pairs (ij, ji)
    off = np.where(~np.eye(4, dtype=bool))
    pairs = {}
    for k, (i, j) in enumerate(zip(*off)):
        pairs[(i, j)] = k
    r2 = r.copy()
    for (i, j), k in pairs.items():
        if i < j:
            m = 0.5 * (r[pairs[(i, j)]] + r[pairs[(j, i)]])
            r2[pairs[(i, j)]] = m
            r2[pairs[(j, i)]] = m
    q2 = complex_q(jnp.asarray(r2), freqs)
    args = (tips, weights, jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), root)
    l1 = float(tree_loglikelihood_q(*args, q1, freqs, cat_r, cat_w, 1.0))
    l2 = float(tree_loglikelihood_q(*args, q2, freqs, cat_r, cat_w, 1.0))
    assert abs(l1 - l2) > 1e-3


def test_glm_rates():
    design = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    beta = jnp.asarray([0.5, -1.0])
    got = np.asarray(glm_rates(design, beta))
    np.testing.assert_allclose(got, np.exp([0.5, -1.0, -0.5]))
    masked = np.asarray(glm_rates(design, beta, jnp.asarray([1.0, 0.0])))
    np.testing.assert_allclose(masked, np.exp([0.5, 0.0, 0.5]))


def test_covarion_identical_classes_equals_base():
    """H classes with rate 1 and any switch rate == the base model on the
    observed states (switching is unidentifiable)."""
    tips, weights, parent, children, heights, root, freqs = primate_setup()
    kappa = 3.0
    eig = hky_eigen(jnp.asarray(kappa), freqs)
    cat_r, cat_w = single_rate()
    base = float(tree_loglikelihood(
        tips, weights, jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, eig, freqs, cat_r, cat_w, 1.0,
    ))
    # covarion with 2 identical classes
    r = jnp.ones((4, 4)) * 1.0
    r = r.at[0, 2].set(kappa).at[2, 0].set(kappa)
    r = r.at[1, 3].set(kappa).at[3, 1].set(kappa)
    r = r * (1.0 - jnp.eye(4))
    # normalize base exchangeabilities like reversible_eigen does:
    q8, pf = covarion_q(r, freqs, jnp.asarray([1.0, 1.0]),
                        jnp.asarray([0.4, 0.6]), 1.7)
    tips8 = expand_tip_partials_hidden(tips, 2)
    got = float(tree_loglikelihood_q(
        tips8, weights, jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, q8, pf, cat_r, cat_w, 1.0,
    ))
    np.testing.assert_allclose(got, base, rtol=1e-7)


def test_covarion_rate_variation_changes_likelihood():
    tips, weights, parent, children, heights, root, freqs = primate_setup()
    r = jnp.ones((4, 4)) * (1.0 - jnp.eye(4))
    cat_r, cat_w = single_rate()
    q8, pf = covarion_q(r, freqs, jnp.asarray([0.1, 1.9]),
                        jnp.asarray([0.5, 0.5]), 0.5)
    tips8 = expand_tip_partials_hidden(tips, 2)
    got = float(tree_loglikelihood_q(
        tips8, weights, jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, q8, pf, cat_r, cat_w, 1.0,
    ))
    assert np.isfinite(got)


def test_epoch_identical_models_equals_homogeneous():
    tips, weights, parent, children, heights, root, freqs = primate_setup()
    eig = hky_eigen(jnp.asarray(2.0), freqs)
    cat_r, cat_w = discrete_gamma_rates(0.7, 4)
    base = float(tree_loglikelihood(
        tips, weights, jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), root, eig, freqs, cat_r, cat_w, 1.0,
    ))
    h = np.asarray(heights)
    boundaries = jnp.asarray([float(h.max()) * 0.3, float(h.max()) * 0.6])
    p_mats = epoch_branch_matrices(
        [eig, eig, eig], boundaries, jnp.asarray(parent),
        jnp.asarray(heights), 1.0, cat_r,
    )
    got = float(tree_loglikelihood_pmats(
        tips, weights, jnp.asarray(children), jnp.asarray(heights), root,
        jnp.asarray(parent), p_mats, freqs, cat_w,
    ))
    np.testing.assert_allclose(got, base, rtol=1e-8)


def test_epoch_overlaps_and_convolution_brute_force():
    # single branch from height 0.2 to 1.5, boundaries at 0.5 and 1.0
    parent = jnp.asarray([1, -1], jnp.int32)
    heights = jnp.asarray([0.2, 1.5])
    boundaries = jnp.asarray([0.5, 1.0])
    ov = np.asarray(epoch_overlaps(parent, heights, boundaries))
    np.testing.assert_allclose(ov[0], [0.3, 0.5, 0.5])
    # convolution order: P = P2(0.5) @ P1(0.5) @ P0(0.3)
    freqs = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    e0 = hky_eigen(jnp.asarray(2.0), freqs)
    e1 = hky_eigen(jnp.asarray(5.0), freqs)
    e2 = hky_eigen(jnp.asarray(0.5), freqs)
    cat_r = jnp.asarray([1.0])
    p = np.asarray(epoch_branch_matrices(
        [e0, e1, e2], boundaries, parent, heights, 1.0, cat_r
    ))[0, 0]
    p0 = np.asarray(transition_probs(e0, jnp.asarray([[0.3]])))[0, 0]
    p1 = np.asarray(transition_probs(e1, jnp.asarray([[0.5]])))[0, 0]
    p2 = np.asarray(transition_probs(e2, jnp.asarray([[0.5]])))[0, 0]
    np.testing.assert_allclose(p, p2 @ p1 @ p0, rtol=1e-10)
    # row-stochastic
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-9)
