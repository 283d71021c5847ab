"""Multi-partition likelihood, node-height ratios transform, node-height
HMC, and the full-evaluation self-check."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.inference.hmc import NodeHeightHmcOperator
from beast_mcmc_tpu.inference.mcmc import (
    full_evaluation_check,
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.sitemodel import single_rate
from beast_mcmc_tpu.models.substitution import hky_eigen
from beast_mcmc_tpu.models.treelikelihood import (
    multipartition_loglikelihood,
    tree_loglikelihood,
)
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree
from beast_mcmc_tpu.tree.transforms import (
    heights_to_ratios,
    ratios_to_heights,
    subtree_anchors,
)
from beast_mcmc_tpu.inference.tree_operators import RandomWalkNodeHeightOperator
from beast_mcmc_tpu.inference.operators import RootHeightScaleOperator


def _tree(n_taxa=8, seed=0, tip_heights=None):
    rng = np.random.default_rng(seed)
    th = np.zeros(n_taxa) if tip_heights is None else np.asarray(tip_heights)
    parent, children, heights, root = simulate_coalescent_tree(rng, th, 1.0)
    return make_tree_state(parent, children, heights, root)


def test_multipartition_matches_sum_of_partitions():
    """Batched 3-partition likelihood == sum of three single-partition
    evaluations (ref parity target: MultiPartitionDataLikelihoodDelegate
    partition-wise lnL cache)."""
    log_post, ops, params0, tree0, aux = build_analysis(
        n_taxa=10, n_patterns=48, model="hky_codon3", pad_multiple=8
    )
    tips, weights, freqs = aux["tips"], aux["weights"], aux["freqs"]
    params = dict(params0)
    params["kappa"] = jnp.asarray([1.5, 2.5, 4.0])
    params["mu"] = jnp.asarray([0.8, 1.0, 1.2])
    batched = aux["log_lik"](params, tree0)
    total = 0.0
    for k in range(3):
        eig = hky_eigen(params["kappa"][k], freqs)
        r, w = single_rate()
        total += tree_loglikelihood(
            tips[k], weights[k], tree0.parent, tree0.children, tree0.heights,
            tree0.root, eig, freqs, params["mu"][k] * r, w,
            params["clock.rate"], use_pallas=False,
        )
    np.testing.assert_allclose(float(batched), float(total), rtol=1e-10)
    assert np.isfinite(float(log_post(params0, tree0)))


def test_height_ratios_roundtrip_and_jacobian():
    """heights -> ratios -> heights is the identity, and the analytic
    log|J| matches the autodiff Jacobian determinant (dated tips too)."""
    n_taxa = 6
    tree = _tree(n_taxa, seed=3, tip_heights=[0.0, 0.1, 0.0, 0.3, 0.2, 0.0])
    ratios, rh = heights_to_ratios(
        tree.parent, tree.children, tree.heights, tree.root, n_taxa
    )
    assert np.all((np.asarray(ratios) > 0) & (np.asarray(ratios) <= 1))
    heights2, logj = ratios_to_heights(
        tree.parent, tree.children, tree.heights[:n_taxa], ratios, rh,
        tree.root, n_taxa,
    )
    np.testing.assert_allclose(
        np.asarray(heights2), np.asarray(tree.heights), rtol=1e-12
    )

    # autodiff check of log|J|: d heights(internal, non-root) / d ratios
    root = int(tree.root)
    internal = [i for i in range(n_taxa, 2 * n_taxa - 1) if i != root]

    def h_of_r(r_free):
        r = ratios
        for j, node in enumerate(internal):
            r = r.at[node - n_taxa].set(r_free[j])
        h, _ = ratios_to_heights(
            tree.parent, tree.children, tree.heights[:n_taxa], r, rh,
            tree.root, n_taxa,
        )
        return h[jnp.asarray(internal)]

    r_free = ratios[jnp.asarray(internal) - n_taxa]
    jac = jax.jacfwd(h_of_r)(r_free)
    _, expected = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(float(logj), expected, rtol=1e-9)


def test_node_height_hmc_matches_mh_posterior():
    """NodeHeightHmcOperator (transform + Jacobian + kinetic correction)
    targets the same posterior as validated MH height operators: compare
    mean root heights on a fixed-topology coalescent-only target."""
    n_taxa = 5
    tree = _tree(n_taxa, seed=1)

    def log_post(params, tree):
        return constant_coalescent_loglik(tree.heights, n_taxa, 1.0)

    def run(ops, seed, n):
        step = make_mcmc_step(log_post, ops)
        state = init_mcmc_state({}, tree, jax.random.PRNGKey(seed), ops, log_post)
        coll = lambda s: s.tree.heights[s.tree.root]
        state, roots = jax.jit(
            lambda s: run_chain(step, s, n, collect_every=5, collector=coll)
        )(state)
        roots = np.asarray(roots)
        return roots[len(roots) // 5:].mean(), state

    m_hmc, s_hmc = run(
        [NodeHeightHmcOperator(n_leapfrog=8, step_size=0.1, weight=1.0)], 0, 4000
    )
    m_mh, _ = run(
        [RandomWalkNodeHeightOperator(weight=4.0), RootHeightScaleOperator(weight=1.0)],
        1, 20000,
    )
    acc = int(s_hmc.op_accept.sum())
    assert acc > 100, f"HMC barely moved: {acc}"
    np.testing.assert_allclose(m_hmc, m_mh, rtol=0.12)


def test_derived_cache_matches_from_scratch():
    """The derived-parameter cache (eigen + gamma rates rebuilt only in
    branches whose operator touches their inputs) samples exactly the
    posterior that recomputes everything every step — validated by the
    full-evaluation self-check against the self-contained log_post."""
    log_post, ops, params0, tree0, aux = build_analysis(
        n_taxa=8, n_patterns=32, model="gtr_gamma", pad_multiple=8
    )
    step = make_mcmc_step(
        aux["log_post_cached"], ops, derived=aux["derived"]
    )
    state = init_mcmc_state(
        params0, tree0, jax.random.PRNGKey(7), ops, log_post,
        derived=aux["derived"],
    )
    state, max_dev = jax.jit(
        lambda s: full_evaluation_check(
            step, log_post, s, n_steps=300, derived=aux["derived"]
        )
    )(state)
    assert float(max_dev) < 1e-8, float(max_dev)
    # the substitution-model operators did fire (so the cache was exercised)
    assert int(state.op_accept[0] + state.op_reject[0]) > 0


def test_full_evaluation_check_no_drift():
    """The carried log-posterior never drifts from a from-scratch
    re-evaluation (the reference's MarkovChain self-test, threshold 0.1;
    ours passes at f64 tolerance)."""
    log_post, ops, params0, tree0, _ = build_analysis(
        n_taxa=8, n_patterns=32, model="gtr_gamma", pad_multiple=8
    )
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(params0, tree0, jax.random.PRNGKey(0), ops, log_post)
    state, max_dev = jax.jit(
        lambda s: full_evaluation_check(step, log_post, s, n_steps=200)
    )(state)
    assert float(max_dev) < 1e-8, float(max_dev)
    assert np.isfinite(float(state.log_posterior))
