"""HMC operator tests: exact moments on a known Gaussian target, and a
phylogenetic smoke test where HMC samples kappa/popSize jointly."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.hmc import HmcOperator
from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain
from beast_mcmc_tpu.inference.trace import analyze
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.priors import lognormal_logpdf, one_on_x_logpdf
from beast_mcmc_tpu.models.sitemodel import single_rate
from beast_mcmc_tpu.models.substitution import hky_eigen
from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree

from fixtures import primate_patterns, primate_tree


def _dummy_tree():
    parent, children, heights, root = simulate_coalescent_tree(
        np.random.default_rng(0), np.zeros(3), 1.0)
    return make_tree_state(parent, children, heights, root)


def test_hmc_lognormal_target_moments():
    """Sample x with log x ~ N(mu, sigma^2) via HMC in log space; check
    E[log x] and Var[log x]."""
    mu, sigma = 0.7, 0.45

    def log_post(params, tree):
        return lognormal_logpdf(params["x"], mu, sigma)

    ops = [HmcOperator(parameters=("x",), n_leapfrog=8, step_size=0.3,
                       weight=1.0)]
    step = make_mcmc_step(log_post, ops)
    tree = _dummy_tree()
    state = init_mcmc_state({"x": jnp.asarray(1.0)}, tree,
                            jax.random.PRNGKey(2), ops, log_post)

    def collector(s):
        return {"x": s.params["x"]}

    state, out = jax.jit(
        lambda s: run_chain(step, s, 20000, collect_every=5,
                            collector=collector))(state)
    lx = np.log(np.asarray(out["x"]))[400:]
    st = analyze(lx)
    assert st.ess > 200
    assert abs(st.mean - mu) < 4 * st.std_error_of_mean
    assert abs(lx.std() - sigma) < 0.05
    acc = int(state.op_accept[0]) / (int(state.op_accept[0]) + int(state.op_reject[0]))
    assert acc > 0.5  # HMC should accept most proposals after adaptation


def test_hmc_on_phylogenetic_posterior():
    """Joint HMC over kappa and popSize on the primate analysis —
    gradients flow through the peeling VJP and the coalescent."""
    pats = primate_patterns()
    parent, children, heights, root, taxa = primate_tree()
    tree = make_tree_state(parent, children, heights, root)
    tips = jnp.swapaxes(jnp.asarray(pats.tip_partials()), 1, 2)
    weights = jnp.asarray(pats.weights)
    freqs = jnp.asarray(pats.empirical_frequencies())
    rates, cat_w = single_rate()

    def log_post(params, tree):
        eig = hky_eigen(params["kappa"], freqs)
        ll = tree_loglikelihood(
            tips, weights, tree.parent, tree.children, tree.heights,
            tree.root, eig, freqs, rates, cat_w, 1.0)
        return (ll + lognormal_logpdf(params["kappa"], 1.0, 1.25)
                + one_on_x_logpdf(params["pop.size"])
                + constant_coalescent_loglik(tree.heights, 6, params["pop.size"]))

    ops = [HmcOperator(parameters=("kappa", "pop.size"), n_leapfrog=5,
                       step_size=0.1, weight=1.0)]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(
        {"kappa": jnp.asarray(5.0), "pop.size": jnp.asarray(0.1)},
        tree, jax.random.PRNGKey(0), ops, log_post)
    state, out = jax.jit(
        lambda s: run_chain(step, s, 600, collect_every=10,
                            collector=lambda s: {"kappa": s.params["kappa"],
                                                 "lp": s.log_posterior}))(state)
    assert np.isfinite(np.asarray(out["lp"])).all()
    # kappa moves toward its posterior mode (~30)
    assert float(np.asarray(out["kappa"])[-10:].mean()) > 15.0
    acc = int(state.op_accept[0])
    assert acc > 100
