"""Marginal-likelihood estimators vs an analytic conjugate oracle.

Normal-normal model: x_i ~ N(mu, s2) with mu ~ N(0, t2); the marginal
likelihood is available in closed form, so path sampling and
stepping-stone must recover it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.marginal_likelihood import (
    beta_quantile_schedule,
    harmonic_mean_logml,
    path_sampling_logml,
    sample_power_posteriors,
    stepping_stone_logml,
)
from beast_mcmc_tpu.inference.operators import RandomWalkOperator
from beast_mcmc_tpu.models.priors import normal_logpdf
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree


def test_schedule():
    b = beta_quantile_schedule(11, alpha=0.3)
    assert b[0] == 1.0 and b[-1] == 0.0
    assert (np.diff(b) < 0).all()
    # quantile schedule concentrates near 0
    assert b[5] < 0.1


def test_path_sampling_normal_conjugate():
    rng = np.random.default_rng(0)
    s2, t2 = 1.0, 4.0
    data = jnp.asarray(rng.normal(1.5, np.sqrt(s2), size=12))
    n = len(data)

    def log_lik(params, tree):
        return normal_logpdf(data, params["mu"], jnp.sqrt(s2))

    def log_prior(params, tree):
        return normal_logpdf(params["mu"], 0.0, jnp.sqrt(t2))

    # analytic log marginal: x_bar ~ ... full formula
    xbar = float(np.mean(np.asarray(data)))
    # p(x) = N(x; 0, s2 I + t2 11^T): use log pdf of multivariate normal
    cov = s2 * np.eye(n) + t2 * np.ones((n, n))
    diff = np.asarray(data)
    _, logdet = np.linalg.slogdet(cov)
    analytic = float(
        -0.5 * (n * np.log(2 * np.pi) + logdet + diff @ np.linalg.solve(cov, diff))
    )

    ops = [RandomWalkOperator(parameter="mu", weight=1.0,
                              lower=-np.inf, upper=np.inf, window=1.0)]
    parent, children, heights, root = simulate_coalescent_tree(
        np.random.default_rng(0), np.zeros(3), 1.0)
    tree = make_tree_state(parent, children, heights, root)

    betas = beta_quantile_schedule(24, alpha=0.3)
    lls = sample_power_posteriors(
        log_lik, log_prior, ops, {"mu": jnp.asarray(0.5)}, tree,
        betas, chain_length=4000, log_every=4, key=jax.random.PRNGKey(0))

    ps = path_sampling_logml(lls, betas)
    ss = stepping_stone_logml(lls, betas)
    assert abs(ps - analytic) < 0.25, (ps, analytic)
    assert abs(ss - analytic) < 0.15, (ss, analytic)
    # harmonic mean from the beta=1 rung: biased but same ballpark
    hm = harmonic_mean_logml(lls[0])
    assert abs(hm - analytic) < 2.0
