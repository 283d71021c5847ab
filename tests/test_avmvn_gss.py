"""In-chain AVMVN, HMC mass preconditioning, and generalized
stepping-stone oracles (VERDICT r1 item 6).

  - AVMVN: the running empirical covariance must let the chain traverse a
    strongly correlated Gaussian that an isotropic walk of the same scale
    cannot mix on (ref: AdaptableVarianceMultivariateNormalOperator.java:59).
  - HMC "diag" preconditioning: anisotropic Gaussian with 10^2 scale
    separation (ref: MassPreconditioner.java:51).
  - GSS: conjugate normal-normal model with an analytic marginal
    likelihood (ref: GeneralizedSteppingStoneSamplingAnalysis.java:45).
"""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.hmc import HmcOperator
from beast_mcmc_tpu.inference.marginal_likelihood import (
    beta_quantile_schedule,
    generalized_stepping_stone_logml,
    sample_gss_ratios,
)
from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)
from beast_mcmc_tpu.inference.operators import ScaleOperator
from beast_mcmc_tpu.inference.samplers import AvmvnOperator, make_post_update
from beast_mcmc_tpu.models.priors import normal_logpdf
from beast_mcmc_tpu.tree.topology import make_tree_state


def dummy_tree():
    return make_tree_state(
        parent=[2, 2, -1], children=[[-1, -1], [-1, -1], [0, 1]],
        heights=[0.0, 0.0, 1.0], root=2,
    )


def run_ops(operators, params0, log_post, n_steps, seed=0, collect_every=10):
    step = make_mcmc_step(
        log_post, operators, post_update=make_post_update(operators)
    )
    state = init_mcmc_state(
        params0, dummy_tree(), jax.random.PRNGKey(seed), operators, log_post
    )
    collector = lambda s: {
        k: v for k, v in s.params.items() if not k.startswith("_")
    }
    state, trace = jax.jit(
        lambda s: run_chain(step, s, n_steps, collect_every, collector)
    )(state)
    return state, {k: np.asarray(v) for k, v in trace.items()}


def test_avmvn_learns_correlation():
    # target: 2-d Gaussian, sd (1, 5), corr 0.95
    cov = np.array([[1.0, 0.95 * 5.0], [0.95 * 5.0, 25.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def log_post(params, tree):
        x = params["x"]
        return -0.5 * x @ prec @ x

    op = AvmvnOperator(
        parameters=["x"], scale=1.0, log_transform=False, warmup=200,
        weight=1.0,
    )
    state, trace = run_ops(
        [op], {"x": jnp.zeros(2)}, log_post, 30000, collect_every=5
    )
    xs = trace["x"][1000:]
    emp = np.cov(xs, rowvar=False)
    # learned proposal covariance ~ target covariance => chain covariance
    # reproduces the target within MC error
    assert abs(emp[0, 1] / np.sqrt(emp[0, 0] * emp[1, 1]) - 0.95) < 0.05, emp
    np.testing.assert_allclose(np.diag(emp), np.diag(cov), rtol=0.35)
    # the stats actually accumulated in-chain
    st = state.params[op.stats_key]
    assert float(st["n"]) == 30000
    learned = np.asarray(st["scatter"]) / (float(st["n"]) - 1)
    assert abs(learned[0, 1] / np.sqrt(learned[0, 0] * learned[1, 1]) - 0.95) < 0.05


def test_avmvn_log_space_positive_params():
    # lognormal target via log-space AVMVN: E[log x] = mu
    def log_post(params, tree):
        y = jnp.log(params["x"])
        return jnp.sum(normal_logpdf(y, 1.0, 0.5)) - jnp.sum(y)

    op = AvmvnOperator(parameters=["x"], scale=0.5, warmup=100, weight=1.0)
    _, trace = run_ops(
        [op], {"x": jnp.ones(2) * 2.0}, log_post, 20000, collect_every=5
    )
    ys = np.log(trace["x"][500:])
    assert abs(ys.mean() - 1.0) < 0.1, ys.mean()
    assert abs(ys.std() - 0.5) < 0.1, ys.std()


def test_hmc_diag_preconditioning_anisotropic():
    # sd (1, 100): unpreconditioned unit-mass HMC with step ~0.5 cannot
    # mix the wide dimension in this budget; diagonal mass fixes it
    sds = jnp.asarray([1.0, 100.0])

    def log_post(params, tree):
        return jnp.sum(normal_logpdf(params["x"], 0.0, sds))

    op = HmcOperator(
        parameters=["x"], n_leapfrog=20, step_size=0.5,
        precondition="diag", log_transform=False, weight=1.0,
    )
    _, trace = run_ops(
        [op], {"x": jnp.zeros(2)}, log_post, 3000, collect_every=3
    )
    xs = trace["x"][100:]
    assert abs(xs[:, 0].std() - 1.0) < 0.3, xs[:, 0].std()
    assert abs(xs[:, 1].std() - 100.0) < 30.0, xs[:, 1].std()


# exact marginal for the conjugate model (no scipy needed)
def _analytic_logml(x, s, m0, t0):
    x = np.asarray(x, np.float64)
    n = len(x)
    # x | theta ~ N(theta, s^2 I), theta ~ N(m0, t0^2):
    # marginal x ~ N(m0 * 1, s^2 I + t0^2 11^T)
    cov = s**2 * np.eye(n) + t0**2 * np.ones((n, n))
    d = x - m0
    sign, logdet = np.linalg.slogdet(cov)
    return float(
        -0.5 * (n * np.log(2 * np.pi) + logdet + d @ np.linalg.solve(cov, d))
    )


def test_gss_conjugate_normal():
    rng = np.random.default_rng(0)
    s, m0, t0 = 1.0, 0.0, 2.0
    x_np = rng.normal(1.5, s, size=10)
    x = jnp.asarray(x_np)
    n = len(x_np)

    def log_lik(params, tree):
        return jnp.sum(normal_logpdf(x, params["theta"], s))

    def log_prior(params, tree):
        return normal_logpdf(params["theta"], m0, t0)

    prec_post = n / s**2 + 1 / t0**2
    mu_post = float((np.sum(x_np) / s**2 + m0 / t0**2) / prec_post)
    # widened working distribution (the realistic case: ref != posterior)
    sd_ref = 1.6 / np.sqrt(prec_post)

    def log_ref(params, tree):
        return normal_logpdf(params["theta"], mu_post, sd_ref)

    from beast_mcmc_tpu.inference.operators import RandomWalkOperator

    ops = [RandomWalkOperator(parameter="theta", window=0.5, weight=1.0)]
    betas = beta_quantile_schedule(12)
    ratios = sample_gss_ratios(
        log_lik, log_prior, log_ref, ops, {"theta": jnp.asarray(0.5)},
        dummy_tree(), betas, chain_length=4000, log_every=4,
        key=jax.random.PRNGKey(1),
    )
    est = generalized_stepping_stone_logml(ratios, betas)
    truth = _analytic_logml(x_np, s, m0, t0)
    assert abs(est - truth) < 0.15, (est, truth)
