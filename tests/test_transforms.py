"""Transform framework: round-trips, closed-form Jacobians vs autodiff,
and transformed HMC hitting known posteriors (ref: src/dr/util/Transform.java
hierarchy; its unit tests check logJacobian chain rules — here the
autodiff slogdet IS the oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.utils.transforms import (
    AffineTransform,
    ArrayTransform,
    ComposeTransform,
    FisherZTransform,
    LogitTransform,
    LogTransform,
    NegateTransform,
    NoTransform,
    parse_transform,
    PositiveOrderedTransform,
    PowerTransform,
    ReciprocalTransform,
    ScaledLogitTransform,
    SimplexTransform,
    Transform,
)

CASES = {
    "none": (NoTransform(), np.array([0.3, -1.2, 4.0])),
    "log": (LogTransform(), np.array([0.3, 1.7, 4.0])),
    "logit": (LogitTransform(), np.array([0.2, 0.5, 0.9])),
    "scaled_logit": (
        ScaledLogitTransform(lower=-2.0, upper=5.0),
        np.array([-1.0, 0.0, 4.5]),
    ),
    "fisher_z": (FisherZTransform(), np.array([-0.8, 0.1, 0.6])),
    "affine": (AffineTransform(a=-2.5, b=1.0), np.array([0.3, -1.2, 4.0])),
    "negate": (NegateTransform(), np.array([0.3, -1.2, 4.0])),
    "power": (PowerTransform(power=3.0), np.array([0.3, 1.7, 4.0])),
    "reciprocal": (ReciprocalTransform(), np.array([0.3, 1.7, 4.0])),
    "positive_ordered": (
        PositiveOrderedTransform(), np.array([0.3, 1.7, 4.0])),
    "simplex": (SimplexTransform(k=4), np.array([0.1, 0.4, 0.2, 0.3])),
    "compose": (
        ComposeTransform(outer=AffineTransform(a=2.0, b=-1.0),
                         inner=LogTransform()),
        np.array([0.3, 1.7, 4.0]),
    ),
    "array": (
        ArrayTransform(blocks=[(LogTransform(), 2), (LogitTransform(), 2)]),
        np.array([0.5, 3.0, 0.25, 0.75]),
    ),
}


def _autodiff_ldj(t, y):
    jac = jax.jacfwd(lambda v: jnp.atleast_1d(t.inverse(v)))(y)
    jac = jac.reshape(jnp.size(t.inverse(y)), jnp.size(y))
    if jac.shape[0] != jac.shape[1]:  # simplex: drop the dependent row
        jac = jac[: jac.shape[1]]
    _, logdet = jnp.linalg.slogdet(jac)
    return logdet


@pytest.mark.parametrize("name", sorted(CASES))
def test_roundtrip_and_jacobian(name):
    t, x = CASES[name]
    x = jnp.asarray(x)
    y = t.forward(x)
    x2 = t.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5,
                               atol=1e-8)
    ldj = t.log_det_jacobian_inverse(y)
    ldj_ad = _autodiff_ldj(t, jnp.atleast_1d(y))
    np.testing.assert_allclose(float(ldj), float(ldj_ad), rtol=1e-5,
                               atol=1e-6)
    # reference-convention logJacobian is the negation at x
    np.testing.assert_allclose(
        float(t.log_jacobian(x)), -float(ldj_ad), rtol=1e-5, atol=1e-6)


def test_parse_transform_registry():
    assert isinstance(parse_transform("log"), LogTransform)
    assert isinstance(parse_transform("simplex", k=3), SimplexTransform)
    with pytest.raises(ValueError):
        parse_transform("nope")


def test_simplex_stays_on_simplex():
    t = SimplexTransform(k=5)
    y = jnp.asarray([0.3, -1.0, 2.0, -0.4])
    x = t.inverse(y)
    assert float(jnp.sum(x)) == pytest.approx(1.0, abs=1e-6)
    assert bool(jnp.all(x > 0))


def test_hmc_simplex_transform_samples_dirichlet():
    """HMC over a Dirichlet(2,3,4) posterior through SimplexTransform:
    posterior means must match alpha/sum(alpha) — exercises the
    unconstrained-space density + Hastings corrections end to end."""
    from beast_mcmc_tpu.inference.hmc import HmcOperator
    from beast_mcmc_tpu.inference.mcmc import (
        init_mcmc_state, make_mcmc_step, run_chain)
    from beast_mcmc_tpu.tree.topology import (
        make_tree_state, simulate_coalescent_tree)

    alpha = jnp.asarray([2.0, 3.0, 4.0])

    def log_post(params, tree):
        p = params["pi"]
        return jnp.sum((alpha - 1.0) * jnp.log(p))

    rng = np.random.default_rng(0)
    pa, ch, he, ro = simulate_coalescent_tree(rng, np.zeros(3), 1.0)
    tree0 = make_tree_state(pa, ch, he, ro)
    op = HmcOperator(
        parameters=("pi",), n_leapfrog=8, step_size=0.2,
        transform=SimplexTransform(k=3), log_transform=False, weight=1.0)
    ops = [op]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(
        {"pi": jnp.asarray([1 / 3, 1 / 3, 1 / 3])}, tree0,
        jax.random.PRNGKey(3), ops, log_post)
    state, trace = jax.jit(
        lambda s: run_chain(step, s, 6000, 2,
                            lambda st: {"pi": st.params["pi"]})
    )(state)
    pis = np.asarray(trace["pi"])[500:]
    mean = pis.mean(axis=0)
    expected = np.asarray(alpha / alpha.sum())
    sd = np.sqrt(expected * (1 - expected) / (1 + float(alpha.sum())))
    np.testing.assert_allclose(mean, expected, atol=3.5 * sd.max() / 10 + 0.03)
    np.testing.assert_allclose(pis.sum(axis=1), 1.0, atol=1e-5)
