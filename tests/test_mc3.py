"""MC3 parallel-tempering tests: chain coupling must let the cold chain
cross between far-apart modes that defeat a single chain."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.mc3 import (
    make_mc3_runner,
    mc3_temperatures,
    replicate_state,
)
from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain
from beast_mcmc_tpu.inference.operators import RandomWalkOperator
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree


def bimodal_logpost(params, tree):
    x = params["x"]
    m = 2.0
    lp1 = -0.5 * (x - m) ** 2 / 0.04
    lp2 = -0.5 * (x + m) ** 2 / 0.04
    return jnp.logaddexp(lp1, lp2)


def _tree():
    parent, children, heights, root = simulate_coalescent_tree(
        np.random.default_rng(0), np.zeros(3), 1.0)
    return make_tree_state(parent, children, heights, root)


def test_temperature_ladder():
    t = mc3_temperatures(4, delta=1.0)
    np.testing.assert_allclose(np.asarray(t), [1, 0.5, 1 / 3, 0.25])


def test_mc3_crosses_modes():
    ops = [RandomWalkOperator(parameter="x", weight=1.0, lower=-np.inf,
                              upper=np.inf, window=1.0)]
    tree = _tree()
    n_chains = 6

    # single chain: stuck in the starting mode
    step = make_mcmc_step(bimodal_logpost, ops)
    s0 = init_mcmc_state({"x": jnp.asarray(2.0)}, tree,
                         jax.random.PRNGKey(0), ops, bimodal_logpost)
    s_single, out = jax.jit(lambda s: run_chain(
        step, s, 20000, collect_every=20,
        collector=lambda s: {"x": s.params["x"]}))(s0)
    xs_single = np.asarray(out["x"])
    assert (xs_single > 0).all()  # never crosses with window=1 adaptation

    # MC3: hot chains (T down to 1/6 => flat enough) ferry states across
    run_mc3, temps = make_mc3_runner(
        bimodal_logpost, ops, n_chains=n_chains, swap_every=20, delta=2.0)
    states = replicate_state(s0, n_chains, jax.random.PRNGKey(1))
    states, outputs = jax.jit(
        lambda st: run_mc3(st, jax.random.PRNGKey(2), 1000,
                           collector=lambda c: {"x": c.params["x"]}))(states)
    xs = np.asarray(outputs["x"])
    swap_rate = float(np.asarray(outputs["swap_accepted"]).mean())
    assert 0.1 < swap_rate <= 1.0, swap_rate
    assert (xs > 0).any() and (xs < 0).any(), "cold chain never crossed"
    # roughly symmetric occupancy
    frac = (xs > 0).mean()
    assert 0.2 < frac < 0.8, frac


def test_swap_semantics_under_chain_sharding():
    """Swap permutations act identically whether the chain batch lives on
    one device or sharded over the mesh `chains` axis (the on-mesh MC3
    contract — ref: MCMCMC.java:289-316; SURVEY §5.8)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from beast_mcmc_tpu.inference.mc3 import (
        mc3_temperatures,
        replicate_state,
        swap_states,
    )
    from beast_mcmc_tpu.inference.mcmc import init_mcmc_state
    from beast_mcmc_tpu.parallel.mesh import chain_sharding, make_mesh
    from beast_mcmc_tpu.tree.topology import make_tree_state

    import jax.numpy as jnp
    import numpy as np

    n_chains = 4
    parent = np.array([2, 2, -1])
    children = np.array([[-1, -1], [-1, -1], [0, 1]])
    tree0 = make_tree_state(parent, children, np.array([0.0, 0.0, 1.0]), 2,
                            jnp.float64)

    def lp(params, tree):
        return -jnp.sum(params["x"] ** 2)

    ops = []
    state = init_mcmc_state({"x": jnp.asarray(1.0)}, tree0,
                            jax.random.PRNGKey(0), ops, lp)
    states = replicate_state(state, n_chains, jax.random.PRNGKey(1))
    # distinct per-chain posteriors so a swap is visible
    states = states.replace(
        log_posterior=jnp.asarray([-1.0, -2.0, -3.0, -4.0]),
        params={"x": jnp.asarray([1.0, 2.0, 3.0, 4.0])},
    )
    temps = mc3_temperatures(n_chains)
    key = jax.random.PRNGKey(7)

    plain, acc_plain = swap_states(states, temps, key)

    mesh = make_mesh(2, len(jax.devices()) // 2)
    sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, chain_sharding(mesh)), states)
    with mesh:
        out, acc_sh = jax.jit(lambda s: swap_states(s, temps, key))(sharded)
    np.testing.assert_array_equal(np.asarray(acc_plain),
                                  np.asarray(acc_sh))
    np.testing.assert_allclose(np.asarray(plain.params["x"]),
                               np.asarray(out.params["x"]))
    np.testing.assert_allclose(np.asarray(plain.log_posterior),
                               np.asarray(out.log_posterior))
