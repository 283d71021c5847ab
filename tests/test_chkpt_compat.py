"""BEAST `.chkpt` checkpoint compatibility round trip.

Oracle: a state written in the reference's text format
(BeastCheckpointer.java:270-440) reads back bit-equal, and restoring a
chain state from a checkpoint reproduces the same log-posterior the
chain had when it was saved (the online-BEAST resume contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.apps.checkpoint_compat import (
    ChkptState,
    ChkptTree,
    chkpt_to_tree_arrays,
    read_checkpoint,
    write_checkpoint,
)


def _sample_tree():
    # ((A:1,B:1):1,C:2) in BEAST-style arbitrary node numbering
    parent = np.array([3, 3, 4, 4, -1], np.int32)
    children = np.array(
        [[-1, -1], [-1, -1], [-1, -1], [0, 1], [3, 2]], np.int32)
    heights = np.array([0.0, 0.0, 0.0, 1.0, 2.0])
    taxa = {0: "A", 1: "B", 2: "C"}
    return ChkptTree("treeModel", parent, children, heights, taxa,
                     np.zeros((5, 0)))


def test_roundtrip(tmp_path):
    st = ChkptState(
        state=12345,
        lnl=-987.654321,
        rng=[1, 2, 3, 4],
        parameters={"kappa": np.array([2.5]),
                    "frequencies": np.array([0.1, 0.2, 0.3, 0.4])},
        operators={"scale(kappa)": (10, 20, 0.75, 30)},
        trees={"treeModel": _sample_tree()},
    )
    path = tmp_path / "run.chkpt"
    write_checkpoint(str(path), st)
    back = read_checkpoint(str(path))
    assert back.state == 12345
    assert back.lnl == -987.654321
    assert back.rng == [1, 2, 3, 4]
    np.testing.assert_allclose(back.parameters["kappa"], [2.5])
    np.testing.assert_allclose(back.parameters["frequencies"],
                               [0.1, 0.2, 0.3, 0.4])
    assert back.operators["scale(kappa)"][:2] == (10, 20)
    t = back.trees["treeModel"]
    np.testing.assert_array_equal(t.parent, st.trees["treeModel"].parent)
    np.testing.assert_array_equal(t.children,
                                  st.trees["treeModel"].children)


def test_restore_reproduces_log_posterior(tmp_path):
    from beast_mcmc_tpu.apps.benchmarks import build_analysis
    from beast_mcmc_tpu.inference.mcmc import (
        init_mcmc_state,
        make_mcmc_step,
        run_chain,
    )
    from beast_mcmc_tpu.tree.topology import make_tree_state

    log_post, operators, params0, tree0, _ = build_analysis(
        n_taxa=6, n_patterns=32, model="hky")
    step = make_mcmc_step(log_post, operators)
    state = init_mcmc_state(params0, tree0, jax.random.PRNGKey(3),
                            operators, log_post)
    state, _ = jax.jit(lambda s: run_chain(step, s, 50))(state)
    lnl = float(state.log_posterior)

    # save in reference format: parameters + the tree (reference node
    # numbering = ours is a valid instance of it)
    taxa = [f"t{i}" for i in range(6)]
    parent = np.asarray(state.tree.parent)
    children = np.asarray(state.tree.children)
    heights = np.asarray(state.tree.heights)
    tree = ChkptTree("treeModel", parent, children, heights,
                     {i: taxa[i] for i in range(6)}, np.zeros((11, 0)))
    st = ChkptState(
        state=50, lnl=lnl, rng=[0],
        parameters={k: np.asarray(v) for k, v in state.params.items()
                    if not k.startswith("__")},
        operators={}, trees={"treeModel": tree},
    )
    path = tmp_path / "resume.chkpt"
    write_checkpoint(str(path), st)

    # restore through the public reader
    back = read_checkpoint(str(path))
    p2, c2, h2, root2 = chkpt_to_tree_arrays(back.trees["treeModel"],
                                             taxa)
    tree2 = make_tree_state(p2, c2, h2, root2, jnp.float64)
    params2 = dict(state.params)
    for k, v in back.parameters.items():
        params2[k] = jnp.asarray(v).reshape(jnp.shape(params2[k]))
    lp2 = float(log_post(params2, tree2))
    assert lp2 == pytest_approx(lnl)


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-9, abs=1e-9)
