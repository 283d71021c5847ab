"""SMC particle restart, online taxon insertion, TreeStat tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.apps.treestat import format_report, tree_statistics, treestat_report
from beast_mcmc_tpu.inference.checkpoint import save_checkpoint
from beast_mcmc_tpu.inference.mcmc import init_mcmc_state, make_mcmc_step, run_chain
from beast_mcmc_tpu.inference.operators import (
    RootHeightScaleOperator,
    ScaleOperator,
    UniformNodeHeightOperator,
)
from beast_mcmc_tpu.inference.smc import (
    distance_based_attachment,
    insert_taxon,
    load_particles,
    run_particles,
)
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.tree.topology import make_tree_state, simulate_coalescent_tree

from test_mcmc import check_tree_valid


def small_analysis(n=6, seed=0):
    rng = np.random.default_rng(seed)
    p, c, h, r = simulate_coalescent_tree(rng, np.zeros(n), 1.0)
    tree = make_tree_state(p, c, h, r)

    def lp(params, tree):
        return (
            constant_coalescent_loglik(tree.heights, n, params["pop"])
        )

    ops = [
        ScaleOperator(parameter="pop"),
        UniformNodeHeightOperator(weight=3.0),
        RootHeightScaleOperator(),
    ]
    return lp, ops, {"pop": jnp.asarray(1.0)}, tree


def test_smc_particles_roundtrip(tmp_path):
    lp, ops, params, tree = small_analysis()
    step = make_mcmc_step(lp, ops)
    folder = str(tmp_path / "particles")
    os.makedirs(folder)
    template = init_mcmc_state(params, tree, jax.random.PRNGKey(0), ops, lp)
    for i in range(4):
        st = init_mcmc_state(params, tree, jax.random.PRNGKey(i), ops, lp)
        save_checkpoint(os.path.join(folder, f"p{i:02d}"), st)
    parts = load_particles(folder, template)
    assert parts.log_posterior.shape == (4,)
    out = run_particles(step, parts, 200, out_folder=str(tmp_path / "out"))
    assert out.log_posterior.shape == (4,)
    assert np.all(np.isfinite(np.asarray(out.log_posterior)))
    # particles diverged (different keys)
    assert len(set(np.asarray(out.log_posterior).tolist())) > 1
    assert len([f for f in os.listdir(tmp_path / "out") if f.endswith(".npz")]) == 4


def test_insert_taxon_structure_and_likelihood():
    lp, ops, params, tree = small_analysis(n=5)
    n = 5
    # attach a new dated tip near tip 2
    dists = np.array([5.0, 4.0, 0.1, 3.0, 2.0])
    node, h_att = distance_based_attachment(tree, dists, new_tip_height=0.0)
    assert node == 2 or node >= n  # closest tip or a valid ancestor
    new_tree = insert_taxon(tree, node, 0.0, h_att)
    assert new_tree.n_taxa == n + 1
    check_tree_valid(
        new_tree.parent, new_tree.children, new_tree.heights,
        new_tree.root, n + 1,
    )
    # old tips keep their indices (heights unchanged)
    np.testing.assert_allclose(
        np.asarray(new_tree.heights[:n]), np.asarray(tree.heights[:n])
    )
    # resumed analysis on the expanded tree works
    def lp6(params, t):
        return constant_coalescent_loglik(t.heights, n + 1, params["pop"])

    step = make_mcmc_step(lp6, ops)
    st = init_mcmc_state(params, new_tree, jax.random.PRNGKey(3), ops, lp6)
    st, _ = jax.jit(lambda s: run_chain(step, s, 500))(st)
    assert np.isfinite(float(st.log_posterior))
    check_tree_valid(
        st.tree.parent, st.tree.children, st.tree.heights, st.tree.root, n + 1
    )


def test_insert_taxon_at_root_branch():
    tree = make_tree_state(
        parent=[2, 2, -1], children=[[-1, -1], [-1, -1], [0, 1]],
        heights=[0.0, 0.0, 1.0], root=2,
    )
    new_tree = insert_taxon(tree, attach_node=2, new_tip_height=0.0,
                            attach_height=2.0)
    assert int(new_tree.root) != int(tree.root)
    check_tree_valid(
        new_tree.parent, new_tree.children, new_tree.heights,
        new_tree.root, 3,
    )
    assert float(new_tree.heights[new_tree.root]) == 2.0


def test_treestat_balanced_vs_caterpillar():
    bal = "((A:1,B:1):1,(C:1,D:1):1);"
    cat = "(((A:1,B:1):1,C:2):1,D:3);"
    rows = treestat_report([bal, cat])
    assert rows[0]["cherryCount"] == 2 and rows[1]["cherryCount"] == 1
    assert rows[0]["collessImbalance"] == 0.0
    assert rows[1]["collessImbalance"] > 0.5
    assert rows[0]["rootHeight"] == 2.0 and rows[1]["rootHeight"] == 3.0
    assert rows[0]["treeLength"] == 6.0
    rpt = format_report(rows)
    assert "collessImbalance" in rpt and rpt.count("\n") == 2


def test_treestat_gamma_sign():
    """Pybus-Harvey sign convention: splits near the TIPS (long stem)
    give gamma > 0; splits near the ROOT give gamma < 0."""
    tipward = "((A:0.1,B:0.1):4.9,(C:0.2,D:0.2):4.8);"
    rootward = "((A:4.9,B:4.9):0.1,(C:4.8,D:4.8):0.2);"
    r = treestat_report([tipward, rootward])
    assert r[0]["gammaStatistic"] > 0 > r[1]["gammaStatistic"]
