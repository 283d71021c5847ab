"""Thorney constrained-tree machinery end-to-end (VERDICT r1 item 5).

A multifurcating constraints tree is randomly resolved to a binary
start; a chain of constrained NNI + node-height moves samples under the
Poisson branch-length likelihood; every constraints clade must remain
monophyletic in every sampled tree while the topology inside polytomies
actually mixes. (ref: ConstrainedTreeModel.java:45,
PoissonBranchLengthLikelihoodDelegate.java:39-56.)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)
from beast_mcmc_tpu.inference.operators import (
    RootHeightScaleOperator,
    ScaleOperator,
    UniformNodeHeightOperator,
)
from beast_mcmc_tpu.models.thorney import poisson_branch_length_loglik
from beast_mcmc_tpu.tree.constrained import (
    ConstrainedNNIOperator,
    build_constrained_tree,
    clades_of_constraints,
    parse_multifurcating_newick,
)
from beast_mcmc_tpu.tree.topology import make_tree_state


def _random_constraints_newick(rng, n_tips, max_poly=6):
    """Random multifurcating tree over taxon names t0..t{n-1}."""
    units = [f"t{i}" for i in range(n_tips)]
    while len(units) > 1:
        k = min(len(units), int(rng.integers(2, max_poly + 1)))
        idx = rng.choice(len(units), size=k, replace=False)
        group = [units[i] for i in idx]
        units = [u for t, u in enumerate(units) if t not in set(idx)]
        units.append("(" + ",".join(group) + ")")
    return units[0] + ";"


def _descendant_sets(parent, children, root, n_tips, names):
    out = {}
    order = []
    stack = [int(root)]
    post = []
    while stack:
        n = stack.pop()
        post.append(n)
        for c in children[n]:
            if c >= 0:
                stack.append(int(c))
    sets = {}
    for n in reversed(post):
        if n < n_tips:
            sets[n] = frozenset([names[n]])
        else:
            sets[n] = sets[int(children[n][0])] | sets[int(children[n][1])]
    return set(sets[n] for n in sets if n >= n_tips)


def test_constrained_chain_preserves_clades_and_mixes():
    rng = np.random.default_rng(5)
    newick = _random_constraints_newick(rng, 40)
    parent, children, heights, root, groups, names = build_constrained_tree(
        newick, rng
    )
    n_tips = len(names)
    tree0 = make_tree_state(parent, children, heights, root)
    constraints = set(clades_of_constraints(newick))

    # synthetic mutation counts from the start tree's branch lengths
    t = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0)
    muts = jnp.asarray(rng.poisson(t * 100.0 + 0.5))

    def log_post(params, tree):
        return poisson_branch_length_loglik(
            muts, tree.parent, tree.heights, params["clock.rate"], 100.0
        )

    ops = [
        ConstrainedNNIOperator(groups=groups, weight=10.0),
        UniformNodeHeightOperator(weight=10.0),
        RootHeightScaleOperator(weight=2.0),
        ScaleOperator(parameter="clock.rate", weight=2.0),
    ]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(
        {"clock.rate": jnp.asarray(1.0)}, tree0, jax.random.PRNGKey(3),
        ops, log_post,
    )
    state, trace = jax.jit(
        lambda s: run_chain(
            step, s, 6000, 500,
            lambda st: {"parent": st.tree.parent,
                        "children": st.tree.children,
                        "root": st.tree.root},
        )
    )(state)
    assert np.isfinite(float(state.log_posterior))
    # NNI moves were accepted (topology mixes inside polytomies)
    assert int(state.op_accept[0]) > 10, int(state.op_accept[0])

    topo_ids = set()
    for k in range(len(trace["root"])):
        clades = _descendant_sets(
            np.asarray(trace["parent"][k]), np.asarray(trace["children"][k]),
            int(trace["root"][k]), n_tips, names,
        )
        # every constraints clade (non-trivial) still monophyletic
        for c in constraints:
            if len(c) < n_tips:
                assert c in clades, f"constraint clade broken: {sorted(c)}"
        topo_ids.add(frozenset(clades))
    assert len(topo_ids) > 1, "topology never changed"


def test_thorney_height_sampling_speed_1000_tips():
    """Node-height-only thorney chain on 1,000 tips runs and moves (the
    10^4-tip >100 states/s criterion is measured on-chip by bench.py)."""
    rng = np.random.default_rng(9)
    from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree

    n = 1000
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n), 1.0
    )
    tree0 = make_tree_state(parent, children, heights, root)
    t = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0)
    muts = jnp.asarray(rng.poisson(t * 30.0))

    def log_post(params, tree):
        return poisson_branch_length_loglik(
            muts, tree.parent, tree.heights, params["clock.rate"], 30.0
        )

    ops = [
        UniformNodeHeightOperator(weight=10.0),
        RootHeightScaleOperator(weight=1.0),
        ScaleOperator(parameter="clock.rate", weight=1.0),
    ]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(
        {"clock.rate": jnp.asarray(1.0)}, tree0, jax.random.PRNGKey(0),
        ops, log_post,
    )
    run = jax.jit(lambda s: run_chain(step, s, 2000)[0])
    state = run(state)
    assert np.isfinite(float(state.log_posterior))
    assert int(state.op_accept.sum()) > 100


def test_constrained_uspr_preserves_clades_and_mixes():
    """ConstrainedUniformSPROperator (ref: thorney
    UniformSubtreePruneRegraft.java via ConstrainedTreeOperator): SPR +
    height resampling inside polytomy groups — constraint clades must
    stay monophyletic while the topology mixes."""
    from beast_mcmc_tpu.tree.constrained import ConstrainedUniformSPROperator

    rng = np.random.default_rng(9)
    newick = _random_constraints_newick(rng, 40)
    parent, children, heights, root, groups, names = build_constrained_tree(
        newick, rng
    )
    n_tips = len(names)
    tree0 = make_tree_state(parent, children, heights, root)
    constraints = set(clades_of_constraints(newick))

    t = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0)
    muts = jnp.asarray(rng.poisson(t * 100.0 + 0.5))

    def log_post(params, tree):
        return poisson_branch_length_loglik(
            muts, tree.parent, tree.heights, params["clock.rate"], 100.0
        )

    ops = [
        ConstrainedUniformSPROperator(groups=groups, weight=10.0),
        UniformNodeHeightOperator(weight=5.0),
        RootHeightScaleOperator(weight=2.0),
        ScaleOperator(parameter="clock.rate", weight=2.0),
    ]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state(
        {"clock.rate": jnp.asarray(1.0)}, tree0, jax.random.PRNGKey(4),
        ops, log_post,
    )
    state, trace = jax.jit(
        lambda s: run_chain(
            step, s, 6000, 500,
            lambda st: {"parent": st.tree.parent,
                        "children": st.tree.children,
                        "root": st.tree.root},
        )
    )(state)
    assert np.isfinite(float(state.log_posterior))
    assert int(state.op_accept[0]) > 10, int(state.op_accept[0])

    topo_ids = set()
    for k in range(len(trace["root"])):
        clades = _descendant_sets(
            np.asarray(trace["parent"][k]), np.asarray(trace["children"][k]),
            int(trace["root"][k]), n_tips, names,
        )
        for c in constraints:
            if len(c) < n_tips:
                assert c in clades, f"constraint clade broken: {sorted(c)}"
        topo_ids.add(frozenset(clades))
    assert len(topo_ids) > 1, "topology never changed"
