"""Empirical tree distribution, HIPSTR summary trees, and CoalGen.

- EmpiricalTreeOperator inside the jitted MH kernel must sample trees
  with frequencies matching softmax of per-tree posteriors (exact finite
  target distribution).
- HIPSTR must recover the dominant topology and can beat every sampled
  tree when the best splits never co-occur in one sample.
- CoalGen constant-population TMRCA must match E[T] = 2N(1-1/n).
"""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.apps.coalgen import (
    ConstantPopulation,
    ExponentialGrowth,
    simulate_demographic_tree,
    simulate_trees_nexus,
)
from beast_mcmc_tpu.apps.treeannotator import (
    TreeSample,
    hipstr_tree,
    read_trees_file,
    summarize_trees,
)
from beast_mcmc_tpu.inference.mcmc import (
    init_mcmc_state,
    make_mcmc_step,
    run_chain,
)
from beast_mcmc_tpu.tree.empirical import (
    EmpiricalTreeOperator,
    stack_trees,
    tree_at,
)
from beast_mcmc_tpu.tree.topology import make_tree_state, parse_newick


TAXA = ["a", "b", "c", "d"]
NEWICKS = [
    "((a:1,b:1):1,(c:1,d:1):1);",
    "((a:1,c:1):1,(b:1,d:1):1);",
    "((a:1,d:1):1,(b:1,c:1):1);",
]


def _samples():
    out = []
    for nwk in NEWICKS:
        p, c, h, r, t = parse_newick(nwk, taxa=TAXA)
        out.append(TreeSample(p, c, h, int(r), list(t)))
    return out


def test_empirical_tree_mcmc_matches_target_frequencies():
    trees = _samples()
    ets = stack_trees(trees)
    # identify trees by which tip is paired with 'a' -> root-child clade
    logw = jnp.asarray([0.0, 1.0, -0.5])

    def which_tree(tree):
        # the sibling of tip 0 under its parent identifies the topology
        pa = tree.parent[0]
        sib = jnp.where(tree.children[pa, 0] == 0,
                        tree.children[pa, 1], tree.children[pa, 0])
        return sib - 1  # tips 1,2,3 -> topology index 0,1,2

    def log_post(params, tree):
        return logw[which_tree(tree)]

    ops = [EmpiricalTreeOperator(trees=ets, weight=1.0)]
    step = make_mcmc_step(log_post, ops)
    state = init_mcmc_state({}, tree_at(ets, 0), jax.random.PRNGKey(3),
                            ops, log_post)

    n_steps = 6000
    state, drawn = jax.jit(
        lambda s: run_chain(step, s, n_steps, collect_every=1,
                            collector=lambda s: which_tree(s.tree))
    )(state)
    freq = np.bincount(np.asarray(drawn), minlength=3) / n_steps
    want = np.asarray(jax.nn.softmax(logw))
    np.testing.assert_allclose(freq, want, atol=0.03)


def test_hipstr_beats_mcc_on_disjoint_splits():
    """Sample where the best left-clade and best right-clade splits never
    co-occur: MCC must pick a sampled tree, HIPSTR combines the majority
    clades from different samples."""
    t1 = ["((a:1,b:1):2,((c:1,d:1):1,e:2):1);"] * 4
    t2 = ["((a:1,b:1):2,((c:1,e:1):1,d:2):1);"] * 3
    t3 = ["((a:1,c:1):2,((b:1,d:1):1,e:2):1);"] * 3
    taxa = ["a", "b", "c", "d", "e"]
    trees = []
    for nwk in t1 + t2 + t3:
        p, c, h, r, t = parse_newick(nwk, taxa=taxa)
        trees.append(TreeSample(p, c, h, int(r), list(t)))
    tree, support, ann = hipstr_tree(trees, burnin_fraction=0.0)
    # {a,b} appears 7/10 times and must be a clade of the HIPSTR tree
    ab = (1 << 0) | (1 << 1)
    from beast_mcmc_tpu.apps.treeannotator import _clades_of
    clades = set(_clades_of(tree).values())
    assert ab in clades
    assert support[ab] == 0.7
    # every internal node is annotated with a posterior in (0, 1]
    for node, a in ann.items():
        assert 0 < a["posterior"] <= 1.0
    # heights stay parent > child
    for i in range(len(tree.parent)):
        if tree.parent[i] >= 0:
            assert tree.heights[tree.parent[i]] > tree.heights[i]


def test_hipstr_agrees_with_mcc_on_unimodal_sample():
    trees = _samples() * 5 + _samples()[:1] * 5  # topology 0 dominates
    mcc, _, _ = summarize_trees(trees, burnin_fraction=0.0)
    hip, _, _ = hipstr_tree(trees, burnin_fraction=0.0)
    from beast_mcmc_tpu.apps.treeannotator import _clades_of
    assert set(_clades_of(mcc).values()) == set(_clades_of(hip).values())


def test_coalgen_constant_tmrca_expectation():
    rng = np.random.default_rng(0)
    n, pop = 6, 2.0
    reps = 2000
    tm = np.empty(reps)
    for i in range(reps):
        _, _, h, root = simulate_demographic_tree(
            rng, np.zeros(n), ConstantPopulation(pop))
        tm[i] = h[root]
    want = 2.0 * pop * (1.0 - 1.0 / n)
    se = tm.std() / np.sqrt(reps)
    assert abs(tm.mean() - want) < 4 * se


def test_coalgen_nexus_roundtrip_and_growth(tmp_path):
    taxa = [f"t{i}" for i in range(5)]
    text = simulate_trees_nexus(
        taxa, tip_dates=[0, 1, 2, 0, 1],
        demographic=ExponentialGrowth(2.0, 1.5), n_trees=20, seed=1)
    f = tmp_path / "sim.trees"
    f.write_text(text)
    trees = read_trees_file(str(f))
    assert len(trees) == 20
    assert sorted(trees[0].taxa) == sorted(taxa)
    # serial sampling: root must predate the oldest tip (height >= 2)
    for t in trees:
        assert t.heights[t.root] > 2.0
    # growth shrinks TMRCA vs constant at the same N0
    rng = np.random.default_rng(3)
    tm_g = np.mean([
        simulate_demographic_tree(rng, np.zeros(6),
                                  ExponentialGrowth(2.0, 2.0))[2][-1]
        for _ in range(300)])
    tm_c = np.mean([
        simulate_demographic_tree(rng, np.zeros(6),
                                  ConstantPopulation(2.0))[2][-1]
        for _ in range(300)])
    assert tm_g < tm_c
