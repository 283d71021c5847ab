"""Mesh-sharding parity and AlloppNet MUL-tree tests."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.apps.benchmarks import build_analysis
from beast_mcmc_tpu.models.alloppnet import (
    AlloppNetwork,
    alloppnet_gene_tree_loglik,
    flip_assignment,
    mul_tree,
)
from beast_mcmc_tpu.models.msc import multispecies_coalescent_loglik
from beast_mcmc_tpu.parallel.mesh import make_mesh, pattern_sharding


def test_pattern_sharded_likelihood_matches_unsharded():
    """Site-pattern sharding over the 8-virtual-device mesh changes
    nothing numerically: the pjit program inserts the psum (SURVEY §5.7 —
    patterns are the reference's '-beagle_instances' split axis)."""
    assert len(jax.devices()) >= 8
    log_post, _, params0, tree0, aux = build_analysis(
        n_taxa=8, n_patterns=64, model="gtr_gamma", pad_multiple=8
    )
    expected = float(jax.jit(log_post)(params0, tree0))

    mesh = make_mesh(1, 8)
    tips = jax.device_put(aux["tips"], pattern_sharding(mesh, 2))
    weights = jax.device_put(aux["weights"], pattern_sharding(mesh, 0))
    from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
    from beast_mcmc_tpu.models.substitution import gtr_eigen
    from beast_mcmc_tpu.models.treelikelihood import tree_loglikelihood

    freqs = aux["freqs"]

    def sharded_ll(params, tree):
        eig = gtr_eigen(params["gtr.rates"], freqs)
        rates, cat_w = discrete_gamma_rates(params["alpha"], 4)
        return tree_loglikelihood(
            tips, weights, tree.parent, tree.children, tree.heights,
            tree.root, eig, freqs, rates, cat_w, params["clock.rate"],
        )

    with mesh:
        got = float(jax.jit(sharded_ll)(params0, tree0))
    # prior part is pattern-independent: compare likelihood-only via the
    # unsharded likelihood closure
    expected_ll = float(jax.jit(aux["log_lik"])(params0, tree0))
    np.testing.assert_allclose(got, expected_ll, rtol=1e-10)
    assert np.isfinite(expected)


def _tiny_network(leg_a=0, leg_b=1, hyb=0.5, dip_root_h=1.0, tet_h=0.3):
    """d=2 diploid tips (root at dip_root_h), k=1 tetraploid tip."""
    it, ft = jnp.int32, jnp.float64
    dip_parent = jnp.asarray([2, 2, -1], it)
    dip_children = jnp.asarray([[-1, -1], [-1, -1], [0, 1]], it)
    dip_heights = jnp.asarray([0.0, 0.0, dip_root_h], ft)
    tet_parent = jnp.asarray([-1], it)
    tet_children = jnp.asarray([[-1, -1]], it)
    tet_heights = jnp.asarray([tet_h], ft)
    return AlloppNetwork(
        dip_parent=dip_parent, dip_children=dip_children,
        dip_heights=dip_heights, dip_root=jnp.asarray(2, it),
        tet_parent=tet_parent, tet_children=tet_children,
        tet_heights=tet_heights, tet_root=jnp.asarray(0, it),
        leg_a=jnp.asarray(leg_a, it), leg_b=jnp.asarray(leg_b, it),
        hyb_height=jnp.asarray(hyb, ft),
    )


def test_mul_tree_structure_and_validity():
    net = _tiny_network(tet_h=0.0)
    parent, children, heights, root, valid = map(np.asarray, mul_tree(net))
    assert bool(valid)
    m = parent.shape[0]
    assert m == 7
    assert parent[root] == -1
    for node in range(m):
        p = parent[node]
        if p >= 0:
            assert node in children[p], (node, p, children[p])
            assert heights[p] > heights[node]
    # both splice nodes at the hybridization height
    assert heights[5] == 0.5 and heights[6] == 0.5
    # invalid when legs coincide or hyb height outside the leg edge
    assert not bool(mul_tree(_tiny_network(leg_a=0, leg_b=0))[-1])
    assert not bool(mul_tree(_tiny_network(hyb=1.5))[-1])
    # invalid when the tetraploid root is older than the hybridization
    assert not bool(mul_tree(_tiny_network(tet_h=0.6))[-1])


def test_alloppnet_likelihood_matches_hand_built_mul_tree():
    """The spliced MUL-tree gives exactly the MSC likelihood of the
    equivalent hand-built 4-tip species tree (validates the array
    surgery, ref: AlloppMulLabTree construction)."""
    net = _tiny_network(tet_h=0.0)
    parent, children, heights, root, valid = mul_tree(net)

    # hand-built MUL-tree: tips d0,d1,tA,tB; spliceA=(d0,tA)@0.5,
    # spliceB=(d1,tB)@0.5, root=(spliceA, spliceB)@1.0
    hp = jnp.asarray([5, 6, 5, 6, -1, 4, 4], jnp.int32)
    hh = jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0, 0.5, 0.5], jnp.float64)
    np.testing.assert_array_equal(np.asarray(parent), np.asarray(hp))
    np.testing.assert_allclose(np.asarray(heights), np.asarray(hh))

    # one gene tree with one sequence per MUL tip
    gp = jnp.asarray([4, 4, 5, 5, 6, 6, -1], jnp.int32)
    gc = jnp.asarray(
        [[-1, -1], [-1, -1], [-1, -1], [-1, -1], [0, 1], [2, 3], [4, 5]],
        jnp.int32,
    )
    gh = jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.2, 1.4, 2.0], jnp.float64)
    tip_species = jnp.asarray([0, 1, 2, 3], jnp.int32)
    pops = jnp.full((7,), 1.7, jnp.float64)

    got = alloppnet_gene_tree_loglik(gp, gc, gh, tip_species, net, pops)
    want = multispecies_coalescent_loglik(gp, gc, gh, tip_species, hp, hh, pops)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-12)
    assert np.isfinite(float(got))

    # sub-genome reassignment swaps the pair's tips
    flipped = flip_assignment(tip_species, 2, 3, d=2, k=1)
    np.testing.assert_array_equal(np.asarray(flipped), [0, 1, 3, 2])
