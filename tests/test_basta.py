"""BASTA structured-coalescent tests.

Oracles:
1. one effective deme (zero migration, all tips in deme 0) == the exact
   constant coalescent with N_0 — BASTA's approximation is exact there;
2. an independent, readable numpy implementation of the reference
   recurrences (GenericBastaLikelihoodDelegate.java:813-1008) on random
   serial two-deme data;
3. gradient finiteness wrt migration rates and pop sizes (the role of the
   reference's StructuredCoalescentLikelihoodGradient).
"""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.basta import (
    basta_loglikelihood,
    basta_root_deme_distribution,
    migration_rate_matrix,
)
from beast_mcmc_tpu.models.coalescent import constant_coalescent_loglik
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree


def numpy_basta(tip_demes, parent, children, heights, q, pop_sizes):
    """Straightforward host-side BASTA (event loop with dicts)."""
    from scipy.linalg import expm as scipy_expm  # scipy is present via jax deps

    m = len(parent)
    n = (m + 1) // 2
    k = len(pop_sizes)
    order = sorted(range(m), key=lambda i: (heights[i], i >= n))
    p = {}
    logl = 0.0
    active = set()
    first = order[0]
    pv = np.zeros(k)
    pv[tip_demes[first]] = 1.0
    p[first] = pv
    active.add(first)
    for j in range(1, m):
        t0, t1 = heights[order[j - 1]], heights[order[j]]
        L = t1 - t0
        trans = scipy_expm(q.T * L)
        e = np.zeros(k); f = np.zeros(k); g = np.zeros(k); h = np.zeros(k)
        for l in list(active):
            start = p[l]
            end = trans @ start
            e += start; f += start**2; g += end; h += end**2
            p[l] = end
        logl -= L / 4.0 * np.sum((e * e - f + g * g - h) / pop_sizes)
        node = order[j]
        if node < n:
            pv = np.zeros(k)
            pv[tip_demes[node]] = 1.0
            p[node] = pv
            active.add(node)
        else:
            c1, c2 = children[node]
            entry = p[c1] * p[c2] / pop_sizes
            prob = entry.sum()
            logl += np.log(prob)
            p[node] = entry / prob
            active -= {c1, c2}
            active.add(node)
    return logl


def serial_tree(n=8, seed=0):
    rng = np.random.default_rng(seed)
    tip_h = np.sort(rng.uniform(0, 0.5, n))
    tip_h[0] = 0.0
    parent, children, heights, root = simulate_coalescent_tree(rng, tip_h, 1.0)
    return parent, children, heights, root, rng


def test_one_deme_reduces_to_constant_coalescent():
    parent, children, heights, root, rng = serial_tree()
    n = 8
    demes = jnp.zeros(n, jnp.int32)
    q = migration_rate_matrix(jnp.zeros(2), 2)
    got = float(
        basta_loglikelihood(
            demes, jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), q, jnp.asarray([0.7, 123.0]),
        )
    )
    ref = float(constant_coalescent_loglik(jnp.asarray(heights), n, 0.7))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_matches_numpy_oracle_two_demes():
    parent, children, heights, root, rng = serial_tree(n=10, seed=3)
    n = 10
    demes = rng.integers(0, 2, n)
    q = np.array([[-0.8, 0.8], [0.3, -0.3]])
    pops = np.array([0.5, 2.0])
    got = float(
        basta_loglikelihood(
            jnp.asarray(demes), jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), jnp.asarray(q), jnp.asarray(pops),
        )
    )
    ref = numpy_basta(demes, parent, children, heights, q, pops)
    np.testing.assert_allclose(got, ref, rtol=1e-8)


def test_matches_numpy_oracle_three_demes():
    parent, children, heights, root, rng = serial_tree(n=7, seed=11)
    n = 7
    demes = rng.integers(0, 3, n)
    rates = rng.uniform(0.1, 1.0, 6)
    q = np.asarray(migration_rate_matrix(jnp.asarray(rates), 3))
    pops = np.array([0.5, 2.0, 1.3])
    got = float(
        basta_loglikelihood(
            jnp.asarray(demes), jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), jnp.asarray(q), jnp.asarray(pops),
        )
    )
    ref = numpy_basta(demes, parent, children, heights, q, pops)
    np.testing.assert_allclose(got, ref, rtol=1e-8)


def test_gradients_finite():
    parent, children, heights, root, rng = serial_tree(n=6, seed=5)
    demes = jnp.asarray(rng.integers(0, 2, 6))

    def ll(rates, pops):
        q = migration_rate_matrix(rates, 2)
        return basta_loglikelihood(
            demes, jnp.asarray(parent), jnp.asarray(children),
            jnp.asarray(heights), q, pops,
        )

    g1, g2 = jax.grad(ll, argnums=(0, 1))(
        jnp.asarray([0.5, 0.2]), jnp.asarray([1.0, 2.0])
    )
    assert np.all(np.isfinite(np.asarray(g1)))
    assert np.all(np.isfinite(np.asarray(g2)))
    # finite-difference cross-check on a pop size
    eps = 1e-6
    f0 = float(ll(jnp.asarray([0.5, 0.2]), jnp.asarray([1.0, 2.0])))
    f1 = float(ll(jnp.asarray([0.5, 0.2]), jnp.asarray([1.0 + eps, 2.0])))
    np.testing.assert_allclose(float(g2[0]), (f1 - f0) / eps, rtol=1e-3)


def test_root_deme_distribution_sums_to_one():
    parent, children, heights, root, rng = serial_tree(n=6, seed=9)
    demes = jnp.asarray(rng.integers(0, 2, 6))
    q = migration_rate_matrix(jnp.asarray([0.4, 0.6]), 2)
    dist = basta_root_deme_distribution(
        demes, jnp.asarray(parent), jnp.asarray(children),
        jnp.asarray(heights), q, jnp.asarray([1.0, 2.0]),
    )
    np.testing.assert_allclose(float(jnp.sum(dist)), 1.0, rtol=1e-9)
    assert np.all(np.asarray(dist) >= 0)
