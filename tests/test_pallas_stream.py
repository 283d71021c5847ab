"""Parity of the HBM-streaming Pallas peeling kernel vs the XLA scan.

VERDICT r1 §weak-1: the resident kernel's VMEM plan cannot hold
benchmark1/Makona-shaped problems (1,441-1,610 taxa); the streaming
kernel (ops/pallas_stream.py) must agree with the scan path at >=1,000
taxa. Runs in Pallas interpret mode on the CPU CI backend; the same code
path compiles on a real chip (bench.py exercises it at 1,610 taxa).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beast_mcmc_tpu.ops.pallas_peeling import (
    peel_loglikelihood_pallas_auto,
    resident_plan_fits,
)
from beast_mcmc_tpu.ops.pallas_stream import (
    peel_loglikelihood_stream,
    peel_site_loglik_stream,
)
from beast_mcmc_tpu.ops.peeling import (
    peel_loglikelihood,
    peel_order_from_heights,
    peel_site_loglik,
)
from beast_mcmc_tpu.tree.topology import simulate_coalescent_tree


def _random_problem(n_taxa, c, s, p, seed=0):
    rng = np.random.default_rng(seed)
    parent, children, heights, root = simulate_coalescent_tree(
        rng, np.zeros(n_taxa), 1.0
    )
    children = jnp.asarray(children)
    heights = jnp.asarray(heights, jnp.float32)
    m = 2 * n_taxa - 1
    tips = jnp.asarray(
        (rng.random((n_taxa, s, p)) > 0.6).astype(np.float32) * 0.9 + 0.1
    )
    pm = rng.random((m, c, s, s)) * 0.2 + 0.01
    pm = jnp.asarray(pm / pm.sum(-1, keepdims=True), jnp.float32)
    freqs = jnp.full((s,), 1.0 / s, jnp.float32)
    cw = jnp.full((c,), 1.0 / c, jnp.float32)
    w = jnp.asarray(rng.integers(1, 5, size=p), jnp.float32)
    order = peel_order_from_heights(heights, n_taxa)
    return tips, children, order, root, pm, freqs, cw, w


@pytest.mark.parametrize(
    "n_taxa,c,s,p",
    [(6, 4, 4, 40), (33, 1, 4, 200), (64, 2, 4, 130)],
)
def test_stream_matches_scan_small(n_taxa, c, s, p):
    tips, children, order, root, pm, freqs, cw, w = _random_problem(
        n_taxa, c, s, p
    )
    ref = peel_site_loglik(tips, children, order, root, pm, freqs, cw)
    got = peel_site_loglik_stream(
        tips, children, order, root, pm, freqs, cw, True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_stream_matches_scan_1000_taxa():
    """The VERDICT 'done' criterion: scan-vs-Pallas parity at >=1,000 taxa
    (a shape the resident kernel cannot plan)."""
    n_taxa, c, s, p = 1025, 2, 4, 128
    assert not resident_plan_fits(2 * n_taxa - 1, c, s)
    tips, children, order, root, pm, freqs, cw, w = _random_problem(
        n_taxa, c, s, p, seed=3
    )
    ref = peel_loglikelihood(tips, children, order, root, pm, freqs, cw, w)
    got = peel_loglikelihood_stream(
        tips, children, order, root, pm, freqs, cw, w, True
    )
    assert np.isfinite(float(ref))
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-6)


def test_auto_dispatch_routes_by_shape():
    # small -> resident plan fits; large -> it must not
    assert resident_plan_fits(11, 4, 4)
    assert not resident_plan_fits(2 * 1441 - 1, 4, 4)
    # auto wrapper agrees with the scan on a small interpret-mode problem
    tips, children, order, root, pm, freqs, cw, w = _random_problem(
        12, 2, 4, 64, seed=5
    )
    ref = peel_loglikelihood(tips, children, order, root, pm, freqs, cw, w)
    got = peel_loglikelihood_pallas_auto(
        tips, children, order, root, pm, freqs, cw, w, True
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-6)


def test_stream_codon_states_dot_path():
    """S=61 exercises the MXU dot matvec branch."""
    tips, children, order, root, pm, freqs, cw, w = _random_problem(
        9, 1, 61, 40, seed=7
    )
    ref = peel_site_loglik(tips, children, order, root, pm, freqs, cw)
    got = peel_site_loglik_stream(
        tips, children, order, root, pm, freqs, cw, True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_stream_gradients_match_scan():
    """The remat VJP must reproduce the scan path's linear-time adjoint."""
    tips, children, order, root, pm, freqs, cw, w = _random_problem(
        16, 2, 4, 64, seed=11
    )

    def f_scan(pm_):
        return peel_loglikelihood(
            tips, children, order, root, pm_, freqs, cw, w
        )

    def f_stream(pm_):
        return peel_loglikelihood_stream(
            tips, children, order, root, pm_, freqs, cw, w, True
        )

    g_scan = jax.grad(f_scan)(pm)
    g_stream = jax.grad(f_stream)(pm)
    np.testing.assert_allclose(
        np.asarray(g_stream), np.asarray(g_scan), rtol=1e-5, atol=1e-7
    )
