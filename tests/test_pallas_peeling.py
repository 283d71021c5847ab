"""Pallas peeling kernel parity (interpret mode on the CPU CI backend).

The compiled-TPU path is validated by bench runs; here the kernel's
numerics (tip seeding, node loop, rescaling accumulator, root reduction,
pattern padding) must match the reference JAX scan exactly, and the VJP
must agree with the scan's gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.sitemodel import discrete_gamma_rates
from beast_mcmc_tpu.models.substitution import gtr_eigen
from beast_mcmc_tpu.models.treelikelihood import branch_transition_matrices
from beast_mcmc_tpu.ops.pallas_peeling import peel_site_loglik_pallas
from beast_mcmc_tpu.ops.peeling import (
    pad_patterns,
    peel_order_from_heights,
    peel_site_loglik,
)

from fixtures import primate_patterns, primate_tree


def setup(dtype=jnp.float32):
    pats = primate_patterns()
    parent, children, heights, root, taxa = primate_tree()
    tips = jnp.asarray(np.swapaxes(pats.tip_partials(), 1, 2), dtype)
    w = jnp.asarray(pats.weights, dtype)
    freqs = jnp.asarray(pats.empirical_frequencies(), dtype)
    eig = gtr_eigen(jnp.asarray([1.0, 2.0, 0.7, 1.1, 3.0, 1.0], dtype), freqs)
    cr, cw = discrete_gamma_rates(jnp.asarray(0.5, dtype), 4, dtype=dtype)
    pm = branch_transition_matrices(
        eig, jnp.asarray(parent), jnp.asarray(heights, dtype), 1.0, cr
    )
    order = peel_order_from_heights(jnp.asarray(heights, dtype), len(taxa))
    return tips, w, jnp.asarray(children), order, jnp.asarray(root), pm, freqs, cw


def test_pallas_site_loglik_parity():
    tips, w, children, order, root, pm, freqs, cw = setup()
    ref = peel_site_loglik(tips, children, order, root, pm, freqs, cw)
    got = peel_site_loglik_pallas(
        tips, children, order, root, pm, freqs, cw, True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6)


def test_pallas_handles_nondivisible_patterns():
    tips, w, children, order, root, pm, freqs, cw = setup()
    tips61 = tips[:, :, :61]  # force internal padding
    ref = peel_site_loglik(tips61, children, order, root, pm, freqs, cw)
    got = peel_site_loglik_pallas(
        tips61, children, order, root, pm, freqs, cw, True
    )
    assert got.shape == (61,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6)


def test_pallas_vjp_matches_scan():
    tips, w, children, order, root, pm, freqs, cw = setup()

    def total(path, pm):
        f = peel_site_loglik if path == "scan" else (
            lambda *a: peel_site_loglik_pallas(*a, True)
        )
        return jnp.dot(w, f(tips, children, order, root, pm, freqs, cw))

    g_ref = jax.grad(lambda pm: total("scan", pm))(pm)
    g_pal = jax.grad(lambda pm: total("pallas", pm))(pm)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )
