"""Kernel-level op tests: fixed-iteration special functions and the
tournament Jacobi eigensolver vs scipy/numpy oracles."""

import jax.numpy as jnp
import numpy as np
import scipy.special as sps
import scipy.stats as sstats

from beast_mcmc_tpu.ops.jacobi import jacobi_eigh
from beast_mcmc_tpu.ops.special import gamma_quantile, gammainc_fixed
from beast_mcmc_tpu.ops.eigen import reversible_eigen, transition_probs


def test_gammainc_fixed_vs_scipy():
    rng = np.random.default_rng(0)
    a = np.concatenate([[0.01, 0.05, 0.137, 0.5, 1.0, 2.0, 10.0, 100.0],
                        rng.uniform(0.02, 50, 40)])
    for aa in a:
        xs = sstats.gamma.ppf([0.01, 0.125, 0.5, 0.875, 0.99], aa)
        got = np.asarray(gammainc_fixed(aa, jnp.asarray(xs)))
        want = sps.gammainc(aa, xs)
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-13)


def test_gamma_quantile_vs_scipy_wide_range():
    p = jnp.array([0.005, 0.125, 0.375, 0.625, 0.875, 0.995])
    for a in [0.02, 0.05, 0.137064, 0.3, 0.587649, 1.0, 2.0, 10.0, 200.0]:
        q = gamma_quantile(p, a, 1.0 / a)
        expected = sstats.gamma.ppf(np.asarray(p), a, scale=1.0 / a)
        np.testing.assert_allclose(np.asarray(q), expected, rtol=1e-9)


def test_jacobi_eigh_random_symmetric():
    rng = np.random.default_rng(1)
    for s in [2, 4, 5, 20, 61]:
        m = rng.standard_normal((s, s))
        a = (m + m.T) / 2
        w, v = jacobi_eigh(jnp.asarray(a), sweeps=12)
        w = np.asarray(w)
        v = np.asarray(v)
        # reconstruction + orthogonality
        np.testing.assert_allclose(v @ np.diag(w) @ v.T, a, atol=1e-10)
        np.testing.assert_allclose(v.T @ v, np.eye(s), atol=1e-11)
        np.testing.assert_allclose(np.sort(w), np.linalg.eigvalsh(a), atol=1e-10)


def test_reversible_eigen_reconstructs_q():
    rng = np.random.default_rng(2)
    for s in [4, 20]:
        freqs = rng.dirichlet(np.ones(s))
        r = rng.uniform(0.1, 2.0, (s, s))
        r = (r + r.T) / 2
        eig = reversible_eigen(jnp.asarray(r), jnp.asarray(freqs))
        q = np.asarray(eig.U) @ np.diag(np.asarray(eig.values)) @ np.asarray(eig.U_inv)
        # generator properties: rows sum to 0, mean rate 1, pi stationary
        np.testing.assert_allclose(q.sum(1), 0.0, atol=1e-10)
        np.testing.assert_allclose(-(freqs * np.diag(q)).sum(), 1.0, atol=1e-10)
        np.testing.assert_allclose(freqs @ q, 0.0, atol=1e-10)
        # P(t) rows are probabilities
        p = np.asarray(transition_probs(eig, jnp.asarray([0.05, 1.0])))
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-9)
        assert (p >= 0).all()
