"""Geo layer (polygon priors, KML, great circles, lattice walks, bridges)
and MG94 codon model (ref: src/dr/geo/*, src/dr/evomodel/substmodel/codon/
MG94HKYCodonModel.java)."""

import jax
import jax.numpy as jnp
import numpy as np

from beast_mcmc_tpu.models.geo import (
    brownian_bridge,
    geo_spatial_logpdf,
    great_circle_distance,
    lattice_rate_matrix,
    multi_region_logpdf,
    parse_kml_coordinates,
    point_in_polygon,
)
from beast_mcmc_tpu.models.substitution import gy94_eigen, mg94_eigen


SQUARE = jnp.asarray([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
# non-convex "C" shape
CSHAPE = jnp.asarray(
    [[0, 0], [3, 0], [3, 1], [1, 1], [1, 2], [3, 2], [3, 3], [0, 3]],
    jnp.float64,
)


def test_point_in_polygon_square_and_nonconvex():
    pts = jnp.asarray([[1.0, 1.0], [3.0, 1.0], [-0.1, 0.5], [1.9, 1.9]])
    got = np.asarray(point_in_polygon(pts, SQUARE))
    assert got.tolist() == [True, False, False, True]
    pts2 = jnp.asarray([[2.0, 1.5], [0.5, 1.5], [2.0, 0.5], [2.0, 2.5]])
    got2 = np.asarray(point_in_polygon(pts2, CSHAPE))
    # (2,1.5) is inside the notch -> outside the C
    assert got2.tolist() == [False, True, True, True]
    # Monte-Carlo area check (ray-cast correctness in bulk)
    rng = np.random.default_rng(0)
    pts3 = rng.uniform(0, 3, (20000, 2))
    frac = np.mean(np.asarray(point_in_polygon(jnp.asarray(pts3), CSHAPE)))
    area = 7.0 / 9.0  # C-shape area 7 in a 9 box
    assert abs(frac - area) < 0.02


def test_geo_logpdf_and_multiregion():
    assert float(geo_spatial_logpdf(jnp.asarray([1.0, 1.0]), SQUARE)) == 0.0
    assert float(geo_spatial_logpdf(jnp.asarray([5.0, 1.0]), SQUARE)) == -np.inf
    assert float(geo_spatial_logpdf(jnp.asarray([5.0, 1.0]), SQUARE,
                                    outside=True)) == 0.0
    far = jnp.asarray([[10.0, 10.0], [12.0, 10.0], [12.0, 12.0], [10.0, 12.0]])
    assert float(multi_region_logpdf(jnp.asarray([11.0, 11.0]),
                                     [SQUARE, far])) == 0.0
    assert float(multi_region_logpdf(jnp.asarray([11.0, 11.0]),
                                     [SQUARE, far], union=False)) == -np.inf


def test_kml_parsing():
    kml = """<Polygon><outerBoundaryIs><LinearRing><coordinates>
      0.0,0.0,0 2.0,0.0,0 2.0,2.0,0 0.0,2.0,0 0.0,0.0,0
    </coordinates></LinearRing></outerBoundaryIs></Polygon>"""
    rings = parse_kml_coordinates(kml)
    assert len(rings) == 1 and rings[0].shape == (4, 2)
    np.testing.assert_allclose(rings[0][1], [2.0, 0.0])


def test_great_circle():
    # London (51.5074, -0.1278) to Paris (48.8566, 2.3522) ~ 344 km
    d = float(great_circle_distance(jnp.asarray([51.5074, -0.1278]),
                                    jnp.asarray([48.8566, 2.3522])))
    assert abs(d - 344.0) < 5.0
    assert float(great_circle_distance(jnp.asarray([10.0, 20.0]),
                                       jnp.asarray([10.0, 20.0]))) == 0.0


def test_lattice_rate_matrix_generator_properties():
    valid = jnp.asarray([[True, True, False], [True, True, True]])
    q = np.asarray(lattice_rate_matrix(valid, rates=2.0))
    # rows sum to zero
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-12)
    # invalid cell (0,2)=index 2 has no transitions
    assert np.all(q[2] == 0.0) and np.all(q[:, 2] == 0.0)
    # (0,0) -> (0,1) and (1,0): rate 2 each
    assert q[0, 1] == 2.0 and q[0, 3] == 2.0 and q[0, 0] == -4.0
    # stationary distribution of symmetric walk is uniform on valid cells:
    # expm(Q*T) rows converge to uniform over the 5 valid cells
    from beast_mcmc_tpu.ops.expm import transition_probs_expm

    p = np.asarray(
        transition_probs_expm(jnp.asarray(q), jnp.asarray([[50.0]]))[0, 0]
    )
    np.testing.assert_allclose(p[0, [0, 1, 3, 4, 5]], 0.2, atol=1e-6)


def test_brownian_bridge_moments():
    key = jax.random.PRNGKey(0)
    start = jnp.asarray([0.0, 1.0])
    end = jnp.asarray([2.0, -1.0])
    n = 4000
    paths = jax.vmap(
        lambda k: brownian_bridge(k, start, end, 0.0, 1.0, precision=1.0,
                                  depth=4)
    )(jax.random.split(key, n))
    mid = np.asarray(paths[:, 8, :])  # midpoint t=0.5
    np.testing.assert_allclose(mid.mean(axis=0), [1.0, 0.0], atol=0.03)
    # bridge variance at midpoint: t(1-t) = 0.25
    np.testing.assert_allclose(mid.var(axis=0), 0.25, atol=0.03)
    # endpoints pinned
    np.testing.assert_allclose(
        np.asarray(paths[:, 0, :]),
        np.broadcast_to(np.asarray(start), (n, 2)),
        atol=0,
    )


def test_mg94_vs_gy94_consistency():
    """With alpha=1, MG94's beta plays GY94's omega role (same rate map up
    to normalisation); eigensystems must produce identical transition
    probabilities for beta=omega when alpha=1."""
    from beast_mcmc_tpu.ops.eigen import transition_probs

    codon_freqs = jnp.full((61,), 1.0 / 61.0, jnp.float64)
    kappa, omega = 3.0, 0.4
    e_gy = gy94_eigen(kappa, omega, codon_freqs)
    e_mg = mg94_eigen(1.0, omega, kappa, codon_freqs)
    p_gy = transition_probs(e_gy, jnp.asarray([0.3]))
    p_mg = transition_probs(e_mg, jnp.asarray([0.3]))
    np.testing.assert_allclose(np.asarray(p_mg), np.asarray(p_gy), atol=1e-10)
    # rows are probability vectors
    np.testing.assert_allclose(np.asarray(p_mg).sum(-1), 1.0, atol=1e-9)
    # alpha != 1 changes dS/dN balance: P must differ from GY94
    p_mg2 = transition_probs(mg94_eigen(2.0, omega, kappa, codon_freqs),
                             jnp.asarray([0.3]))
    assert np.abs(np.asarray(p_mg2) - np.asarray(p_gy)).max() > 1e-4
