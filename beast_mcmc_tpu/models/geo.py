"""Geospatial priors and lattice diffusion (the dr.geo package role).

Functional equivalents of the reference's geography layer (ref:
src/dr/geo/GeoSpatialDistribution.java:74-96 — flat prior over a polygon;
MultiRegionGeoSpatialDistribution.java — union of polygons;
Polygon2D.java containsPoint2D; KMLCoordinates.java — KML <coordinates>
parsing; GreatCircleDistances.java; Lattice.java/InhomogeneousRandomWalk
.java — CTMC random walks on raster grids; MultivariateBrownianBridge
.java — recursive midpoint bridge simulation).

TPU-native design: point-in-polygon is a vectorised ray-cast over the
vertex array (no java.awt.geom.GeneralPath), bridges are fixed-depth
midpoint refinements (static shapes), and the lattice walk is a dense
rate matrix fed to the shared expm/eigen machinery.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

EARTH_RADIUS_KM = 6371.0


def point_in_polygon(points: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """Ray-cast containment test, vectorised over points.

    points [N,2] (x,y); vertices [V,2] closed or open ring (the closing
    edge V-1 -> 0 is implied). Matches Polygon2D.containsPoint2D for
    points off the boundary (boundary behaviour is measure-zero).
    """
    points = jnp.atleast_2d(points)
    x = points[:, 0][:, None]
    y = points[:, 1][:, None]
    vx = vertices[:, 0][None, :]
    vy = vertices[:, 1][None, :]
    vx2 = jnp.roll(vertices[:, 0], -1)[None, :]
    vy2 = jnp.roll(vertices[:, 1], -1)[None, :]
    # edge straddles the horizontal ray at y
    straddle = (vy > y) != (vy2 > y)
    # x coordinate where the edge crosses the ray
    t = (y - vy) / jnp.where(vy2 == vy, 1.0, vy2 - vy)
    cross_x = vx + t * (vx2 - vx)
    crossings = jnp.sum(straddle & (cross_x > x), axis=1)
    return (crossings % 2) == 1


def geo_spatial_logpdf(x: jnp.ndarray, vertices: jnp.ndarray,
                       outside: bool = False) -> jnp.ndarray:
    """Flat prior over a polygon region: 0 inside, -inf outside (ref:
    GeoSpatialDistribution.logPdf :74-96; `outside` inverts the region)."""
    inside = point_in_polygon(x[None, :], vertices)[0]
    ok = inside != outside
    return jnp.where(ok, 0.0, -jnp.inf)


def multi_region_logpdf(x: jnp.ndarray, polygons: Sequence[jnp.ndarray],
                        union: bool = True) -> jnp.ndarray:
    """Flat prior over a union (or intersection) of polygons (ref:
    MultiRegionGeoSpatialDistribution.java)."""
    inside = jnp.stack([point_in_polygon(x[None, :], v)[0] for v in polygons])
    ok = jnp.any(inside) if union else jnp.all(inside)
    return jnp.where(ok, 0.0, -jnp.inf)


def parse_kml_coordinates(text: str) -> list[np.ndarray]:
    """Extract polygon rings from KML <coordinates> blocks (ref:
    KMLCoordinates.java — lon,lat[,alt] whitespace-separated tuples).
    Returns a list of [V,2] (lon, lat) arrays, one per block. Host-side.
    """
    rings = []
    for block in re.findall(r"<coordinates>(.*?)</coordinates>", text,
                            re.DOTALL):
        pts = []
        for tok in block.split():
            parts = tok.split(",")
            if len(parts) >= 2:
                pts.append((float(parts[0]), float(parts[1])))
        if pts:
            ring = np.asarray(pts)
            # drop an explicit closing vertex
            if len(ring) > 1 and np.allclose(ring[0], ring[-1]):
                ring = ring[:-1]
            rings.append(ring)
    return rings


def great_circle_distance(latlon1: jnp.ndarray, latlon2: jnp.ndarray,
                          radius: float = EARTH_RADIUS_KM) -> jnp.ndarray:
    """Haversine great-circle distance in km; inputs in degrees, [...,2] =
    (lat, lon) (ref: GreatCircleDistances.java)."""
    p1 = jnp.deg2rad(latlon1)
    p2 = jnp.deg2rad(latlon2)
    dlat = p2[..., 0] - p1[..., 0]
    dlon = p2[..., 1] - p1[..., 1]
    a = (jnp.sin(dlat / 2) ** 2
         + jnp.cos(p1[..., 0]) * jnp.cos(p2[..., 0]) * jnp.sin(dlon / 2) ** 2)
    return 2.0 * radius * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))


def lattice_rate_matrix(valid: jnp.ndarray, rates=1.0) -> jnp.ndarray:
    """CTMC generator of a nearest-neighbour random walk on a raster grid
    (ref: Lattice.java / InhomogeneousRandomWalk.java — walks restricted
    to allowed cells, e.g. land). valid [R,C] bool; rates scalar or [R,C]
    per-cell jump rate. Returns Q [R*C, R*C] dense (grids here are small;
    the dense form rides the MXU through the shared expm path)."""
    r, c = valid.shape
    n = r * c
    rates = jnp.broadcast_to(jnp.asarray(rates, jnp.float64), (r, c))
    idx = jnp.arange(n).reshape(r, c)
    q = jnp.zeros((n, n))
    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        src_r = jnp.arange(r)
        # boolean mask of cells whose (dr,dc) neighbour exists and is valid
        shifted_valid = jnp.roll(valid, (-dr, -dc), axis=(0, 1))
        in_bounds = jnp.ones((r, c), bool)
        if dr == 1:
            in_bounds = in_bounds.at[-1, :].set(False)
        if dr == -1:
            in_bounds = in_bounds.at[0, :].set(False)
        if dc == 1:
            in_bounds = in_bounds.at[:, -1].set(False)
        if dc == -1:
            in_bounds = in_bounds.at[:, 0].set(False)
        can = valid & in_bounds & shifted_valid
        src = idx.ravel()
        dst = jnp.roll(idx, (-dr, -dc), axis=(0, 1)).ravel()
        w = jnp.where(can, rates, 0.0).ravel()
        q = q.at[src, dst].add(w)
    q = q - jnp.diag(jnp.sum(q, axis=1))
    return q


def brownian_bridge(key, start: jnp.ndarray, end: jnp.ndarray,
                    t0, t1, precision, depth: int = 6) -> jnp.ndarray:
    """Multivariate Brownian bridge by fixed-depth recursive midpoint
    refinement (ref: MultivariateBrownianBridge.divideConquerBrownianBridge
    — same midpoint variance (t1-t0)/4 / precision per level, but
    level-parallel: all 2^l midpoints of a level sample as one vmapped
    normal draw). Returns [2^depth + 1, D] path including endpoints."""
    d = start.shape[0]
    n = (1 << depth) + 1
    path = jnp.zeros((n, d), start.dtype)
    path = path.at[0].set(start).at[n - 1].set(end)
    span = (jnp.asarray(t1) - jnp.asarray(t0)) / jnp.asarray(precision)
    filled = jnp.zeros((n,), bool).at[0].set(True).at[n - 1].set(True)
    step = n - 1
    for level in range(depth):
        step_half = step // 2
        starts = jnp.arange(0, n - 1, step)
        mids = starts + step_half
        var = span * (step / (n - 1)) / 4.0
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (starts.shape[0], d), start.dtype)
        mid_vals = 0.5 * (path[starts] + path[starts + step]) + jnp.sqrt(var) * noise
        path = path.at[mids].set(mid_vals)
        step = step_half
    return path
