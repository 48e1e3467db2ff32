"""Map projections, from-scratch closed forms (SURVEY.md M2/M18).

Replaces the reference's pyproj/shapely transforms:
- EPSG:4326 -> EPSG:3857 spherical Web-Mercator meters
  (robosat/tools/rasterize.py:38-61 feature_to_mercator)
- EPSG:4326 -> Mollweide (ESRI:54009) equal-area, used for areas/IoU
  (robosat/spatial/core.py:9-22 project_ea)
- EPSG:4326 <-> EPSG:3395 ellipsoidal Mercator, used for metric
  buffering (robosat/spatial/core.py:42-53 project_ws / tools/merge.py:35-39)

All vectorized numpy float64.
"""

from __future__ import annotations

import numpy as np

R_SPHERE = 6378137.0  # WGS84 semi-major axis (3857 uses the sphere)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_E = np.sqrt(WGS84_E2)


def to_webmercator(lon, lat):
    """EPSG:4326 deg -> EPSG:3857 meters (spherical)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R_SPHERE * np.radians(lon)
    y = R_SPHERE * np.arcsinh(np.tan(np.radians(lat)))
    return x, y


def from_webmercator(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_SPHERE)
    lat = np.degrees(np.arctan(np.sinh(y / R_SPHERE)))
    return lon, lat


def to_mercator_3395(lon, lat):
    """EPSG:4326 deg -> EPSG:3395 ellipsoidal Mercator meters
    (the isometric-latitude closed form)."""
    lon = np.asarray(lon, dtype=np.float64)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x = WGS84_A * np.radians(lon)
    esin = WGS84_E * np.sin(phi)
    y = WGS84_A * np.log(
        np.tan(np.pi / 4.0 + phi / 2.0)
        * ((1.0 - esin) / (1.0 + esin)) ** (WGS84_E / 2.0)
    )
    return x, y


def from_mercator_3395(x, y, iters: int = 8):
    """Inverse via fixed-point iteration on the conformal latitude."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WGS84_A)
    t = np.exp(-y / WGS84_A)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        esin = WGS84_E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - esin) / (1.0 + esin)) ** (WGS84_E / 2.0)
        )
    return lon, np.degrees(phi)


def to_mollweide(lon, lat, iters: int = 12):
    """EPSG:4326 deg -> Mollweide (ESRI:54009, sphere R=6371000)
    equal-area meters. Newton iteration for the auxiliary angle."""
    R = 6371000.0
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = phi.copy()
    target = np.pi * np.sin(phi)
    for _ in range(iters):
        denom = 2.0 + 2.0 * np.cos(2.0 * theta)
        step = np.where(
            np.abs(denom) < 1e-12,
            0.0,
            (2.0 * theta + np.sin(2.0 * theta) - target) / denom,
        )
        theta = theta - step
    x = R * (2.0 * np.sqrt(2.0) / np.pi) * lam * np.cos(theta)
    y = R * np.sqrt(2.0) * np.sin(theta)
    return x, y


def geodesic_area_m2(lon, lat) -> float:
    """Ring area in m^2 via equal-area (Mollweide) projection +
    shoelace — the reference's area property (tools/merge.py:79 uses
    int(round(project_ea(shape).area)))."""
    from robosat_ray.geo.polygon import shoelace_area

    x, y = to_mollweide(lon, lat)
    return abs(shoelace_area(np.asarray(x), np.asarray(y)))
