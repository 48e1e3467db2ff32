"""Slippy-map / Web-Mercator tile math, vectorized numpy, from scratch.

Semantics match the reference's mercantile usage (robosat/tiles.py:34-42,
robosat/tools/cover.py:30, robosat/tools/rasterize.py:80) via the
closed-form slippy formulas:

    x = 2^z * (lon + 180) / 360
    y = 2^z * (1 - asinh(tan(lat_rad)) / pi) / 2

The engine's native vertical coordinate is the *normalized mercator y*
``my`` in [0, 1) (my = y / 2^z at any zoom), which makes tile
assignment pure linear math: ty = floor(my * 2^z).
"""

from __future__ import annotations

import numpy as np

WEB_MERCATOR_R = 6378137.0  # WGS84 spherical radius used by EPSG:3857


def lat_to_my(lat_deg):
    """Geodetic latitude (deg) -> normalized mercator y in [0, 1].

    my = (1 - asinh(tan(lat)) / pi) / 2 ; 0 at +85.051°, 1 at -85.051°.
    """
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    return (1.0 - np.arcsinh(np.tan(lat)) / np.pi) / 2.0


def my_to_lat(my):
    """Normalized mercator y -> geodetic latitude in degrees."""
    my = np.asarray(my, dtype=np.float64)
    return np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * my))))


def lon_to_mx(lon_deg):
    """Longitude (deg) -> normalized mercator x in [0, 1)."""
    return (np.asarray(lon_deg, dtype=np.float64) + 180.0) / 360.0


def mx_to_lon(mx):
    return np.asarray(mx, dtype=np.float64) * 360.0 - 180.0


def lonmy_to_tile(lon, my, z: int):
    """(lon deg, normalized mercator y) -> integer tile (tx, ty) at zoom z.

    Written with the exact op sequence mirrored in the DuckDB oracle:
    tx = floor((lon + 180.0) / 360.0 * 2^z), ty = floor(my * 2^z).
    Clamps to the valid tile range (edge values my=1.0, lon=180.0).
    """
    n = float(1 << z)
    lon = np.asarray(lon, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    ty = np.floor(my * n).astype(np.int64)
    hi = (1 << z) - 1
    return np.clip(tx, 0, hi), np.clip(ty, 0, hi)


def lonlat_to_tile(lon, lat, z: int):
    """Geodetic (lon, lat) -> tile, matching mercantile.tile semantics."""
    return lonmy_to_tile(lon, lat_to_my(lat), z)


def tile_bounds_lonmy(tx, ty, z: int):
    """Tile -> (west_lon, north_my, east_lon, south_my) in engine coords."""
    n = float(1 << z)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    west = tx / n * 360.0 - 180.0
    east = (tx + 1.0) / n * 360.0 - 180.0
    north = ty / n
    south = (ty + 1.0) / n
    return west, north, east, south


def tile_bounds_lonlat(tx, ty, z: int):
    """Tile -> (west, south, east, north) geodetic degrees.

    Matches mercantile.bounds as used at reference robosat/tiles.py:34.
    """
    west, north_my, east, south_my = tile_bounds_lonmy(tx, ty, z)
    return west, my_to_lat(south_my), east, my_to_lat(north_my)


def pixel_to_lonmy(tx, ty, z: int, dx, dy):
    """Fractional pixel offset (dx, dy in [0,1], origin top-left) inside a
    tile -> (lon, my). Reference semantics: robosat/tiles.py:19-42
    (pixel_to_location lerps inside tile bounds)."""
    n = float(1 << z)
    lon = (np.asarray(tx, np.float64) + np.asarray(dx, np.float64)) / n * 360.0 - 180.0
    my = (np.asarray(ty, np.float64) + np.asarray(dy, np.float64)) / n
    return lon, my


def cell_id(tx, ty, z: int):
    """Pack (tx, ty) at zoom z into one int64: tx * 2^z + ty."""
    return np.asarray(tx, dtype=np.int64) * np.int64(1 << z) + np.asarray(ty, dtype=np.int64)


def cell_to_tile(cell, z: int):
    cell = np.asarray(cell, dtype=np.int64)
    n = np.int64(1 << z)
    return cell // n, cell % n


def tile_range(minx, miny, maxx, maxy, z: int):
    """Bounding box in (lon, my) -> inclusive integer tile ranges.

    Replaces supermercado.burntiles.burn cover (reference
    robosat/tools/cover.py:30) for bbox cover: the set of tiles a bbox
    touches is the full (tx0..tx1) x (ty0..ty1) range.
    """
    tx0, ty0 = lonmy_to_tile(minx, miny, z)
    tx1, ty1 = lonmy_to_tile(maxx, maxy, z)
    return tx0, ty0, tx1, ty1


def k_ring(tx: int, ty: int, z: int, k: int = 1):
    """All tiles within Chebyshev distance k (the 8-neighborhood for k=1).

    Reference analog: adjacent-tile lookup at robosat/tiles.py:139-227.
    Clipped to the tile grid (no wraparound; matches reference behavior
    of treating missing neighbors as nodata)."""
    hi = (1 << z) - 1
    xs = range(max(0, tx - k), min(hi, tx + k) + 1)
    ys = range(max(0, ty - k), min(hi, ty + k) + 1)
    return [(x, y) for x in xs for y in ys]


def quadkey(tx, ty, z: int):
    """Bing-Maps quadkey as a Morton number: interleave the z bits of
    (tx, ty) with the y bit HIGH in each 2-bit digit (digit at level L
    = 2*y_bit + x_bit at bit z-L), so the numeric value equals the
    base-4 quadkey string read as an integer. Vectorized magic-number
    bit spreading (no per-row Python); z <= 31."""
    tx = np.asarray(tx, dtype=np.uint64)
    ty = np.asarray(ty, dtype=np.uint64)

    def spread(v: np.ndarray) -> np.ndarray:
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return (spread(tx) | (spread(ty) << np.uint64(1))).astype(np.int64)


def quadkey_str(tx, ty, z: int):
    """Textual Bing quadkey (length-z base-4 string per tile),
    vectorized: one (n, z) digit matrix -> ASCII bytes -> fixed-width
    string view (no per-row Python)."""
    qk = quadkey(tx, ty, z).astype(np.uint64)
    n = len(qk)
    arr = np.empty((n, z), dtype=np.uint8)
    for i in range(z):
        arr[:, i] = 48 + ((qk >> np.uint64(2 * (z - 1 - i))) & np.uint64(3))
    return np.ascontiguousarray(arr).view(f"S{z}").ravel().astype(str)


# public geohash base32 alphabet (Niemeyer's encoding: digits then
# letters, skipping a i l o)
GEOHASH_ALPHABET = b"0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_BITS = 15  # per axis -> 30-bit code -> 6 base32 chars


def geohash_cells(lon, my):
    """Geohash cell code over the engine plane: x = lon in [-180,180),
    y = north-up (1 - my). Each axis quantized to 15 bits by the same
    IEEE expression the SQL twin uses, then interleaved MSB-first with
    the LONGITUDE bit high in each pair (the public geohash bit order;
    quadkey() with swapped operands reuses the Morton spreader).
    -> int64 30-bit codes."""
    gx = np.minimum(
        np.maximum(np.floor((np.asarray(lon) + 180.0) / 360.0 * 32768.0), 0.0), 32767.0
    ).astype(np.int64)
    gy = np.minimum(
        np.maximum(np.floor((1.0 - np.asarray(my)) * 32768.0), 0.0), 32767.0
    ).astype(np.int64)
    return quadkey(gy, gx, GEOHASH_BITS)


def geohash_str(code):
    """30-bit geohash codes -> 6-char base32 strings, vectorized:
    (n, 6) 5-bit digit matrix -> alphabet LUT bytes -> fixed-width
    string view (no per-row Python)."""
    code = np.asarray(code, dtype=np.uint64)
    n = len(code)
    lut = np.frombuffer(GEOHASH_ALPHABET, dtype=np.uint8)
    arr = np.empty((n, 6), dtype=np.uint8)
    for i in range(6):
        arr[:, i] = lut[((code >> np.uint64(25 - 5 * i)) & np.uint64(31)).astype(np.int64)]
    return np.ascontiguousarray(arr).view("S6").ravel().astype(str)


def hilbert_d(tx, ty, order: int):
    """Hilbert-curve index of grid cells (the locality-preserving
    alternative to the Morton/quadkey order — adjacent cells are
    adjacent on the curve, which Morton does not guarantee across
    quadrant seams). Standard iterative xy->d walk (rot + reflect per
    level), fully vectorized: the per-level rotate/swap runs as numpy
    where-masks over the whole column. order <= 31; inputs in
    [0, 2^order)."""
    x = np.asarray(tx, dtype=np.int64).copy()
    y = np.asarray(ty, dtype=np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    s = np.int64(1) << np.int64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: when ry == 0, reflect (if rx) then swap
        refl = (ry == 0) & (rx == 1)
        x = np.where(refl, s - 1 - x, x)
        y = np.where(refl, s - 1 - y, y)
        swap = ry == 0
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, x, y)
        x, y = x2, y2
        s >>= 1
    return d


# hex binning (pointy-top axial grid — the planar analog of H3's hex
# cells). SQRT3_3 is a literal (the double nearest sqrt(3)/3) so the
# SQL twin states the identical constant instead of trusting two
# sqrt implementations.
SQRT3_3 = 0.5773502691896258
HEX_SIZE = 0.5  # plane units per hex circumradius


def hexbin_axial(x, y, size: float = HEX_SIZE):
    """(x, y) plane points -> axial hex coordinates (q, r) of the
    containing pointy-top hexagon: fractional axial transform, then
    cube rounding with floor(v + 0.5) (NOT banker's round — the SQL
    twin's FLOOR(v + 0.5) is the same everywhere), fixing the
    component with the largest rounding error. All whole-column numpy;
    every float op is mirrored 1:1 in the oracle."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    qf = (SQRT3_3 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    cx = qf
    cz = rf
    cy = -cx - cz
    rx = np.floor(cx + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(cz + 0.5)
    dx = np.abs(rx - cx)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = (~fix_x) & (dy > dz)
    fix_z = (~fix_x) & (~fix_y)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_z, -rx - ry, rz)
    # (the y component needs no output: axial keeps only q, r)
    del fix_y
    return q.astype(np.int64), r.astype(np.int64)
