"""Road width heuristics + buffered road polygons (SURVEY.md M7;
reference robosat/osm/road.py:15-148: a per-highway-class lane/width
table, width derived from lanes / oneway / explicit width tags, then
the centerline buffered by width/2 into a polygon).

Same decision structure, re-expressed as vectorized table lookups; the
class table mirrors the reference's *shape* (class -> default lanes,
lane width) with representative public values.
"""

from __future__ import annotations

import numpy as np

from robosat_ray.geo.buffer import buffer_polyline

# highway class -> (default total lanes, meters per lane)
ROAD_CLASSES = {
    "motorway": (4, 3.75),
    "trunk": (3, 3.5),
    "primary": (2, 3.5),
    "secondary": (2, 3.25),
    "tertiary": (2, 3.0),
    "residential": (2, 2.75),
    "service": (1, 2.75),
    "unclassified": (2, 2.75),
}
DEFAULT_CLASS = ("unclassified", (2, 2.75))


def road_width_m(highway, lanes=None, oneway=False, explicit_width=None) -> float:
    """Width in meters for one way, following the reference's
    precedence: explicit width tag > lanes * lane_width > class
    default; oneway halves the default lane count (road.py:106-138)."""
    if explicit_width is not None and explicit_width > 0:
        return float(explicit_width)
    default_lanes, lane_w = ROAD_CLASSES.get(str(highway), DEFAULT_CLASS[1])
    if lanes is not None and lanes > 0:
        return float(lanes) * lane_w
    n = default_lanes / 2.0 if oneway else float(default_lanes)
    return max(n, 1.0) * lane_w


def road_widths_vec(highway: np.ndarray, lanes: np.ndarray, oneway: np.ndarray) -> np.ndarray:
    """Vectorized width table lookup for arrays of ways."""
    out = np.empty(len(highway), dtype=np.float64)
    for i in range(len(highway)):
        ln = int(lanes[i]) if lanes[i] is not None and lanes[i] == lanes[i] and lanes[i] > 0 else None
        out[i] = road_width_m(highway[i], ln, bool(oneway[i]))
    return out


def buffered_road_ring(xs_m: np.ndarray, ys_m: np.ndarray, width_m: float):
    """Centerline (meters plane) -> buffered road polygon ring, the
    degrees-free equivalent of road.py:140-142's
    `buffer(degrees(width/2/R))` (the engine buffers in a projected
    plane instead of degree-space)."""
    return buffer_polyline(xs_m, ys_m, width_m / 2.0)
