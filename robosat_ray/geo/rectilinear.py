"""Exact rectilinear morphology: union cover-grids, square-buffer
closing (dilate then erode), and boundary ring extraction — the
engine's from-scratch replacement for the reference merge chain
(robosat/tools/merge.py:63-81: per component `union(buffered shapes)`
-> `buffer(-threshold)` -> orient CCW -> area) for axis-aligned rect
members. Everything operates on coordinate-compressed boolean grids,
so results are exact at float precision (no rasterization error).

Buffer semantics: the reference buffers with shapely's Euclidean disc
in a projected plane; the engine uses the anisotropic L-infinity
square (tx, ty) in the (lon, my) plane — exact for rectilinear
inputs, and the component graph built on the same semantics stays
consistent (stages/merge.py EdgeFinder).

Orientation convention: exterior rings have POSITIVE shoelace area in
(x=lon, y=my) axes, holes negative — mirroring the reference's
`shapely.geometry.polygon.orient(merged, sign=1.0)`.
"""

from __future__ import annotations

import numpy as np


def union_cover_grid(minx, miny, maxx, maxy):
    """Rects -> (xs, ys, cov): compressed coordinate axes + boolean
    cell coverage of the union."""
    minx = np.asarray(minx, np.float64)
    miny = np.asarray(miny, np.float64)
    maxx = np.asarray(maxx, np.float64)
    maxy = np.asarray(maxy, np.float64)
    xs = np.unique(np.concatenate([minx, maxx]))
    ys = np.unique(np.concatenate([miny, maxy]))
    cov = np.zeros((max(len(xs) - 1, 0), max(len(ys) - 1, 0)), dtype=bool)
    i0 = np.searchsorted(xs, minx)
    i1 = np.searchsorted(xs, maxx)
    j0 = np.searchsorted(ys, miny)
    j1 = np.searchsorted(ys, maxy)
    for a, b, c, d in zip(i0, i1, j0, j1):
        cov[a:b, c:d] = True
    return xs, ys, cov


def grid_area(xs, ys, cov) -> float:
    if cov.size == 0:
        return 0.0
    return float((np.outer(np.diff(xs), np.diff(ys))[cov]).sum())


def _snap_vals(vals: np.ndarray, originals: np.ndarray, rel: float = 1e-12) -> np.ndarray:
    """Snap values within a relative tolerance of an original input
    coordinate back to it — the ±t dilate/erode roundtrip is not
    float-exact (2.3 - 0.3 != 2.0), and without snapping a singleton
    component's closing would differ from its own rect by 1 ulp."""
    if len(originals) == 0 or len(vals) == 0:
        return vals
    o = np.unique(originals)
    pos = np.clip(np.searchsorted(o, vals), 0, len(o) - 1)
    lo = o[np.maximum(pos - 1, 0)]
    hi = o[pos]
    tol = rel * np.maximum(1.0, np.abs(vals))
    out = np.where(
        np.abs(vals - hi) <= tol, hi, np.where(np.abs(vals - lo) <= tol, lo, vals)
    )
    return out


def closing_grid(minx, miny, maxx, maxy, tx: float, ty: float):
    """Exact closing (dilate by the (tx, ty) square, then erode) of a
    rect union; returns the (xs, ys, cov) grid of the result.

    Erosion via complement: E = shrunk-frame \\ dilate(D^c), where D is
    the dilated union and the frame is bbox(D) — any point of the
    shrunk frame has its full square inside the frame, so only the
    in-frame complement can block it."""
    dx0 = np.asarray(minx, np.float64) - tx
    dy0 = np.asarray(miny, np.float64) - ty
    dx1 = np.asarray(maxx, np.float64) + tx
    dy1 = np.asarray(maxy, np.float64) + ty
    xs, ys, cov = union_cover_grid(dx0, dy0, dx1, dy1)
    if cov.size == 0:
        return xs, ys, cov
    fx0, fy0, fx1, fy1 = xs[0], ys[0], xs[-1], ys[-1]
    # uncovered cells of D within the frame, dilated by (tx, ty)
    ii, jj = np.nonzero(~cov)
    cx0, cy0 = xs[ii] - tx, ys[jj] - ty
    cx1, cy1 = xs[ii + 1] + tx, ys[jj + 1] + ty
    # result axes: dilated-complement bounds + shrunk frame bounds,
    # clipped to the shrunk frame
    ox = np.concatenate([np.asarray(minx, np.float64), np.asarray(maxx, np.float64)])
    oy = np.concatenate([np.asarray(miny, np.float64), np.asarray(maxy, np.float64)])
    gx0, gy0 = _snap_vals(np.array([fx0 + tx]), ox)[0], _snap_vals(np.array([fy0 + ty]), oy)[0]
    gx1, gy1 = _snap_vals(np.array([fx1 - tx]), ox)[0], _snap_vals(np.array([fy1 - ty]), oy)[0]
    if gx0 >= gx1 or gy0 >= gy1:
        return np.array([]), np.array([]), np.zeros((0, 0), dtype=bool)
    cx0 = np.clip(_snap_vals(cx0, ox), gx0, gx1)
    cx1 = np.clip(_snap_vals(cx1, ox), gx0, gx1)
    cy0 = np.clip(_snap_vals(cy0, oy), gy0, gy1)
    cy1 = np.clip(_snap_vals(cy1, oy), gy0, gy1)
    X2 = np.unique(np.concatenate([cx0, cx1, [gx0, gx1]]))
    Y2 = np.unique(np.concatenate([cy0, cy1, [gy0, gy1]]))
    out = np.ones((len(X2) - 1, len(Y2) - 1), dtype=bool)
    a = np.searchsorted(X2, cx0)
    b = np.searchsorted(X2, cx1)
    c = np.searchsorted(Y2, cy0)
    d = np.searchsorted(Y2, cy1)
    for p, q, r, s in zip(a, b, c, d):
        out[p:q, r:s] = False
    return X2, Y2, out


def trace_rings(xs, ys, cov):
    """Boolean grid -> list of rings [(rxs, rys), ...], closed (first
    point repeated), interior-on-the-left orientation: exterior rings
    positive shoelace, holes negative. Collinear runs are merged to
    the minimal vertex set."""
    if cov.size == 0:
        return []
    nx, ny = cov.shape
    # directed boundary edges with the covered cell on the LEFT.
    # vertices are integer grid corners (i, j) -> (xs[i], ys[j]).
    pad = np.zeros((nx + 2, ny + 2), dtype=bool)
    pad[1:-1, 1:-1] = cov
    edges: dict = {}  # start vertex -> list of (end vertex, dir)

    def add(v0, v1, d):
        edges.setdefault(v0, []).append((v1, d))

    ii, jj = np.nonzero(cov & ~pad[1:-1, :-2])  # open below (j-1)
    for i, j in zip(ii, jj):
        add((i, j), (i + 1, j), 0)  # +x along bottom
    ii, jj = np.nonzero(cov & ~pad[2:, 1:-1])  # open right (i+1)
    for i, j in zip(ii, jj):
        add((i + 1, j), (i + 1, j + 1), 1)  # +y along right
    ii, jj = np.nonzero(cov & ~pad[1:-1, 2:])  # open above (j+1)
    for i, j in zip(ii, jj):
        add((i + 1, j + 1), (i, j + 1), 2)  # -x along top
    ii, jj = np.nonzero(cov & ~pad[:-2, 1:-1])  # open left (i-1)
    for i, j in zip(ii, jj):
        add((i, j + 1), (i, j), 3)  # -y along left

    # left-turn preference at degenerate (checkerboard) corners keeps
    # every ring simple: dir d prefers outgoing (d+1)%4, then d, then
    # (d+3)%4
    rings = []
    while edges:
        v0 = next(iter(edges))
        out = edges[v0].pop()
        if not edges[v0]:
            del edges[v0]
        ring = [v0]
        v, d = out
        while v != ring[0]:
            ring.append(v)
            cand = edges[v]
            if len(cand) == 1:
                nxt = cand.pop(0)
            else:
                pref = [(d + 1) % 4, d, (d + 3) % 4]
                k = min(range(len(cand)), key=lambda q: pref.index(cand[q][1]))
                nxt = cand.pop(k)
            if not cand:
                del edges[v]
            v, d = nxt
        # merge collinear runs
        ring.append(ring[0])
        keep = [ring[0]]
        for p in ring[1:]:
            if len(keep) >= 2:
                a, b = keep[-2], keep[-1]
                if (b[0] - a[0] == 0 and p[0] - b[0] == 0) or (
                    b[1] - a[1] == 0 and p[1] - b[1] == 0
                ):
                    keep[-1] = p
                    continue
            keep.append(p)
        # re-check the seam (last segment vs first)
        if len(keep) >= 3:
            a, b, c = keep[-2], keep[0], keep[1]
            if (b[0] - a[0] == 0 and c[0] - b[0] == 0) or (
                b[1] - a[1] == 0 and c[1] - b[1] == 0
            ):
                keep = keep[1:-1] + [keep[1]]
        rxs = xs[np.array([p[0] for p in keep])]
        rys = ys[np.array([p[1] for p in keep])]
        rings.append((rxs, rys))
    return rings


def _box_count(m: np.ndarray, kx: int, ky: int) -> np.ndarray:
    """Count of True cells in the (2kx+1, 2ky+1) window around each
    cell (zero-padded), via integral image."""
    ii = np.zeros((m.shape[0] + 1, m.shape[1] + 1), dtype=np.int64)
    np.cumsum(m, axis=0, out=ii[1:, 1:])
    np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
    n0, n1 = m.shape
    r0 = np.clip(np.arange(n0) + kx + 1, 0, n0)
    l0 = np.clip(np.arange(n0) - kx, 0, n0)
    r1 = np.clip(np.arange(n1) + ky + 1, 0, n1)
    l1 = np.clip(np.arange(n1) - ky, 0, n1)
    return ii[r0][:, r1] - ii[l0][:, r1] - ii[r0][:, l1] + ii[l0][:, l1]


def raster_closing_grid(ring_groups, tx: float, ty: float, res: int = 256):
    """APPROXIMATE closing for general polygon members (the exact
    compressed-grid path covers axis-aligned rects only): rasterize
    the member polygons onto a res x res grid over the expanded
    component bbox (center rule), box-dilate by (tx, ty) in cells,
    then box-erode — returns (xs, ys, cov) compatible with
    trace_rings. Deterministic; error bounded by the cell size."""
    from robosat_ray.geo.raster import fill_rings_accumulate

    all_x = np.concatenate([np.asarray(r[0]) for rings in ring_groups for r in rings])
    all_y = np.concatenate([np.asarray(r[1]) for rings in ring_groups for r in rings])
    x0, x1 = all_x.min() - 2.0 * tx, all_x.max() + 2.0 * tx
    y0, y1 = all_y.min() - 2.0 * ty, all_y.max() + 2.0 * ty
    wx = (x1 - x0) / res
    wy = (y1 - y0) / res
    px_groups = [
        [((np.asarray(xs) - x0) / wx, (np.asarray(ys) - y0) / wy) for xs, ys in rings]
        for rings in ring_groups
    ]
    m = fill_rings_accumulate(px_groups, res).astype(bool).T  # (x, y) layout
    kx = max(int(round(tx / wx)), 0)
    ky = max(int(round(ty / wy)), 0)
    dil = _box_count(m, kx, ky) > 0
    full = (2 * kx + 1) * (2 * ky + 1)
    ero = _box_count(dil, kx, ky) == full
    xs = x0 + np.arange(res + 1) * wx
    ys = y0 + np.arange(res + 1) * wy
    return xs, ys, ero


def rings_area(rings) -> float:
    """Signed shoelace sum over closed rings (exterior positive, holes
    negative under trace_rings orientation)."""
    total = 0.0
    for rxs, rys in rings:
        total += 0.5 * float(
            np.sum(rxs[:-1] * rys[1:] - rxs[1:] * rys[:-1])
        )
    return total
