"""Polygon kernels: shoelace area, orientation, bbox, ray-casting PIP.

From-scratch numpy replacements for the shapely predicates the
reference leans on (`intersects`/`contains` at robosat/tools/merge.py:55,
robosat/tools/dedupe.py:56; orientation at tools/merge.py:68-73; area at
tools/merge.py:79). Coordinate-plane agnostic: works on any 2-D plane
(the engine uses (lon, my) — see robosat_ray/constants.py).
"""

from __future__ import annotations

import numpy as np


def shoelace_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed area of a ring (closed or open; duplicate last point ok).

    Positive = counter-clockwise in a y-up plane. Note the engine's
    ``my`` axis points down (slippy convention), so CCW-on-screen rings
    have negative signed area there; callers use abs() for magnitudes.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    return 0.5 * float(np.sum(xs * y2 - x2 * ys))


def is_ccw(xs, ys) -> bool:
    return shoelace_area(xs, ys) > 0


def orient_ring(xs, ys, ccw: bool = True):
    """Return ring oriented CCW (or CW). Reference: tools/merge.py:68-73
    orients exteriors CCW before emit."""
    if is_ccw(xs, ys) != ccw:
        return xs[::-1].copy(), ys[::-1].copy()
    return xs, ys


def ring_bbox(xs, ys):
    return float(np.min(xs)), float(np.min(ys)), float(np.max(xs)), float(np.max(ys))


def points_in_ring(px: np.ndarray, py: np.ndarray, rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray-casting: which of the points (px, py) lie
    inside the simple ring (rx, ry)?

    O(n_points * n_edges) with numpy broadcasting — fine for the
    per-candidate-pair and per-cell workloads the engine feeds it.
    Boundary behavior is half-open (consistent, not exactly inclusive);
    synthetic inputs never place points exactly on edges.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]  # (n, 1)
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1 = np.asarray(rx, dtype=np.float64)[None, :]  # (1, m)
    y1 = np.asarray(ry, dtype=np.float64)[None, :]
    x2 = np.roll(rx, -1)[None, :]
    y2 = np.roll(ry, -1)[None, :]

    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = cond & (px < xint)
    return (np.sum(crossings, axis=1) % 2).astype(bool)


def point_in_rings(px, py, rings) -> np.ndarray:
    """Even-odd PIP against a polygon given as a list of rings
    (exterior + holes): inside iff inside an odd number of rings."""
    px = np.asarray(px, dtype=np.float64)
    acc = np.zeros(len(px), dtype=np.int64)
    for rx, ry in rings:
        acc += points_in_ring(px, py, np.asarray(rx), np.asarray(ry)).astype(np.int64)
    return (acc % 2).astype(bool)


def build_edge_list(fro: np.ndarray, rpo: np.ndarray, rxs: np.ndarray, rys: np.ndarray):
    """Flatten per-feature rings into one global edge list.

    Inputs are the ragged buffers from Arrow (feature->rings offsets
    `fro`, ring->points offsets `rpo`, closed-ring coords `rxs/rys`).
    Returns (ex1, ey1, ex2, ey2, feat_edge_off) where feature fi's
    edges are indices feat_edge_off[fi]..feat_edge_off[fi+1]. The
    duplicate closing vertex of each ring is dropped (its edge is
    degenerate), and ALL rings of a feature share its edge range so a
    single even-odd crossing count handles holes."""
    n_feat = len(fro) - 1
    # edges per ring = ring length - 1 (closed rings)
    ring_len = rpo[1:] - rpo[:-1]
    ring_edges = ring_len - 1
    # map ring -> feature to accumulate per-feature edge counts
    ring_feat = np.repeat(np.arange(n_feat), fro[1:] - fro[:-1])
    feat_edges = np.bincount(ring_feat, weights=ring_edges, minlength=n_feat).astype(np.int64)
    feat_edge_off = np.concatenate([[0], np.cumsum(feat_edges)])
    # flat edge endpoints: for ring r, edges (rpo[r]+i, rpo[r]+i+1)
    tot = int(ring_edges.sum())
    starts = np.repeat(rpo[:-1], ring_edges) + (
        np.arange(tot) - np.repeat(np.cumsum(ring_edges) - ring_edges, ring_edges)
    )
    ex1 = rxs[starts]
    ey1 = rys[starts]
    ex2 = rxs[starts + 1]
    ey2 = rys[starts + 1]
    return ex1, ey1, ex2, ey2, feat_edge_off


def pip_pairs(px, py, fidx, ex1, ey1, ex2, ey2, feat_edge_off) -> np.ndarray:
    """Vectorized even-odd PIP for candidate pairs: pair i = (point
    (px[i], py[i]), feature fidx[i]). Returns bool per pair. No Python
    loops: pairs are expanded against their feature's edge range with
    the repeat/offset trick and crossings are summed with bincount."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    fidx = np.asarray(fidx, dtype=np.int64)
    npairs = len(px)
    if npairs == 0:
        return np.zeros(0, dtype=bool)
    cnt = feat_edge_off[fidx + 1] - feat_edge_off[fidx]
    tot = int(cnt.sum())
    pair_id = np.repeat(np.arange(npairs), cnt)
    e = (
        np.arange(tot)
        - np.repeat(np.cumsum(cnt) - cnt, cnt)
        + np.repeat(feat_edge_off[fidx], cnt)
    )
    X = px[pair_id]
    Y = py[pair_id]
    y1 = ey1[e]
    y2 = ey2[e]
    cond = (y1 > Y) != (y2 > Y)
    x1 = ex1[e]
    x2 = ex2[e]
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (Y - y1) * (x2 - x1) / (y2 - y1)
    cross = cond & (X < xint)
    crossings = np.bincount(pair_id, weights=cross.astype(np.float64), minlength=npairs)
    return (crossings.astype(np.int64) % 2).astype(bool)


def segments_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> np.ndarray:
    """Vectorized proper/improper segment intersection test (broadcastable)."""

    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))

    def on_seg(ox, oy, px_, py_, qx, qy):
        return (
            (orient(ox, oy, px_, py_, qx, qy) == 0)
            & (np.minimum(ox, px_) <= qx) & (qx <= np.maximum(ox, px_))
            & (np.minimum(oy, py_) <= qy) & (qy <= np.maximum(oy, py_))
        )

    touch = (
        on_seg(bx1, by1, bx2, by2, ax1, ay1)
        | on_seg(bx1, by1, bx2, by2, ax2, ay2)
        | on_seg(ax1, ay1, ax2, ay2, bx1, by1)
        | on_seg(ax1, ay1, ax2, ay2, bx2, by2)
    )
    return proper | touch


def rings_intersect(ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray) -> bool:
    """Do two simple rings intersect (shared area OR boundary cross OR
    containment)? Replaces shapely `intersects` (tools/merge.py:55)."""
    # bbox reject
    if np.min(ax) > np.max(bx) or np.min(bx) > np.max(ax):
        return False
    if np.min(ay) > np.max(by) or np.min(by) > np.max(ay):
        return False
    # any vertex containment
    if points_in_ring(ax[:1], ay[:1], bx, by)[0]:
        return True
    if points_in_ring(bx[:1], by[:1], ax, ay)[0]:
        return True
    # any edge pair crossing: broadcast (na, 1) x (1, nb)
    ax1, ay1 = ax[:, None], ay[:, None]
    ax2, ay2 = np.roll(ax, -1)[:, None], np.roll(ay, -1)[:, None]
    bx1, by1 = bx[None, :], by[None, :]
    bx2, by2 = np.roll(bx, -1)[None, :], np.roll(by, -1)[None, :]
    return bool(np.any(segments_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)))
