"""Buffering, from scratch (SURVEY.md M7 / J6 semantics).

- buffer_polyline: LineString -> buffered polygon outline with round
  caps and round joins (N-gon-approximated arcs), the role shapely's
  `.buffer(width)` plays for road geometries at reference
  robosat/osm/road.py:140-142.
- buffer_ring: offset a simple ring outward by d with round joins
  (merge's +threshold buffer at tools/merge.py:35-45); for the
  axis-aligned rects the engine synthesizes, bbox expansion (exact
  square-join buffer) is used instead — see stages/merge.py.

Outline construction: left-side offsets forward, an end cap, right
side backward, a start cap; the outline is traversed CLOCKWISE in a
y-up frame, so caps and outside joins are clockwise arcs. Exact for
straight segments; joins approximated by `arc_steps` chords per full
circle. Valid (simple) while d is small relative to the geometry's
local feature size — the road/merge regime. Concave joins produce
tiny self-overlap loops whose signed area cancels to first order.
"""

from __future__ import annotations

import numpy as np

from robosat_ray.geo.polygon import shoelace_area


def _arc(cx, cy, a0, a1, r, steps, ccw: bool):
    """Arc points from angle a0 to a1, forced CCW or CW."""
    if ccw and a1 < a0:
        a1 += 2.0 * np.pi
    if not ccw and a1 > a0:
        a1 -= 2.0 * np.pi
    span = abs(a1 - a0)
    n = max(2, int(np.ceil(span / (2 * np.pi) * steps)) + 1)
    ang = np.linspace(a0, a1, n)
    return cx + r * np.cos(ang), cy + r * np.sin(ang)


def _offset_line_intersection(px, py, nx1, ny1, px2, py2, nx2, ny2, d):
    """Intersection of the two offset LINES (p1 + d*n1 + t*dir1) and
    (p2 + d*n2 + s*dir2) where dir = rotate(n, -90deg) = (ny, -nx)."""
    ax, ay = px + d * nx1, py + d * ny1
    bx, by = px2 + d * nx2, py2 + d * ny2
    d1x, d1y = ny1, -nx1
    d2x, d2y = ny2, -nx2
    det = d1x * d2y - d1y * d2x
    if abs(det) < 1e-12:
        return None
    t = ((bx - ax) * d2y - (by - ay) * d2x) / det
    return ax + t * d1x, ay + t * d1y


def _walk_side(xs, ys, nx, ny, d, arc_steps, out_x, out_y):
    """Offset one side of a forward-traversed polyline. Outside
    (normals rotating clockwise) corners get clockwise join arcs — the
    outline winds CW; inside corners get the miter intersection of the
    adjacent offset lines (the true union boundary)."""
    n = len(xs) - 1
    start_x, start_y = xs[0] + d * nx[0], ys[0] + d * ny[0]
    for i in range(n):
        sx, sy = (start_x, start_y)
        ex, ey = xs[i + 1] + d * nx[i], ys[i + 1] + d * ny[i]
        if i + 1 < n:
            cross = nx[i] * ny[i + 1] - ny[i] * nx[i + 1]
            if cross < 0:  # outside corner: full segment + CW join arc
                out_x.append(np.array([sx, ex]))
                out_y.append(np.array([sy, ey]))
                a0 = np.arctan2(ny[i], nx[i])
                a1 = np.arctan2(ny[i + 1], nx[i + 1])
                ax, ay = _arc(xs[i + 1], ys[i + 1], a0, a1, d, arc_steps, ccw=False)
                out_x.append(ax)
                out_y.append(ay)
                start_x = xs[i + 1] + d * nx[i + 1]
                start_y = ys[i + 1] + d * ny[i + 1]
            else:  # inside corner: trim both segments to the miter point
                m = _offset_line_intersection(
                    xs[i], ys[i], nx[i], ny[i], xs[i + 1], ys[i + 1], nx[i + 1], ny[i + 1], d
                )
                if m is None:
                    out_x.append(np.array([sx, ex]))
                    out_y.append(np.array([sy, ey]))
                    start_x = xs[i + 1] + d * nx[i + 1]
                    start_y = ys[i + 1] + d * ny[i + 1]
                else:
                    out_x.append(np.array([sx, m[0]]))
                    out_y.append(np.array([sy, m[1]]))
                    start_x, start_y = m
        else:
            out_x.append(np.array([sx, ex]))
            out_y.append(np.array([sy, ey]))


def buffer_polyline(xs, ys, d: float, arc_steps: int = 32):
    """Open polyline -> closed buffered ring (xs, ys), round caps/joins.
    The returned ring winds clockwise in a y-up frame."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    assert len(xs) >= 2
    dx = np.diff(xs)
    dy = np.diff(ys)
    seg_len = np.hypot(dx, dy)
    keep = seg_len > 0
    if not keep.all():
        pts = np.concatenate([[True], keep])
        xs, ys = xs[pts], ys[pts]
        dx = np.diff(xs)
        dy = np.diff(ys)
        seg_len = np.hypot(dx, dy)
    nx = -dy / seg_len  # left normal
    ny = dx / seg_len
    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []

    # left side forward
    _walk_side(xs, ys, nx, ny, d, arc_steps, out_x, out_y)
    # end cap: clockwise half-turn from the left normal to the right normal
    a0 = np.arctan2(ny[-1], nx[-1])
    ax, ay = _arc(xs[-1], ys[-1], a0, a0 - np.pi, d, arc_steps, ccw=False)
    out_x.append(ax)
    out_y.append(ay)
    # right side backward (reverse traversal, negated normals)
    _walk_side(xs[::-1], ys[::-1], -nx[::-1], -ny[::-1], d, arc_steps, out_x, out_y)
    # start cap
    a0 = np.arctan2(-ny[0], -nx[0])
    ax, ay = _arc(xs[0], ys[0], a0, a0 - np.pi, d, arc_steps, ccw=False)
    out_x.append(ax)
    out_y.append(ay)

    bx = np.concatenate(out_x)
    by = np.concatenate(out_y)
    bx = np.append(bx, bx[0])
    by = np.append(by, by[0])
    return bx, by


def buffer_ring(xs, ys, d: float, arc_steps: int = 32):
    """Offset a simple ring outward by d (round joins at convex
    corners). Input any winding; output is a closed CCW ring."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    if shoelace_area(xs, ys) < 0:
        xs, ys = xs[::-1].copy(), ys[::-1].copy()
    n = len(xs)
    dx = np.roll(xs, -1) - xs
    dy = np.roll(ys, -1) - ys
    seg = np.hypot(dx, dy)
    nx = dy / seg  # outward normal of a CCW ring (y-up)
    ny = -dx / seg
    out_x, out_y = [], []
    for i in range(n):
        j = (i + 1) % n
        out_x.append(np.array([xs[i] + d * nx[i], xs[j] + d * nx[i]]))
        out_y.append(np.array([ys[i] + d * ny[i], ys[j] + d * ny[i]]))
        cross = nx[i] * ny[j] - ny[i] * nx[j]
        if cross > 0:  # normals rotate CCW -> convex corner, CCW join arc
            a0 = np.arctan2(ny[i], nx[i])
            a1 = np.arctan2(ny[j], nx[j])
            ax, ay = _arc(xs[j], ys[j], a0, a1, d, arc_steps, ccw=True)
            out_x.append(ax)
            out_y.append(ay)
    bx = np.concatenate(out_x)
    by = np.concatenate(out_y)
    bx = np.append(bx, bx[0])
    by = np.append(by, by[0])
    return bx, by
