"""Douglas-Peucker polyline/ring simplification, iterative numpy.

Reference semantics: cv2.approxPolyDP(contour, epsilon, closed=True)
with epsilon = 0.01 * arcLength (robosat/features/core.py:112-124,
ratio at features/parking.py:14).
"""

from __future__ import annotations

import numpy as np


def _perp_dist(xs, ys, i0, i1):
    """Perpendicular distances of points i0+1..i1-1 from chord i0->i1."""
    x0, y0 = xs[i0], ys[i0]
    x1, y1 = xs[i1], ys[i1]
    dx, dy = x1 - x0, y1 - y0
    seg = np.hypot(dx, dy)
    px = xs[i0 + 1 : i1]
    py = ys[i0 + 1 : i1]
    if seg == 0:
        return np.hypot(px - x0, py - y0)
    return np.abs(dy * px - dx * py + x1 * y0 - y1 * x0) / seg


def simplify_dp(xs: np.ndarray, ys: np.ndarray, eps: float):
    """Douglas-Peucker on an open polyline (keeps endpoints)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    if n <= 2:
        return xs.copy(), ys.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        d = _perp_dist(xs, ys, i0, i1)
        k = int(np.argmax(d))
        if d[k] > eps:
            mid = i0 + 1 + k
            keep[mid] = True
            stack.append((i0, mid))
            stack.append((mid, i1))
    return xs[keep], ys[keep]


def arc_length(xs, ys, closed: bool = True) -> float:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if closed and (xs[0] != xs[-1] or ys[0] != ys[-1]):
        xs = np.append(xs, xs[0])
        ys = np.append(ys, ys[0])
    return float(np.hypot(np.diff(xs), np.diff(ys)).sum())


def simplify_ring(xs, ys, eps_ratio: float = 0.01):
    """Simplify a closed ring with eps = eps_ratio * perimeter (the
    reference's rule). The ring is split at its two extreme points so
    DP endpoints are stable; returns a closed ring (first == last)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    closed = xs[0] == xs[-1] and ys[0] == ys[-1]
    if closed:
        xs, ys = xs[:-1], ys[:-1]
    n = len(xs)
    if n <= 3:
        return np.append(xs, xs[0]), np.append(ys, ys[0])
    eps = eps_ratio * arc_length(xs, ys, closed=True)
    # anchor at the two farthest-apart extreme points (deterministic)
    i0 = int(np.lexsort((ys, xs))[0])
    xs = np.roll(xs, -i0)
    ys = np.roll(ys, -i0)
    d2 = (xs - xs[0]) ** 2 + (ys - ys[0]) ** 2
    imax = int(np.argmax(d2))
    ax, ay = simplify_dp(xs[: imax + 1], ys[: imax + 1], eps)
    bx, by = simplify_dp(
        np.append(xs[imax:], xs[0]), np.append(ys[imax:], ys[0]), eps
    )
    out_x = np.concatenate([ax, bx[1:]])
    out_y = np.concatenate([ay, by[1:]])
    return out_x, out_y
