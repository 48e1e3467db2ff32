"""Polygon kernels vs brute-force/known oracles."""

import numpy as np

from robosat_ray.geo.polygon import (
    orient_ring,
    points_in_ring,
    point_in_rings,
    rings_intersect,
    shoelace_area,
)
from robosat_ray.geo.strtree import STRtree


def test_shoelace_square():
    xs = np.array([0.0, 2.0, 2.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0])
    assert shoelace_area(xs, ys) == 4.0
    xs2, ys2 = orient_ring(xs[::-1], ys[::-1])
    assert shoelace_area(xs2, ys2) == 4.0


def test_pip_square():
    xs = np.array([0.0, 2.0, 2.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0])
    px = np.array([1.0, 3.0, -0.5, 1.999])
    py = np.array([1.0, 1.0, 1.0, 0.001])
    np.testing.assert_array_equal(
        points_in_ring(px, py, xs, ys), [True, False, False, True]
    )


def test_pip_concave_L():
    # L-shape: big square minus top-right quadrant
    xs = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0])
    px = np.array([0.5, 1.5, 1.5, 0.5])
    py = np.array([0.5, 0.5, 1.5, 1.5])
    np.testing.assert_array_equal(
        points_in_ring(px, py, xs, ys), [True, True, False, True]
    )


def test_pip_with_hole():
    outer = (np.array([0.0, 4.0, 4.0, 0.0]), np.array([0.0, 0.0, 4.0, 4.0]))
    hole = (np.array([1.0, 3.0, 3.0, 1.0]), np.array([1.0, 1.0, 3.0, 3.0]))
    px = np.array([0.5, 2.0, 3.5])
    py = np.array([0.5, 2.0, 3.5])
    np.testing.assert_array_equal(
        point_in_rings(px, py, [outer, hole]), [True, False, True]
    )


def test_pip_random_vs_matplotlib_free_oracle():
    # random convex polygon: PIP should agree with half-plane test
    rng = np.random.default_rng(7)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
    xs = np.cos(ang)
    ys = np.sin(ang)
    px = rng.uniform(-1.5, 1.5, 500)
    py = rng.uniform(-1.5, 1.5, 500)
    got = points_in_ring(px, py, xs, ys)
    # half-plane oracle for convex CCW polygon
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    cross = (x2 - xs)[None, :] * (py[:, None] - ys[None, :]) - (y2 - ys)[None, :] * (
        px[:, None] - xs[None, :]
    )
    want = np.all(cross > 0, axis=1)
    # exclude points near edges (boundary convention may differ)
    dist = np.min(np.abs(cross), axis=1)
    m = dist > 1e-6
    np.testing.assert_array_equal(got[m], want[m])


def test_rings_intersect():
    a = (np.array([0.0, 2.0, 2.0, 0.0]), np.array([0.0, 0.0, 2.0, 2.0]))
    b = (np.array([1.0, 3.0, 3.0, 1.0]), np.array([1.0, 1.0, 3.0, 3.0]))
    c = (np.array([5.0, 6.0, 6.0, 5.0]), np.array([5.0, 5.0, 6.0, 6.0]))
    d = (np.array([0.5, 1.5, 1.5, 0.5]), np.array([0.5, 0.5, 1.5, 1.5]))  # inside a
    assert rings_intersect(a[0], a[1], b[0], b[1])
    assert not rings_intersect(a[0], a[1], c[0], c[1])
    assert rings_intersect(a[0], a[1], d[0], d[1])  # containment counts


def test_strtree_matches_bruteforce():
    rng = np.random.default_rng(3)
    n = 300
    minx = rng.uniform(0, 100, n)
    miny = rng.uniform(0, 100, n)
    maxx = minx + rng.uniform(0.1, 5, n)
    maxy = miny + rng.uniform(0.1, 5, n)
    tree = STRtree(minx, miny, maxx, maxy, capacity=8)
    for _ in range(50):
        qx0, qy0 = rng.uniform(0, 100, 2)
        qx1, qy1 = qx0 + rng.uniform(0, 10), qy0 + rng.uniform(0, 10)
        got = np.sort(tree.query_box(qx0, qy0, qx1, qy1))
        want = np.nonzero((minx <= qx1) & (maxx >= qx0) & (miny <= qy1) & (maxy >= qy0))[0]
        np.testing.assert_array_equal(got, want)
    # point candidates
    px = rng.uniform(0, 100, 200)
    py = rng.uniform(0, 100, 200)
    pi, bi = tree.query_points(px, py)
    inside = (minx[None, :] <= px[:, None]) & (px[:, None] <= maxx[None, :]) & (
        miny[None, :] <= py[:, None]
    ) & (py[:, None] <= maxy[None, :])
    wi, wb = np.nonzero(inside)
    got = set(zip(pi.tolist(), bi.tolist()))
    want = set(zip(wi.tolist(), wb.tolist()))
    assert got == want
