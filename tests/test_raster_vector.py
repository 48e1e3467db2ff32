"""Raster<->vector kernels vs brute-force / known-value oracles."""

import numpy as np
import pytest

from robosat_ray.geo.clip import iou, polygon_area, polygons_intersection_area, ring_intersection_area
from robosat_ray.geo.contours import find_contours, label_components
from robosat_ray.geo.graph import min_label_propagation
from robosat_ray.geo.morphology import closing, disk_kernel, opening
from robosat_ray.geo.raster import fill_rings, fill_rings_accumulate
from robosat_ray.geo.simplify import simplify_ring


def rect_ring(x0, y0, x1, y1):
    return (
        np.array([x0, x1, x1, x0, x0], dtype=np.float64),
        np.array([y0, y0, y1, y1, y0], dtype=np.float64),
    )


# ---------- raster fill ----------

def test_fill_rect_exact():
    m = fill_rings([rect_ring(2, 3, 10, 7)], 16)
    want = np.zeros((16, 16), dtype=np.uint8)
    want[3:7, 2:10] = 1  # pixel centers in [2,10)x[3,7)
    np.testing.assert_array_equal(m, want)


def test_fill_rect_fractional_bounds():
    # rect [2.4, 5.6] x [1.2, 3.8]: centers 2.5..5.5 → cols 2..5, rows 1..3
    m = fill_rings([rect_ring(2.4, 1.2, 5.6, 3.8)], 8)
    want = np.zeros((8, 8), dtype=np.uint8)
    want[1:4, 2:6] = 1
    np.testing.assert_array_equal(m, want)


def test_fill_ring_with_hole():
    outer = rect_ring(1, 1, 9, 9)
    hole = rect_ring(3, 3, 7, 7)
    m = fill_rings([outer, hole], 10)
    assert m[2, 2] == 1 and m[5, 5] == 0 and m[8, 8] == 1


def test_fill_triangle_vs_pip_oracle():
    from robosat_ray.geo.polygon import points_in_ring

    xs = np.array([1.0, 14.0, 7.0, 1.0])
    ys = np.array([2.0, 4.0, 13.0, 2.0])
    m = fill_rings([(xs, ys)], 16)
    cy, cx = np.mgrid[0:16, 0:16]
    centers_in = points_in_ring(
        (cx + 0.5).ravel(), (cy + 0.5).ravel(), xs[:-1], ys[:-1]
    ).reshape(16, 16)
    np.testing.assert_array_equal(m.astype(bool), centers_in)


def test_fill_accumulate_is_union():
    a = rect_ring(0, 0, 5, 5)
    b = rect_ring(3, 3, 8, 8)
    m = fill_rings_accumulate([[a], [b]], 10)
    assert m[1, 1] == 1 and m[6, 6] == 1 and m[4, 4] == 1 and m[9, 9] == 0


def test_rect_fast_path_equals_scanline():
    """stages/rasterize's direct rect fill must match the general
    scanline kernel exactly (same pixel-center rule)."""
    rng = np.random.default_rng(11)
    for _ in range(50):
        x0, y0 = rng.uniform(0, 20, 2)
        x1 = x0 + rng.uniform(0.1, 10)
        y1 = y0 + rng.uniform(0.1, 10)
        want = fill_rings([rect_ring(x0, y0, x1, y1)], 32)
        got = np.zeros((32, 32), dtype=np.uint8)
        a = int(np.clip(np.ceil(x0 - 0.5), 0, 32))
        b = int(np.clip(np.ceil(x1 - 0.5), 0, 32))
        c = int(np.clip(np.ceil(y0 - 0.5), 0, 32))
        d = int(np.clip(np.ceil(y1 - 0.5), 0, 32))
        if b > a and d > c:
            got[c:d, a:b] = 1
        np.testing.assert_array_equal(got, want)


# ---------- morphology ----------

def test_open_removes_speckle_keeps_blob():
    img = np.zeros((64, 64), dtype=np.uint8)
    img[10:30, 10:30] = 1  # 20x20 blob
    img[50, 50] = 1  # speckle
    out = opening(img, 5)
    assert out[50, 50] == 0
    assert out[20, 20] == 1
    assert out[15:25, 15:25].all()


def test_close_fills_small_hole():
    img = np.ones((32, 32), dtype=np.uint8)
    img[15:17, 15:17] = 0  # 2x2 hole
    out = closing(img, 5)
    assert out[15, 15] == 1 and out.all()


def test_disk_kernel_shape():
    k = disk_kernel(5)
    assert k[2, 2] and k[0, 2] and k[2, 0]
    assert not k[0, 0]  # corners outside the disk


# ---------- connected components + contours ----------

def test_label_components_counts():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[2:5, 2:5] = 1
    img[10:15, 10:15] = 1
    img[0, 19] = 1
    labels, n = label_components(img)
    assert n == 3
    assert labels[3, 3] != labels[12, 12]


def test_label_components_diagonal_8conn():
    img = np.zeros((4, 4), dtype=np.uint8)
    img[0, 0] = 1
    img[1, 1] = 1
    _, n = label_components(img)
    assert n == 1  # 8-connectivity joins diagonals


def test_contours_rect():
    img = np.zeros((16, 16), dtype=np.uint8)
    img[3:7, 2:10] = 1
    comps = find_contours(img)
    assert len(comps) == 1
    xs, ys = comps[0]["outer"]
    from robosat_ray.geo.polygon import shoelace_area

    assert abs(shoelace_area(xs[:-1], ys[:-1])) == 8 * 4  # exact cell-boundary area
    assert comps[0]["holes"] == []
    assert xs.min() == 2 and xs.max() == 10 and ys.min() == 3 and ys.max() == 7


def test_contours_with_hole_roundtrip():
    # rasterize ring-with-hole, trace contours, re-rasterize → identical
    outer = rect_ring(2, 2, 13, 13)
    hole = rect_ring(5, 5, 10, 10)
    m = fill_rings([outer, hole], 16)
    comps = find_contours(m)
    assert len(comps) == 1
    assert len(comps[0]["holes"]) == 1
    rings = [comps[0]["outer"]] + comps[0]["holes"]
    m2 = fill_rings(rings, 16)
    np.testing.assert_array_equal(m, m2)


def test_contours_multiple_components_roundtrip():
    rng = np.random.default_rng(5)
    m = np.zeros((32, 32), dtype=np.uint8)
    for _ in range(6):
        x0, y0 = rng.integers(0, 24, 2)
        m[y0 : y0 + rng.integers(2, 8), x0 : x0 + rng.integers(2, 8)] = 1
    comps = find_contours(m)
    m2 = np.zeros_like(m)
    for c in comps:
        mm = fill_rings([c["outer"]] + c["holes"], 32)
        np.maximum(m2, mm, out=m2)
    np.testing.assert_array_equal(m, m2)


# ---------- simplify ----------

def test_simplify_square_with_collinear_points():
    xs = np.array([0, 1, 2, 3, 4, 4, 4, 4, 0, 0], dtype=np.float64)
    ys = np.array([0, 0, 0, 0, 0, 2, 4, 4, 4, 0], dtype=np.float64)
    sx, sy = simplify_ring(xs, ys, 0.01)
    assert len(sx) <= 6  # 4 corners + closing point (+1 slack for anchor)
    from robosat_ray.geo.polygon import shoelace_area

    assert abs(shoelace_area(sx[:-1], sy[:-1])) == 16.0


def test_simplify_preserves_area_within_eps():
    ang = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    xs = 10 * np.cos(ang) + 12
    ys = 10 * np.sin(ang) + 12
    xs = np.append(xs, xs[0])
    ys = np.append(ys, ys[0])
    sx, sy = simplify_ring(xs, ys, 0.01)
    from robosat_ray.geo.polygon import shoelace_area

    a0 = abs(shoelace_area(xs[:-1], ys[:-1]))
    a1 = abs(shoelace_area(sx[:-1], sy[:-1]))
    assert len(sx) < 60
    assert abs(a1 - a0) / a0 < 0.05


# ---------- clip / IoU ----------

def test_rect_intersection_exact():
    a = rect_ring(0, 0, 4, 4)
    b = rect_ring(2, 2, 6, 6)
    assert ring_intersection_area(*a, *b) == pytest.approx(4.0)
    assert iou([a], [b]) == pytest.approx(4.0 / (16 + 16 - 4))


def test_disjoint_and_contained():
    a = rect_ring(0, 0, 4, 4)
    c = rect_ring(10, 10, 12, 12)
    d = rect_ring(1, 1, 3, 3)
    assert ring_intersection_area(*a, *c) == 0.0
    assert ring_intersection_area(*a, *d) == pytest.approx(4.0)
    assert iou([a], [d]) == pytest.approx(4.0 / 16.0)


def test_concave_intersection_vs_raster_oracle():
    # L-shape vs rect: compare to fine-grid rasterized estimate
    L = (
        np.array([0, 8, 8, 4, 4, 0, 0], dtype=np.float64),
        np.array([0, 0, 4, 4, 8, 8, 0], dtype=np.float64),
    )
    r = rect_ring(2, 2, 7, 7)
    exact = ring_intersection_area(*L, *r)
    n = 400
    step = 10.0 / n
    cy, cx = np.mgrid[0:n, 0:n]
    px = (cx + 0.5) * step
    py = (cy + 0.5) * step
    from robosat_ray.geo.polygon import points_in_ring

    inL = points_in_ring(px.ravel(), py.ravel(), L[0][:-1], L[1][:-1])
    inR = points_in_ring(px.ravel(), py.ravel(), r[0][:-1], r[1][:-1])
    approx = (inL & inR).sum() * step * step
    assert abs(exact - approx) < 0.05


def test_iou_with_holes():
    a_outer = rect_ring(0, 0, 10, 10)
    a_hole = rect_ring(2, 2, 8, 8)
    b = rect_ring(0, 0, 10, 10)
    # A = frame of area 100-36=64; B = full square
    assert polygon_area([a_outer, a_hole]) == pytest.approx(64.0)
    inter = polygons_intersection_area([a_outer, a_hole], [b])
    assert inter == pytest.approx(64.0)
    assert iou([a_outer, a_hole], [b]) == pytest.approx(64.0 / 100.0)


# ---------- union-find ----------

def test_min_label_propagation():
    ids = np.array([5, 9, 12, 20, 33], dtype=np.int64)
    ea = np.array([9, 12], dtype=np.int64)
    eb = np.array([5, 9], dtype=np.int64)
    comp = min_label_propagation(ids, ea, eb)
    assert comp[5] == comp[9] == comp[12] == 5
    assert comp[20] == 20 and comp[33] == 33
