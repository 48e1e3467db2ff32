"""Property-based tests (hypothesis) for the geometry kernels:
closing invariants, union-IoU bounds, scanline-vs-grid agreement."""

import numpy as np
from hypothesis import given, settings, strategies as st

from robosat_ray.geo.rectilinear import (
    closing_grid, grid_area, trace_rings, rings_area, union_cover_grid,
)
from robosat_ray.geo.clip import union_iou
from robosat_ray.stages.merge import rect_union_area


def rect_sets(max_n=6):
    return st.lists(
        st.tuples(
            st.floats(0, 50, allow_nan=False, width=32),
            st.floats(0, 50, allow_nan=False, width=32),
            st.floats(0.5, 20, allow_nan=False, width=32),
            st.floats(0.5, 20, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=max_n,
    )


def _unpack(rs):
    x0 = np.array([r[0] for r in rs])
    y0 = np.array([r[1] for r in rs])
    x1 = x0 + np.array([r[2] for r in rs])
    y1 = y0 + np.array([r[3] for r in rs])
    return x0, y0, x1, y1


@settings(max_examples=60, deadline=None)
@given(rect_sets(), st.floats(0.01, 3.0, allow_nan=False))
def test_closing_contains_union_and_traces_consistently(rs, t):
    x0, y0, x1, y1 = _unpack(rs)
    xs, ys, cov = closing_grid(x0, y0, x1, y1, t, t)
    closed = grid_area(xs, ys, cov)
    plain = rect_union_area(x0, y0, x1, y1)
    # extensivity: closing never removes area
    assert closed >= plain - 1e-9 * max(plain, 1.0)
    # ring trace is area-consistent with the grid
    ra = rings_area(trace_rings(xs, ys, cov))
    assert abs(ra - closed) <= 1e-9 * max(closed, 1.0)


@settings(max_examples=40, deadline=None)
@given(rect_sets(max_n=4), st.floats(0.05, 2.0, allow_nan=False))
def test_closing_idempotent(rs, t):
    """closing(closing(X)) == closing(X) — apply closing to the
    traced result's cell rects and compare areas."""
    x0, y0, x1, y1 = _unpack(rs)
    xs, ys, cov = closing_grid(x0, y0, x1, y1, t, t)
    a1 = grid_area(xs, ys, cov)
    if cov.size == 0:
        return
    ii, jj = np.nonzero(cov)
    cx0, cy0 = xs[ii], ys[jj]
    cx1, cy1 = xs[ii + 1], ys[jj + 1]
    xs2, ys2, cov2 = closing_grid(cx0, cy0, cx1, cy1, t, t)
    a2 = grid_area(xs2, ys2, cov2)
    assert abs(a2 - a1) <= 1e-6 * max(a1, 1.0), (a1, a2)


@settings(max_examples=60, deadline=None)
@given(rect_sets(max_n=5))
def test_union_iou_bounds_and_pairwise_dominance(rs):
    """0 <= union IoU <= 1, and the union IoU is >= every pairwise
    IoU computed against the same denominatorless rule only when a
    single intersector exists (sanity: k=1 equals pairwise)."""
    def rings(a, b, c, d):
        return [(
            np.array([a, c, c, a, a], dtype=np.float64),
            np.array([b, b, d, d, b], dtype=np.float64),
        )]

    x0, y0, x1, y1 = _unpack(rs)
    pred = rings(10.0, 10.0, 30.0, 30.0)
    inters = []
    for a, b, c, d in zip(x0, y0, x1, y1):
        ix = max(0.0, min(c, 30.0) - max(a, 10.0))
        iy = max(0.0, min(d, 30.0) - max(b, 10.0))
        if ix * iy > 0:
            inters.append(rings(a, b, c, d))
    v = union_iou(pred, inters)
    assert 0.0 <= v <= 1.0 + 1e-12
    if len(inters) == 1:
        a = inters[0]
        ax, ay = a[0]
        fa = (ax.max() - ax.min()) * (ay.max() - ay.min())
        ix = max(0.0, min(ax.max(), 30.0) - max(ax.min(), 10.0))
        iy = max(0.0, min(ay.max(), 30.0) - max(ay.min(), 10.0))
        inter = ix * iy
        expect = inter / (400.0 + fa - inter)
        assert abs(v - expect) <= 1e-9


@settings(max_examples=60, deadline=None)
@given(rect_sets())
def test_cover_grid_area_equals_scanline(rs):
    x0, y0, x1, y1 = _unpack(rs)
    xs, ys, cov = union_cover_grid(x0, y0, x1, y1)
    a = grid_area(xs, ys, cov)
    b = rect_union_area(x0, y0, x1, y1)
    assert abs(a - b) <= 1e-9 * max(b, 1.0)
