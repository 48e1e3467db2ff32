"""Distributed convex hull per region group — the "urban extent
polygon" operator (hull of a city's footprint centers), the vector
aggregation shape the merge/featurize family (reference
/root/reference/robosat/robosat/features/core.py contours →
simplify → polygon) does not cover: an aggregate whose result is a
GEOMETRY derived from every point in the group.

Exactness: centers quantized to an integer lattice (lon * 1e6,
my * 1e8 — positive per-axis scaling preserves hulls), every
orientation test an int64 cross product, so the DuckDB brute-force
twin (edge (a,b) is on the hull iff every other point c lies strictly
left, or collinear WITHIN the segment) is bit-equal. The engine runs
strict-turn Andrew monotone chain, whose edge set equals that
predicate exactly (collinear mid-edge points are dropped from the
vertex list and validate the spanning edge instead).

Scale shape: the per-batch partial emits each group's LOCAL hull
vertices — hull(union) = hull(union of partial hulls), so the partial
is an exact combiner (the classic distributed-hull construction) and
the per-group finish sees O(batches x hull_size) points, never the
corpus. Group count is fixed (8 cities + 4 background shards), but
the shuffle volume is combiner-bounded, so the hot-group concern the
spatial join solves with salting does not arise here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

XSCALE = 1_000_000.0  # lon -> int lattice
YSCALE = 100_000_000.0  # normalized mercator y -> int lattice


def _quantize(cx: np.ndarray, cy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (
        np.floor(cx * XSCALE + 0.5).astype(np.int64),
        np.floor(cy * YSCALE + 0.5).astype(np.int64),
    )


def region_group(partkey: np.ndarray) -> np.ndarray:
    """City index (0-7) for city rows, 8 + k%4 for background rows —
    mirrored in oracle.HULL's CASE expression."""
    k = np.asarray(partkey, dtype=np.int64)
    return np.where(k % 10 < 6, k % 8, 8 + k % 4)


def _chain(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Strict-turn Andrew monotone chain over DISTINCT sorted points.
    Returns hull vertices in counterclockwise order (>= 1 point)."""

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    if len(pts) <= 2:
        return list(pts)
    lower: list[tuple[int, int]] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[int, int]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def _akl_toussaint(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: drop points strictly inside the quadrilateral
    of the 4 extreme points (min/max of x+y, x-y) — an exact,
    vectorized hull-preserving prune."""
    if len(x) <= 4:
        return np.ones(len(x), dtype=bool)
    s, d = x + y, x - y
    corners_idx = [int(np.argmin(s)), int(np.argmax(d)),
                   int(np.argmax(s)), int(np.argmin(d))]
    # CCW quad (may be degenerate; duplicates fine)
    keep = np.zeros(len(x), dtype=bool)
    for i in range(4):
        ax, ay = x[corners_idx[i]], y[corners_idx[i]]
        bx, by = x[corners_idx[(i + 1) % 4]], y[corners_idx[(i + 1) % 4]]
        # points NOT strictly left of edge (a,b) might be outside
        keep |= (bx - ax) * (y - ay) - (by - ay) * (x - ax) <= 0
    keep[corners_idx] = True
    return keep


def _group_hull_points(g: np.ndarray, x: np.ndarray, y: np.ndarray) -> pa.Table:
    """Per-group local hull vertices (the exact combiner)."""
    out_g: list[np.ndarray] = []
    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []
    order = np.lexsort((y, x, g))
    g, x, y = g[order], x[order], y[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], len(g)]
    for s, e in zip(starts, ends):
        xs, ys = x[s:e], y[s:e]
        m = _akl_toussaint(xs, ys)
        pts = sorted(set(zip(xs[m].tolist(), ys[m].tolist())))
        poly = _chain(pts)
        out_g.append(np.full(len(poly), g[s], dtype=np.int64))
        out_x.append(np.array([p[0] for p in poly], dtype=np.int64))
        out_y.append(np.array([p[1] for p in poly], dtype=np.int64))
    if not out_g:
        return pa.table(
            {
                "g": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "g": pa.array(np.concatenate(out_g)),
            "x": pa.array(np.concatenate(out_x)),
            "y": pa.array(np.concatenate(out_y)),
        }
    )


def convex_hull_edges(part_ds):
    """part -> directed CCW hull edges (g, x1, y1, x2, y2) per region
    group. Two-point groups emit both directed edges (degenerate
    segment hull), matching the oracle predicate."""
    from robosat_ray.synth.footprints import footprint_centers

    def partial(b: pa.Table) -> pa.Table:
        pk = b.column("p_partkey").to_numpy()
        cx, cy = footprint_centers(pk)
        x, y = _quantize(cx, cy)
        return _group_hull_points(region_group(pk), x, y)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        gval = int(df["g"].iloc[0])
        pts = sorted(set(zip(df["x"].tolist(), df["y"].tolist())))
        poly = _chain(pts)
        if len(poly) < 2:
            return pd.DataFrame(
                {c: np.array([], dtype=np.int64)
                 for c in ("g", "x1", "y1", "x2", "y2")}
            )
        n = len(poly)
        ax = np.array([p[0] for p in poly], dtype=np.int64)
        ay = np.array([p[1] for p in poly], dtype=np.int64)
        return pd.DataFrame(
            {
                "g": np.full(n, gval, dtype=np.int64),
                "x1": ax,
                "y1": ay,
                "x2": np.roll(ax, -1),
                "y2": np.roll(ay, -1),
            }
        )

    return (
        part_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(finish, batch_format="pandas")
    )
