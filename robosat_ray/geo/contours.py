"""Contour extraction from binary masks with full hierarchy, from
scratch: connected-component labeling + boundary tracing (Moore
neighborhood) + containment-based hierarchy.

Reference semantics: cv2.findContours(RETR_TREE, CHAIN_APPROX_SIMPLE)
at robosat/features/core.py:95-108 — outer contours of foreground
components and inner contours of their holes, with a
(next, prev, first_child, parent) hierarchy; the featurizer walks
parents upward (features/core.py:127-153) and keeps outers with their
direct hole children (features/parking.py:56-100).

This implementation returns polygon rings in pixel coordinates where
ring vertices trace the OUTLINE of the pixel region (cell-boundary
polygons, not pixel-center chains): the ring of a component is the
exact boundary of its covered area, which makes downstream area/PIP
math exact. Hierarchy: depth 0 = outer ring of a foreground component,
depth 1 = hole ring inside it, etc. (alternating fg/hole, like
RETR_TREE on a binary image).
"""

from __future__ import annotations

import numpy as np


def label_components(mask: np.ndarray, connectivity: int = 8):
    """Connected-component labeling via two-pass union-find over rows,
    vectorized per row-pair. Returns (labels int32 grid, n_labels);
    background = 0, components 1..n."""
    H, W = mask.shape
    m = mask.astype(bool)
    labels = np.zeros((H, W), dtype=np.int32)
    # first pass: per-row runs get provisional labels
    parent = [0]  # union-find; parent[0] unused

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    prev_row_labels = np.zeros(W, dtype=np.int32)
    for j in range(H):
        row = m[j]
        if not row.any():
            prev_row_labels = labels[j]
            continue
        # runs of True in this row
        d = np.diff(np.concatenate([[0], row.view(np.int8), [0]]))
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]
        row_labels = labels[j]
        for s, e in zip(starts, ends):
            lab = 0
            # overlap range in previous row (8-conn: extend by 1)
            s0 = max(0, s - (1 if connectivity == 8 else 0))
            e0 = min(W, e + (1 if connectivity == 8 else 0))
            above = prev_row_labels[s0:e0]
            hit = np.unique(above[above > 0])
            if len(hit) == 0:
                lab = nxt
                parent.append(nxt)
                nxt += 1
            else:
                lab = int(hit[0])
                for other in hit[1:]:
                    union(lab, int(other))
            row_labels[s:e] = lab
        prev_row_labels = row_labels
    # second pass: resolve + compact
    if nxt == 1:
        return labels, 0
    lut = np.zeros(nxt, dtype=np.int32)
    roots = {}
    n = 0
    for a in range(1, nxt):
        r = find(a)
        if r not in roots:
            n += 1
            roots[r] = n
        lut[a] = roots[r]
    return lut[labels], n


def _trace_region_rings(region: np.ndarray, oy: int, ox: int):
    """Exact boundary rings of a boolean region via edge-following on
    the pixel grid: collect all unit edges between region and
    non-region cells, then stitch them into closed loops. Returns list
    of (xs, ys) closed rings in global pixel coordinates; the outer
    ring is the longest by |area|."""
    H, W = region.shape
    # horizontal edges: between (j-1,i) and (j,i) — edge at y=j from x=i to i+1
    padded = np.zeros((H + 2, W + 2), dtype=bool)
    padded[1:-1, 1:-1] = region
    # edge segments, oriented so the region is on the LEFT of travel
    # (gives CCW outers / CW holes in a y-down frame... sign handled by caller)
    segs = {}  # start point -> list of (end point)
    diff_v = padded[1:, :].astype(np.int8) - padded[:-1, :].astype(np.int8)
    # diff_v[j, i] = region starts at row j (1) or ends (-1); edge at y=j-? ...
    js, is_ = np.nonzero(diff_v == 1)  # top edge of region cell (j, i)
    for j, i in zip(js, is_):
        # cell (j, i-1 in padded) -> global: y = j, x from i-1 .. i
        a = (i - 1, j)
        b = (i, j)
        segs.setdefault(a, []).append(b)  # travel +x along top, region below
    js, is_ = np.nonzero(diff_v == -1)  # bottom edge
    for j, i in zip(js, is_):
        a = (i, j)
        b = (i - 1, j)
        segs.setdefault(a, []).append(b)  # travel -x along bottom
    diff_h = padded[:, 1:].astype(np.int8) - padded[:, :-1].astype(np.int8)
    js, is_ = np.nonzero(diff_h == 1)  # left edge of region cell
    for j, i in zip(js, is_):
        a = (i, j)
        b = (i, j - 1)
        segs.setdefault(a, []).append(b)  # travel -y along left edge
    js, is_ = np.nonzero(diff_h == -1)  # right edge
    for j, i in zip(js, is_):
        a = (i, j - 1)
        b = (i, j)
        segs.setdefault(a, []).append(b)  # travel +y along right edge

    rings = []
    while segs:
        start = next(iter(segs))
        path = [start]
        cur = start
        prev_dir = None
        while True:
            outs = segs.get(cur)
            if not outs:
                break
            if len(outs) == 1:
                nxt_pt = outs.pop()
                del segs[cur]
            else:
                # corner with two choices (diagonal touch): prefer the
                # leftmost turn relative to prev_dir to keep loops simple
                def turn_key(p):
                    d = (p[0] - cur[0], p[1] - cur[1])
                    if prev_dir is None:
                        return 0
                    cross = prev_dir[0] * d[1] - prev_dir[1] * d[0]
                    return -cross
                outs.sort(key=turn_key)
                nxt_pt = outs.pop(0)
                if not outs:
                    del segs[cur]
            prev_dir = (nxt_pt[0] - cur[0], nxt_pt[1] - cur[1])
            cur = nxt_pt
            if cur == start:
                break
            path.append(cur)
        if len(path) >= 4:
            xs = np.array([p[0] for p in path] + [path[0][0]], dtype=np.float64) + ox - 1
            ys = np.array([p[1] for p in path] + [path[0][1]], dtype=np.float64) + oy - 1
            # collapse collinear runs (CHAIN_APPROX_SIMPLE analog)
            keep = _collinear_mask(xs, ys)
            rings.append((xs[keep], ys[keep]))
    return rings


def _collinear_mask(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Keep first point, drop middle points of straight runs, keep the
    closing point."""
    n = len(xs)
    keep = np.ones(n, dtype=bool)
    dx = np.diff(xs)
    dy = np.diff(ys)
    # interior point i is removable if direction in == direction out
    same = (dx[:-1] * dy[1:] - dy[:-1] * dx[1:]) == 0
    keep[1:-1] = ~same
    return keep


def find_contours(mask: np.ndarray):
    """mask -> list of components; each component is a dict
    {outer: (xs, ys), holes: [(xs, ys), ...]} with exact cell-boundary
    rings in pixel coordinates. Matches RETR_TREE's outer/hole split
    for binary images (deeper nesting appears as separate components,
    as in the reference's parents_in_hierarchy walk)."""
    from robosat_ray.geo.polygon import shoelace_area

    labels, n = label_components(mask, connectivity=8)
    comps = []
    for lab in range(1, n + 1):
        region = labels == lab
        js, is_ = np.nonzero(region)
        y0, y1 = js.min(), js.max() + 1
        x0, x1 = is_.min(), is_.max() + 1
        rings = _trace_region_rings(region[y0:y1, x0:x1], y0 + 1, x0 + 1)
        if not rings:
            continue
        areas = [abs(shoelace_area(xs, ys)) for xs, ys in rings]
        outer_i = int(np.argmax(areas))
        outer = rings[outer_i]
        holes = [r for i, r in enumerate(rings) if i != outer_i]
        comps.append({"outer": outer, "holes": holes})
    return comps
