"""Exact polygon intersection area / IoU, from scratch.

Replaces shapely's intersection/union area math used by the
reference's IoU dedupe (robosat/spatial/core.py:56-77,
robosat/tools/dedupe.py:50-67).

Method (robust for simple polygons incl. concave, holes via signed
inclusion-exclusion):
  area(A ∩ B) = Σ_i Σ_j s_i s_j area(ring_i(A) ∩ ring_j(B))
where s = +1 for exterior rings, -1 for holes (valid for properly
nested rings: the indicator of a polygon-with-holes is the signed sum
of its ring indicators). Each ring∩ring area is computed by ear-clip
triangulating one ring and Sutherland–Hodgman clipping each triangle
against the other ring's triangles (triangle x triangle = convex x
convex, exact).
"""

from __future__ import annotations

import numpy as np

from robosat_ray.geo.polygon import shoelace_area


def _open_ring(xs, ys):
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        return xs[:-1], ys[:-1]
    return xs, ys


def ear_clip(xs, ys):
    """Triangulate a simple polygon (no holes) by ear clipping.
    Returns list of (3,2) float arrays. O(n^2), fine for the small
    rings the engine produces."""
    xs, ys = _open_ring(xs, ys)
    n = len(xs)
    if n < 3:
        return []
    # ensure CCW
    if shoelace_area(xs, ys) < 0:
        xs, ys = xs[::-1].copy(), ys[::-1].copy()
    idx = list(range(n))
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 10 * n * n:
        guard += 1
        m = len(idx)
        clipped = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            ax, ay = xs[i0], ys[i0]
            bx, by = xs[i1], ys[i1]
            cx, cy = xs[i2], ys[i2]
            cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            if cross <= 0:
                continue  # reflex or degenerate
            # no other vertex inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                px, py = xs[j], ys[j]
                d1 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                d2 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
                d3 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
                if d1 >= 0 and d2 >= 0 and d3 >= 0:
                    ok = False
                    break
            if ok:
                tris.append(np.array([[ax, ay], [bx, by], [cx, cy]]))
                idx.pop(k)
                clipped = True
                break
        if not clipped:
            break  # degenerate; fall through with what we have
    if len(idx) == 3:
        tris.append(np.array([[xs[i], ys[i]] for i in idx]))
    return tris


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip (possibly concave) subject polygon by a
    CONVEX CCW clip polygon. Returns (k,2) array (possibly empty)."""
    out = subject
    m = len(clip)
    for i in range(m):
        if len(out) == 0:
            return out
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % m]
        ex, ey = bx - ax, by - ay
        inp = out
        out_pts = []
        n = len(inp)
        for j in range(n):
            px, py = inp[j]
            qx, qy = inp[(j + 1) % n]
            dp = ex * (py - ay) - ey * (px - ax)
            dq = ex * (qy - ay) - ey * (qx - ax)
            if dp >= 0:
                out_pts.append((px, py))
            if (dp >= 0) != (dq >= 0):
                t = dp / (dp - dq)
                out_pts.append((px + t * (qx - px), py + t * (qy - py)))
        out = np.asarray(out_pts, dtype=np.float64)
    return out


def ring_intersection_area(ax, ay, bx, by) -> float:
    """Exact |ring_a ∩ ring_b| for two simple rings."""
    # bbox reject
    ax_, ay_ = _open_ring(ax, ay)
    bx_, by_ = _open_ring(bx, by)
    if ax_.min() >= bx_.max() or bx_.min() >= ax_.max():
        return 0.0
    if ay_.min() >= by_.max() or by_.min() >= ay_.max():
        return 0.0
    tris_a = ear_clip(ax_, ay_)
    tris_b = ear_clip(bx_, by_)
    total = 0.0
    for ta in tris_a:
        # triangle bbox for cheap reject
        ta_minx, ta_miny = ta.min(axis=0)
        ta_maxx, ta_maxy = ta.max(axis=0)
        for tb in tris_b:
            if tb[:, 0].min() >= ta_maxx or ta_minx >= tb[:, 0].max():
                continue
            if tb[:, 1].min() >= ta_maxy or ta_miny >= tb[:, 1].max():
                continue
            # tb must be CCW for clip_convex
            if shoelace_area(tb[:, 0], tb[:, 1]) < 0:
                tb = tb[::-1]
            inter = clip_convex(ta, tb)
            if len(inter) >= 3:
                total += abs(shoelace_area(inter[:, 0], inter[:, 1]))
    return total


def polygon_area(rings) -> float:
    """|polygon| for rings [(xs, ys), ...] (ring 0 exterior, rest holes)."""
    if not rings:
        return 0.0
    a = abs(shoelace_area(*_open_ring(*rings[0])))
    for hx, hy in rings[1:]:
        a -= abs(shoelace_area(*_open_ring(hx, hy)))
    return a


def polygons_intersection_area(rings_a, rings_b) -> float:
    """|A ∩ B| with holes via signed inclusion-exclusion."""
    total = 0.0
    for i, (axs, ays) in enumerate(rings_a):
        si = 1.0 if i == 0 else -1.0
        for j, (bxs, bys) in enumerate(rings_b):
            sj = 1.0 if j == 0 else -1.0
            total += si * sj * ring_intersection_area(axs, ays, bxs, bys)
    return max(total, 0.0)


def _ring_tris(rings):
    """rings [(xs, ys), ...] -> [(sign, [CCW tri arrays])] per ring."""
    out = []
    for i, (xs, ys) in enumerate(rings):
        tris = []
        for t in ear_clip(*_open_ring(xs, ys)):
            if shoelace_area(t[:, 0], t[:, 1]) < 0:
                t = t[::-1]
            tris.append(t)
        out.append((1.0 if i == 0 else -1.0, tris))
    return out


def _chain_area(pieces, tri_lists) -> float:
    """Σ|piece ∩ tris_1 ∩ ... ∩ tris_m| — pieces stay convex under
    successive Sutherland–Hodgman clips by CCW triangles."""
    for tris in tri_lists:
        new = []
        for p in pieces:
            p_minx, p_miny = p.min(axis=0)
            p_maxx, p_maxy = p.max(axis=0)
            for t in tris:
                if (
                    t[:, 0].min() >= p_maxx
                    or p_minx >= t[:, 0].max()
                    or t[:, 1].min() >= p_maxy
                    or p_miny >= t[:, 1].max()
                ):
                    continue
                c = clip_convex(p, t)
                if len(c) >= 3:
                    new.append(c)
        pieces = new
        if not pieces:
            return 0.0
    return float(sum(abs(shoelace_area(p[:, 0], p[:, 1])) for p in pieces))


def polyset_intersection_area(ring_sets) -> float:
    """|P_1 ∩ ... ∩ P_m| for polygons-with-holes: the indicator of each
    polygon is the signed sum of its ring indicators, so the m-way
    intersection integrates to a signed sum over per-polygon ring
    choices of the plain ring-intersection areas."""
    from itertools import product

    per_poly = [_ring_tris(rings) for rings in ring_sets]
    total = 0.0
    for choice in product(*per_poly):
        sign = 1.0
        for s, _ in choice:
            sign *= s
        pieces = list(choice[0][1])
        area = _chain_area(pieces, [tris for _, tris in choice[1:]])
        total += sign * area
    return max(total, 0.0)


def _raster_union_iou(pred_rings, intersector_ring_sets, res: int = 512) -> float:
    """Deterministic grid approximation of IoU(pred, union(S)): burn
    all shapes onto a res x res grid over the combined bbox (center
    rule, even-odd) and count cells."""
    from robosat_ray.geo.raster import fill_rings_accumulate, fill_rings

    all_rings = [pred_rings] + list(intersector_ring_sets)
    xs = np.concatenate([np.asarray(r[0]) for rings in all_rings for r in rings])
    ys = np.concatenate([np.asarray(r[1]) for rings in all_rings for r in rings])
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    wx = max(x1 - x0, 1e-300) / res
    wy = max(y1 - y0, 1e-300) / res

    def to_px(rings):
        return [((np.asarray(a) - x0) / wx, (np.asarray(b) - y0) / wy) for a, b in rings]

    pred_m = fill_rings(to_px(pred_rings), res).astype(bool)
    union_m = fill_rings_accumulate(
        [to_px(r) for r in intersector_ring_sets], res
    ).astype(bool)
    inter = int((pred_m & union_m).sum())
    union = int((pred_m | union_m).sum())
    return inter / union if union else 0.0


def union_iou(pred_rings, candidate_ring_sets, max_k: int = 20) -> float:
    """Reference dedupe rule (robosat/tools/dedupe.py:56-67):
    IoU(pred, union(intersecting reference shapes)). Candidates are
    filtered to true intersectors (positive |pred ∩ S_i|) HERE — the
    singleton intersection terms are needed for the size-1 subsets
    anyway, so callers should pass bbox-positive candidates without a
    pre-pass (a separate filter would run the triangulation twice).
    Union areas via inclusion-exclusion over subsets of intersectors,
    pruned: a subset whose intersection is empty kills all supersets."""
    from itertools import combinations

    # intersector filter + reusable singleton pred∩S_i terms
    single_b = [
        polyset_intersection_area([pred_rings, s]) for s in candidate_ring_sets
    ]
    intersectors = [
        s for s, b in zip(candidate_ring_sets, single_b) if b > 0.0
    ]
    single_b = [b for b in single_b if b > 0.0]
    k = len(intersectors)
    if k == 0:
        return 0.0
    if k > max_k:
        # inclusion-exclusion is exponential in k; beyond the cap a
        # deterministic raster union-IoU keeps a huge neighborhood
        # from crashing the job (error bounded by the cell size)
        return _raster_union_iou(pred_rings, intersectors)
    area_p = polygon_area(pred_rings)
    area_u = 0.0
    inter_u = 0.0
    dead: set = set()
    for size in range(1, k + 1):
        any_alive = False
        for T in combinations(range(k), size):
            if size > 1 and any(
                frozenset(t for t in T if t != d) in dead for d in T
            ):
                dead.add(frozenset(T))
                continue
            a = polyset_intersection_area([intersectors[i] for i in T])
            if a <= 0.0:
                dead.add(frozenset(T))
                continue
            any_alive = True
            sign = 1.0 if size % 2 == 1 else -1.0
            area_u += sign * a
            if size == 1:
                b = single_b[T[0]]
            else:
                b = polyset_intersection_area(
                    [pred_rings] + [intersectors[i] for i in T]
                )
            inter_u += sign * b
        if not any_alive:
            break
    union = area_p + area_u - inter_u
    return inter_u / union if union > 0 else 0.0


def iou(rings_a, rings_b) -> float:
    """Intersection-over-union, matching the reference's
    project→intersection.area / union.area (spatial/core.py:56-77) —
    union computed as |A| + |B| - |A∩B|."""
    inter = polygons_intersection_area(rings_a, rings_b)
    if inter <= 0.0:
        return 0.0
    union = polygon_area(rings_a) + polygon_area(rings_b) - inter
    return inter / union if union > 0 else 0.0
