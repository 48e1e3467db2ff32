"""Unit pins for stages/hull.py and stages/linalg.py (pure numpy —
no Ray session needed)."""

import numpy as np


def _brute_hull_edges(pts):
    """O(n^3) edge predicate — the oracle's definition."""
    edges = []
    for a in pts:
        for b in pts:
            if a == b:
                continue
            ok = True
            for c in pts:
                if c == a or c == b:
                    continue
                cr = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
                if cr > 0:
                    continue
                if cr == 0:
                    d = (c[0] - a[0]) * (b[0] - a[0]) + (c[1] - a[1]) * (b[1] - a[1])
                    if 0 <= d <= (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2:
                        continue
                ok = False
                break
            if ok:
                edges.append((a[0], a[1], b[0], b[1]))
    return sorted(edges)


def _chain_edges(pts):
    from robosat_ray.stages.hull import _chain

    poly = _chain(sorted(set(pts)))
    if len(poly) < 2:
        return []
    n = len(poly)
    return sorted(
        (poly[i][0], poly[i][1], poly[(i + 1) % n][0], poly[(i + 1) % n][1])
        for i in range(n)
    )


def test_chain_matches_brute_random():
    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(2, 40))
        # small lattice forces duplicates and collinear runs
        pts = list(zip(rng.integers(0, 12, n).tolist(), rng.integers(0, 12, n).tolist()))
        pts = sorted(set(pts))
        assert _chain_edges(pts) == _brute_hull_edges(pts), pts


def test_chain_degenerate_collinear():
    pts = [(0, 0), (2, 2), (5, 5), (9, 9)]
    # segment hull: both directed edges between the endpoints
    assert _chain_edges(pts) == [(0, 0, 9, 9), (9, 9, 0, 0)]
    assert _chain_edges([(3, 4)]) == []
    assert _chain_edges([(1, 1), (4, 0)]) == [(1, 1, 4, 0), (4, 0, 1, 1)]


def test_akl_toussaint_preserves_hull():
    from robosat_ray.stages.hull import _akl_toussaint, _chain

    rng = np.random.default_rng(11)
    for trial in range(10):
        n = int(rng.integers(5, 300))
        x = rng.integers(-1000, 1000, n).astype(np.int64)
        y = rng.integers(-1000, 1000, n).astype(np.int64)
        full = _chain(sorted(set(zip(x.tolist(), y.tolist()))))
        m = _akl_toussaint(x, y)
        pruned = _chain(sorted(set(zip(x[m].tolist(), y[m].tolist()))))
        assert full == pruned


def test_partial_hull_is_exact_combiner():
    from robosat_ray.stages.hull import _chain

    rng = np.random.default_rng(5)
    x = rng.integers(-500, 500, 400).astype(np.int64)
    y = rng.integers(-500, 500, 400).astype(np.int64)
    pts = sorted(set(zip(x.tolist(), y.tolist())))
    full = _chain(pts)
    # split into 7 arbitrary shards, hull each, hull of the union of hulls
    shards = [pts[i::7] for i in range(7)]
    merged = sorted(set(p for s in shards for p in _chain(sorted(s))))
    assert _chain(merged) == full


def test_gram_quantization_matches_sql_rounding():
    from robosat_ray.stages.linalg import QSCALE

    v = np.array([-0.00005, 0.00005, 0.123456, -0.999999], dtype=np.float64)
    q = np.floor(v * QSCALE + 0.5).astype(np.int64)
    # floor(x+0.5) half-up rounding, identical to the SQL expression
    assert q.tolist() == [0, 1, 1235, -10000]
