"""Pin the SAT segment x rect predicate against a dense-sampling
reference, and the owner-cell single-emission rule end to end."""

import numpy as np


def _sat(ax, ay, bx, by, x0, y0, x1, y1):
    bb = (ax <= x1) and (bx >= x0) and (ay <= y1) and (by >= y0)
    dx, dy = bx - ax, by - ay
    cs = [
        dx * (y - ay) - dy * (x - ax)
        for x, y in ((x0, y0), (x1, y0), (x0, y1), (x1, y1))
    ]
    return bb and not all(c > 0 for c in cs) and not all(c < 0 for c in cs)


def _sampled(ax, ay, bx, by, x0, y0, x1, y1, n=20001):
    t = np.linspace(0.0, 1.0, n)
    px = ax + (bx - ax) * t
    py = ay + (by - ay) * t
    return bool(
        ((px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)).any()
    )


def test_sat_predicate_vs_sampling():
    rng = np.random.default_rng(6)
    agree = 0
    for _ in range(400):
        # production invariant: segments are expanded rect diagonals,
        # so ax <= bx and ay <= by always hold (the bbox test relies
        # on it; arbitrary-orientation segments are out of contract)
        ax, bx = sorted(rng.integers(-50, 50, 2))
        ay, by = sorted(rng.integers(-50, 50, 2))
        if (ax, ay) == (bx, by):
            continue
        x0, x1 = sorted(rng.integers(-50, 50, 2))
        y0, y1 = sorted(rng.integers(-50, 50, 2))
        got = _sat(ax, ay, bx, by, x0, y0, x1, y1)
        want = _sampled(ax, ay, bx, by, x0, y0, x1, y1)
        # sampling can only MISS grazing contacts (measure-zero tangent
        # touches); it can never claim a hit SAT denies
        if want:
            assert got, (ax, ay, bx, by, x0, y0, x1, y1)
        if got == want:
            agree += 1
    assert agree > 350  # grazing-touch disagreements are rare


def test_owner_cell_emits_once(ray_session):
    """A pair sharing many cells must appear exactly once."""
    from robosat_ray.stages.seg_intersect import seg_intersect

    import pyarrow as pa
    import ray.data

    # two long overlapping horizontal road rects spanning many z12 cells
    t = pa.table(
        {
            "feature_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["road", "road"]),
            "minx": pa.array([10.0, 10.05]),
            "miny": pa.array([0.40000, 0.40001]),
            "maxx": pa.array([10.4, 10.45]),
            "maxy": pa.array([0.40002, 0.40003]),
        }
    )
    out = seg_intersect(ray.data.from_arrow(t)).to_pandas()
    pairs = sorted(map(tuple, out[["road_id", "other_id"]].values.tolist()))
    assert pairs == [(1, 2), (2, 1)]
