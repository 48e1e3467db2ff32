"""Per-component union geometry (A5 full): exact rect-union area vs
raster oracle and hand-checkable cases."""

import numpy as np
import pytest

from robosat_ray.stages.merge import rect_union_area


def test_rect_union_area_basic():
    # two overlapping 4x4 squares offset by 2: 16 + 16 - 4 = 28
    a = rect_union_area(
        np.array([0.0, 2.0]), np.array([0.0, 2.0]),
        np.array([4.0, 6.0]), np.array([4.0, 6.0]),
    )
    assert a == pytest.approx(28.0)
    # disjoint
    assert rect_union_area(
        np.array([0.0, 10.0]), np.array([0.0, 0.0]),
        np.array([1.0, 11.0]), np.array([1.0, 1.0]),
    ) == pytest.approx(2.0)
    # contained
    assert rect_union_area(
        np.array([0.0, 1.0]), np.array([0.0, 1.0]),
        np.array([10.0, 2.0]), np.array([10.0, 2.0]),
    ) == pytest.approx(100.0)


def test_rect_union_area_vs_raster_oracle():
    rng = np.random.default_rng(9)
    for _ in range(10):
        n = rng.integers(2, 12)
        minx = rng.uniform(0, 80, n)
        miny = rng.uniform(0, 80, n)
        maxx = minx + rng.uniform(1, 20, n)
        maxy = miny + rng.uniform(1, 20, n)
        exact = rect_union_area(minx, miny, maxx, maxy)
        # fine-grid oracle
        res = 400
        step = 100.0 / res
        cy, cx = np.mgrid[0:res, 0:res]
        px = (cx + 0.5) * step
        py = (cy + 0.5) * step
        cover = np.zeros((res, res), dtype=bool)
        for i in range(n):
            cover |= (px >= minx[i]) & (px < maxx[i]) & (py >= miny[i]) & (py < maxy[i])
        approx = cover.sum() * step * step
        assert abs(exact - approx) / max(exact, 1e-9) < 0.02


def test_merge_unions_stage(ray_session):
    from robosat_ray.stages.merge import merge_components, merge_unions
    from robosat_ray.synth.footprints import footprints_dataset, footprints_table

    sf = "/root/testdata/sf0.001"
    feet_t = footprints_table(sf)
    comp = merge_components(footprints_dataset(sf), feet_t).to_pandas()
    unions = merge_unions(footprints_dataset(sf), feet_t).to_pandas()
    # membership counts agree
    want_counts = comp.groupby("component_id").size()
    got_counts = unions.set_index("component_id")["n_members"]
    assert (got_counts.sort_index() == want_counts.sort_index()).all()
    # union area of a component is <= sum of member areas and >= max member
    fp = feet_t.to_pandas().merge(comp, on="feature_id")
    fp["area"] = (fp["maxx"] - fp["minx"]) * (fp["maxy"] - fp["miny"])
    per = fp.groupby("component_id")["area"].agg(["sum", "max"])
    m = unions.set_index("component_id").join(per)
    assert (m["union_area"] <= m["sum"] + 1e-15).all()
    assert (m["union_area"] >= m["max"] - 1e-15).all()
    # singleton components: union area == member area exactly
    singles = m[m["n_members"] == 1]
    assert np.allclose(singles["union_area"], singles["sum"])
