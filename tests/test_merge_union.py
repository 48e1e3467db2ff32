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
    area = m["union_area_q"] / 1e10
    assert (area <= m["sum"] + 1e-10).all()
    assert (area >= m["max"] - 1e-10).all()
    # singleton components: union area == member area (quantized)
    singles = m[m["n_members"] == 1]
    assert np.allclose(singles["union_area_q"] / 1e10, singles["sum"], atol=1e-10)


def test_merge_geometry_stage(ray_session):
    """Reference merge chain (buffer-union-erode) output: ring
    geometry per component. Singletons reproduce their member rect
    BIT-EXACTLY; multi-member components close gaps (area >= plain
    union), ring shoelace == closing-grid area, orientation counts
    consistent."""
    from robosat_ray.stages.merge import merge_components, merge_geometry, merge_unions
    from robosat_ray.synth.footprints import footprints_dataset, footprints_table

    sf = "/root/testdata/sf0.001"
    feet_t = footprints_table(sf)
    geo = merge_geometry(footprints_dataset(sf), feet_t).to_pandas()
    unions = merge_unions(footprints_dataset(sf), feet_t).to_pandas()
    comp = merge_components(footprints_dataset(sf), feet_t).to_pandas()
    fp = feet_t.to_pandas().merge(comp, on="feature_id")

    assert len(geo) == comp["component_id"].nunique()
    m = geo.set_index("component_id").join(
        unions.set_index("component_id"), rsuffix="_u"
    )
    # closing fills gaps: merged area >= plain rect-union area
    assert (m["merged_area"] >= m["union_area_q"] / 1e10 - 1e-10).all()
    assert (m["n_polys"] >= 1).all()
    assert (m["n_vertices"] >= 4 * m["n_polys"]).all()

    singles = fp.groupby("component_id").filter(lambda g: len(g) == 1)
    geo_idx = geo.set_index("component_id")
    n_checked = 0
    for _, r in singles.iterrows():
        g = geo_idx.loc[r["component_id"]]
        rings = g["rings"]
        assert len(rings) == 1 and g["n_polys"] == 1 and g["n_holes"] == 0
        xs = sorted({p["x"] for p in rings[0]})
        ys = sorted({p["y"] for p in rings[0]})
        assert xs == [r["minx"], r["maxx"]], (xs, r["minx"], r["maxx"])
        assert ys == [r["miny"], r["maxy"]]
        n_checked += 1
    assert n_checked > 10
    # a multi-member component exists and its ring area matches the
    # merged_area column (shoelace == grid sum within float noise)
    multi = geo[geo["n_members"] > 1]
    assert len(multi) > 0
    for _, g in multi.head(20).iterrows():
        signed = 0.0
        for ring in g["rings"]:
            rx = np.array([p["x"] for p in ring])
            ry = np.array([p["y"] for p in ring])
            signed += 0.5 * float(np.sum(rx[:-1] * ry[1:] - rx[1:] * ry[:-1]))
        assert abs(signed - g["merged_area"]) <= 1e-9 * max(1.0, abs(g["merged_area"]))


def test_merge_geometry_general_member_fallback(ray_session):
    """A component containing a non-rect (L-shape) member routes
    through the raster closing fallback (exact=False) and its merged
    area matches a grid-sampled approximation; all-rect components
    stay on the exact path (exact=True)."""
    import ray.data

    from robosat_ray.stages.merge import merge_geometry
    from tests.test_general_polygons import _poly_table

    def L(ox, oy, w, h):
        xs = np.array([ox, ox + w, ox + w, ox + w / 2, ox + w / 2, ox, ox])
        ys = np.array([oy, oy, oy + h / 2, oy + h / 2, oy + h, oy + h, oy])
        return [(xs, ys)]

    def R(ox, oy, w, h):
        xs = np.array([ox, ox + w, ox + w, ox, ox])
        ys = np.array([oy, oy, oy + h, oy + h, oy])
        return [(xs, ys)]

    from robosat_ray import constants as C

    w, h = 0.01, 0.00003  # spans several merge-eps in both axes
    polys = [
        (1, "building", L(0.0, 0.5, w, h)),           # L + nearby rect => one
        (2, "building", R(0.0106, 0.5, w, h)),        # general component
        (3, "building", R(0.2, 0.52, w, h)),          # far-away rect singleton
    ]
    feet = _poly_table(polys)
    geo = merge_geometry(ray.data.from_arrow(feet), feet).to_pandas()
    geo = geo.set_index("component_id").sort_index()
    assert len(geo) == 2
    gen = geo.loc[1]
    single = geo.loc[3]
    assert not bool(gen["exact"]) and gen["n_members"] == 2
    assert bool(single["exact"]) and single["n_members"] == 1
    # grid-sample the closing of the general component independently
    tx, ty = 2 * C.MERGE_EPS_X, 2 * C.MERGE_EPS_Y
    n = 400
    gx = np.linspace(-tx, 0.0106 + w + tx, n)
    gy = np.linspace(0.5 - ty, 0.5 + h + ty, n)
    PX, PY = np.meshgrid(gx, gy)
    from robosat_ray.geo.polygon import point_in_rings

    def inside(rings, px, py):
        return point_in_rings(px, py, [(np.asarray(r[0])[:-1], np.asarray(r[1])[:-1]) for r in rings])

    base = inside(polys[0][2], PX.ravel(), PY.ravel()) | inside(polys[1][2], PX.ravel(), PY.ravel())
    base = base.reshape(n, n)
    # closing via scipy-free box max/min on the sample grid
    kx = max(int(round(tx / (gx[1] - gx[0]))), 1)
    ky = max(int(round(ty / (gy[1] - gy[0]))), 1)
    from robosat_ray.geo.rectilinear import _box_count

    dil = _box_count(base.T, kx, ky) > 0
    ero = _box_count(dil, kx, ky) == (2 * kx + 1) * (2 * ky + 1)
    cell = (gx[1] - gx[0]) * (gy[1] - gy[0])
    approx = ero.sum() * cell
    assert abs(gen["merged_area"] - approx) / approx < 0.08, (gen["merged_area"], approx)


def test_merge_ring_cells_matches_direct_grid(ray_session):
    """The serialized (cell, inside) rows must reproduce the closing
    grid DIRECTLY (membership read off cov instead of rings) — an
    engine-internal cross-check independent of the SQL oracle — and a
    lowered member cap must drop exactly the too-big components."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from robosat_ray.geo.rectilinear import closing_grid, grid_area
    from robosat_ray.stages.merge import merge_ring_cells
    from robosat_ray.synth.footprints import footprints_table

    sf = "/root/testdata/sf0.001"
    feet = footprints_table(sf)
    ds = ray.data.from_arrow(feet)
    out = merge_ring_cells(ds, feet).to_pandas()
    assert len(out) > 0 and set(out["inside"].unique()) <= {0, 1}
    # per component: total inside-cell area == closing-grid area
    tx, ty = 2.0 * 0.0004, 2.0 * 0.0000024
    import pandas as pd

    fdf = feet.to_pandas()
    from robosat_ray.stages.merge import merge_components

    comp = merge_components(ds, feet).to_pandas()
    fdf = fdf.merge(comp, on="feature_id")
    for cid, g in list(fdf.groupby("component_id"))[:50]:
        xs, ys, cov = closing_grid(
            g["minx"].to_numpy(), g["miny"].to_numpy(),
            g["maxx"].to_numpy(), g["maxy"].to_numpy(), tx, ty,
        )
        want_area = grid_area(xs, ys, cov)
        rows = out[out["component_id"] == cid]
        got_area = float(
            ((rows["x1q"] - rows["x0q"]) * (rows["y1q"] - rows["y0q"]))[
                rows["inside"] == 1
            ].sum()
        ) / 1e20
        assert abs(got_area - want_area) <= 1e-9 * max(want_area, 1.0), cid
    # cap: with member_cap=1 only singleton components survive
    capped = merge_ring_cells(ds, feet, member_cap=1).to_pandas()
    sizes = comp.groupby("component_id").size()
    allowed = set(sizes[sizes <= 1].index)
    assert set(capped["component_id"].unique()) <= allowed
    assert len(set(capped["component_id"])) == len(
        set(out["component_id"]) & allowed
    )


def test_ring_cells_partition_invariant(ray_session):
    """merge_ring_cells rows identical under different input block
    structures (distributed invariant, SURVEY §5.2)."""
    import pandas as pd
    import ray.data

    from robosat_ray.stages.merge import merge_ring_cells
    from robosat_ray.synth.footprints import footprints_table

    feet = footprints_table("/root/testdata/sf0.001")

    def run(nblocks):
        ds = ray.data.from_arrow(feet)
        if nblocks:
            ds = ds.repartition(nblocks)
        df = merge_ring_cells(ds, feet).to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(None), run(9))


def test_merge_edge_shuffle_path_equals_broadcast(ray_session, monkeypatch):
    """Forcing MERGE_BROADCAST_FEET_CAP=0 routes edge detection
    through the cell co-partition shuffle plan (_edges_shuffle, no
    broadcast bbox index — the 100x-corpus path); component labels,
    union invariants, and the hash-hard ring-cell serialization must
    all match the broadcast EdgeFinder path bit for bit."""
    import pandas as pd

    import robosat_ray.stages.merge as mg
    from robosat_ray.synth.footprints import footprints_dataset, footprints_table

    sf = "/root/testdata/sf0.001"
    feet_t = footprints_table(sf)
    base_c = mg.merge_components(footprints_dataset(sf), feet_t).to_pandas()
    base_u = mg.merge_unions(footprints_dataset(sf), feet_t).to_pandas()
    base_r = mg.merge_ring_cells(footprints_dataset(sf), feet_t).to_pandas()
    monkeypatch.setattr(mg, "MERGE_BROADCAST_FEET_CAP", 0)
    shuf_c = mg.merge_components(footprints_dataset(sf), feet_t).to_pandas()
    shuf_u = mg.merge_unions(footprints_dataset(sf), feet_t).to_pandas()
    shuf_r = mg.merge_ring_cells(footprints_dataset(sf), feet_t).to_pandas()
    key = lambda df: (
        df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(key(base_c), key(shuf_c))
    pd.testing.assert_frame_equal(key(base_u), key(shuf_u))
    pd.testing.assert_frame_equal(key(base_r), key(shuf_r))
    assert base_u["n_members"].max() > 1  # real multi-feature components
