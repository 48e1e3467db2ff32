"""IDW tile interpolation (stages/interp.py)."""

import numpy as np
import pyarrow as pa

import robosat_ray.constants as C
from robosat_ray.stages.interp import IDW_WSCALE, idw_tile_interp, page_pixels

SF = "/root/testdata/sf0.001"


def _brute(ids: np.ndarray, vals: np.ndarray, z: int):
    """Quadratic reference: every page x every occupied tile in its
    3x3 neighborhood, Python-int arithmetic throughout."""
    px, py = page_pixels(ids, z)
    tx, ty = px // 256, py // 256
    acc: dict[tuple[int, int], list[int]] = {}
    for i in range(len(ids)):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                qx, qy = int(tx[i]) + dx, int(ty[i]) + dy
                cx, cy = qx * 256 + 128, qy * 256 + 128
                d2 = (int(px[i]) - cx) ** 2 + (int(py[i]) - cy) ** 2
                w = IDW_WSCALE // (d2 + 1)
                num, den, own = acc.setdefault((qx, qy), [0, 0, 0])
                acc[(qx, qy)] = [
                    num + w * int(vals[i]),
                    den + w,
                    own + (1 if dx == 0 and dy == 0 else 0),
                ]
    return {
        k: (v[0] * 1000 // v[1], v[1], v[2])
        for k, v in acc.items()
        if v[2] > 0
    }


def _run(ids, vals, **kw):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(vals)})
    )
    if kw.get("blocks"):
        ds = ds.repartition(kw["blocks"])
    return idw_tile_interp(ds).to_pandas()


def test_matches_quadratic_reference(ray_session):
    ids = np.arange(1, 400, dtype=np.int64)
    vals = (ids * 37) % 1000 + 1
    want = _brute(ids, vals, C.Z_JOIN)
    got = _run(ids, vals)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        milli, wsum, n_own = want[(r.tile_x, r.tile_y)]
        assert (r.idw_milli, r.wsum, r.n_own) == (milli, wsum, n_own)


def test_partition_invariance(ray_session):
    ids = np.arange(1, 600, dtype=np.int64)
    vals = (ids * 13) % 800 + 1
    a = _run(ids, vals).sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    b = (
        _run(ids, vals, blocks=17)
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_center_page_dominates(ray_session):
    """A page at a tile's own center gets the max weight there
    (d2 = 0 or nearly), so its tile's idw_milli ~ its own value."""
    ids = np.array([42], dtype=np.int64)
    vals = np.array([777], dtype=np.int64)
    got = _run(ids, vals)
    # one occupied tile only (its 8 neighbors have n_own = 0)
    assert len(got) == 1
    assert int(got.idw_milli.iloc[0]) == 777_000  # single contributor: exact


def test_pixel_lattice_consistent_with_tiles(ray_session):
    """px // 256 must equal the engine's standard tile id (the join
    key every other geo query uses)."""
    from robosat_ray.geo.tiles import lonmy_to_tile
    from robosat_ray.synth.pages import page_coords

    ids = np.arange(1, 5000, dtype=np.int64)
    px, py = page_pixels(ids, C.Z_JOIN)
    lon, my = page_coords(ids)
    tx, ty = lonmy_to_tile(lon, my, C.Z_JOIN)
    assert (px // 256 == tx).all()
    assert (py // 256 == ty).all()
