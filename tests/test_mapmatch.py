"""Nearest-footprint map matching (stages/mapmatch.py)."""

import numpy as np
import pyarrow as pa

import robosat_ray.constants as C
from robosat_ray.geo.tiles import lonmy_to_tile
from robosat_ray.stages.mapmatch import nearest_footprint, quantize_plane
from robosat_ray.synth.footprints import footprint_centers
from robosat_ray.synth.pages import page_coords


def _brute(ids: np.ndarray, keys: np.ndarray, z: int):
    """Quadratic reference: for each page, scan ALL footprints, keep
    those with center in the 3x3 ring, min (d2, feature_id)."""
    lon, my = page_coords(ids)
    xq, yq = quantize_plane(lon, my)
    tx, ty = lonmy_to_tile(lon, my, z)
    cx, cy = footprint_centers(keys)
    cxq, cyq = quantize_plane(cx, cy)
    ftx, fty = lonmy_to_tile(cx, cy, z)
    out = {}
    for i in range(len(ids)):
        best = None
        for j in range(len(keys)):
            if abs(int(ftx[j]) - int(tx[i])) > 1 or abs(int(fty[j]) - int(ty[i])) > 1:
                continue
            d2 = (int(xq[i]) - int(cxq[j])) ** 2 + (int(yq[i]) - int(cyq[j])) ** 2
            cand = (d2, int(keys[j]))
            if best is None or cand < best:
                best = cand
        if best is not None:
            out[int(ids[i])] = (best[1], best[0])
    return out


def _points(ids):
    import ray.data

    lon, my = page_coords(ids)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "lon": pa.array(lon),
                "my": pa.array(my),
            }
        )
    )


def test_matches_quadratic_reference(ray_session):
    ids = np.arange(1, 500, dtype=np.int64)
    keys = np.arange(1, 300, dtype=np.int64)
    want = _brute(ids, keys, C.Z_JOIN)
    got = nearest_footprint(_points(ids), keys).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        fid, d2 = want[r.doc_id]
        assert (r.feature_id, r.d2q) == (fid, d2)
        assert r.kind == C.FOOT_KINDS[fid % 4]


def test_partition_invariance(ray_session):
    ids = np.arange(1, 800, dtype=np.int64)
    keys = np.arange(1, 200, dtype=np.int64)
    import pandas as pd

    a = (
        nearest_footprint(_points(ids), keys)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        nearest_footprint(_points(ids).repartition(13), keys)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_ring_bound_is_real(ray_session):
    """A footprint 2+ tiles away must NOT match even if it is the only
    one: city pages vs a single far-background footprint."""
    ids = np.array([8], dtype=np.int64)  # a city page (8 % 10 < 6)
    # hunt for a partkey whose center lands >1 tile from page 8's tile
    lon, my = page_coords(ids)
    tx, ty = lonmy_to_tile(lon, my, C.Z_JOIN)
    for k in range(1, 2000):
        cx, cy = footprint_centers(np.array([k], dtype=np.int64))
        fx, fy = lonmy_to_tile(cx, cy, C.Z_JOIN)
        if abs(int(fx[0]) - int(tx[0])) > 1 or abs(int(fy[0]) - int(ty[0])) > 1:
            far = k
            break
    got = nearest_footprint(_points(ids), np.array([far], dtype=np.int64)).to_pandas()
    assert len(got) == 0
