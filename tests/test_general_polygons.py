"""The spatial-join path with GENERAL polygons (concave L-shapes and
rings with holes) — not just the synthetic rects — verified against a
brute-force numpy PIP oracle. Exercises ring transport through Arrow,
the flat-edge pair-PIP kernel, both join strategies, and dedupe's
general-IoU fallback."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from robosat_ray import constants as C
from robosat_ray.geo.polygon import point_in_rings


def _poly_table(polys):
    """polys: list of (feature_id, kind, rings) where rings =
    [(xs, ys), ...] closed."""
    pts_x, pts_y, ring_off, poly_off = [], [], [0], [0]
    minx, miny, maxx, maxy = [], [], [], []
    for _, _, rings in polys:
        for xs, ys in rings:
            pts_x.append(np.asarray(xs, np.float64))
            pts_y.append(np.asarray(ys, np.float64))
            ring_off.append(ring_off[-1] + len(xs))
        poly_off.append(poly_off[-1] + len(rings))
        minx.append(min(x.min() for x, _ in [(np.asarray(r[0]), r[1]) for r in rings[:1]]))
        miny.append(np.asarray(rings[0][1]).min())
        maxx.append(np.asarray(rings[0][0]).max())
        maxy.append(np.asarray(rings[0][1]).max())
    xs = np.concatenate(pts_x)
    ys = np.concatenate(pts_y)
    pts = pa.StructArray.from_arrays(
        [pa.array(xs, pa.float64()), pa.array(ys, pa.float64())], names=["x", "y"]
    )
    ring = pa.ListArray.from_arrays(pa.array(ring_off, pa.int32()), pts)
    rings_arr = pa.ListArray.from_arrays(pa.array(poly_off, pa.int32()), ring)
    return pa.table(
        {
            "feature_id": pa.array([p[0] for p in polys], pa.int64()),
            "kind": pa.array([p[1] for p in polys], pa.string()),
            "minx": pa.array(minx, pa.float64()),
            "miny": pa.array(miny, pa.float64()),
            "maxx": pa.array(maxx, pa.float64()),
            "maxy": pa.array(maxy, pa.float64()),
            "rings": rings_arr,
        }
    )


def _general_polys():
    """A few concave/holed polygons inside city 0's cluster area."""
    cx, cy = C.CITY_LON[0], C.CITY_MY[0]
    w, h = 0.1, 0.0003

    def L(ox, oy):  # concave L
        xs = np.array([ox, ox + w, ox + w, ox + w / 2, ox + w / 2, ox, ox])
        ys = np.array([oy, oy, oy + h / 2, oy + h / 2, oy + h, oy + h, oy])
        return [(xs, ys)]

    def ring_with_hole(ox, oy):
        outer = (
            np.array([ox, ox + w, ox + w, ox, ox]),
            np.array([oy, oy, oy + h, oy + h, oy]),
        )
        hole = (
            np.array([ox + w / 4, ox + 3 * w / 4, ox + 3 * w / 4, ox + w / 4, ox + w / 4]),
            np.array([oy + h / 4, oy + h / 4, oy + 3 * h / 4, oy + 3 * h / 4, oy + h / 4]),
        )
        return [outer, hole]

    def tri(ox, oy):
        xs = np.array([ox, ox + w, ox + w / 2, ox])
        ys = np.array([oy, oy, oy + h, oy])
        return [(xs, ys)]

    return [
        (1, "building", L(cx - 0.1, cy - 0.0002)),
        (2, "water", ring_with_hole(cx - 0.03, cy - 0.00005)),
        (3, "parking", tri(cx + 0.0, cy - 0.00025)),
        (4, "road", L(cx - 0.06, cy + 0.00003)),
    ]


def _brute_join(points_df, polys):
    rows = []
    px = points_df["lon"].to_numpy()
    py = points_df["my"].to_numpy()
    for fid, kind, rings in polys:
        inside = point_in_rings(px, py, [(np.asarray(r[0])[:-1], np.asarray(r[1])[:-1]) for r in rings])
        for i in np.nonzero(inside)[0]:
            rows.append((points_df["doc_id"].iloc[i], fid))
    return sorted(rows)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_general_polygon_join_vs_brute_force(ray_session, strategy):
    import ray.data

    from robosat_ray.pipelines.flagship import points_dataset
    from robosat_ray.stages.spatial_join import broadcast_spatial_join, spatial_join

    sf = "/root/testdata/sf0.01"
    polys = _general_polys()
    feet = _poly_table(polys)
    pts = points_dataset(sf).select_columns(["doc_id", "url", "lon", "my", "cell"])
    if strategy == "broadcast":
        joined = broadcast_spatial_join(pts, feet, z=C.Z_JOIN)
    else:
        feet_ds = ray.data.from_arrow(feet)
        joined = spatial_join(pts, feet_ds, z=C.Z_JOIN)
    got = sorted(
        (r["doc_id"], r["feature_id"]) for r in joined.take_all()
    )
    want = _brute_join(points_dataset(sf).to_pandas(), polys)
    assert len(want) > 5, "fixture polygons must actually catch points"
    assert got == want


def test_general_polygon_dedupe_iou_path(ray_session):
    """Non-rect predicted shapes force dedupe's general clip-kernel
    fallback; survivors must match a brute-force union-IoU computation
    (grid-sampled, independent of the clip kernels)."""
    import ray.data

    from robosat_ray.stages.dedupe import dedupe_survivors

    polys = _general_polys()
    feet = _poly_table(polys)
    # predicted = the same shapes shifted by fractions of their width
    preds = []
    for fid, kind, rings in polys:
        dx = [0.002, 0.008, 0.05][fid % 3]
        shifted = [(np.asarray(xs) + dx, np.asarray(ys)) for xs, ys in rings]
        preds.append((fid, kind, shifted))
    pred_t = _poly_table(preds).rename_columns(
        ["pred_id", "kind", "minx", "miny", "maxx", "maxy", "rings"]
    ).drop_columns(["kind"])
    pred_ds = ray.data.from_arrow(pred_t)
    got = sorted(r["pred_id"] for r in dedupe_survivors(pred_ds, feet).take_all())
    # brute force: survivor iff IoU(pred, union(intersecting refs)) <
    # threshold, grid-sampled independently of the clip kernels
    from tests.test_union_iou import _grid_union_iou

    want = []
    for pid, _, prings in preds:
        pr = [(np.asarray(x), np.asarray(y)) for x, y in prings]
        v = _grid_union_iou(
            pr,
            [[(np.asarray(x), np.asarray(y)) for x, y in fr] for _, _, fr in polys],
        )
        assert abs(v - C.DEDUPE_IOU_THRESHOLD) > 0.03, (
            pid, v, "fixture IoU too close to threshold for a grid check")
        if v < C.DEDUPE_IOU_THRESHOLD:
            want.append(pid)
    assert got == sorted(want)
