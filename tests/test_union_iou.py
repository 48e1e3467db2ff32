"""Reference union-IoU dedupe semantics (robosat/tools/dedupe.py:56-67:
IoU(pred, union(intersecting reference shapes))) — including the corpus
where max-pairwise and union-IoU rules DISAGREE, plus kernel
cross-checks (scanline vs inclusion-exclusion vs grid sampling)."""

import numpy as np
import pyarrow as pa
import pytest

from robosat_ray.geo.clip import polygon_area, union_iou
from robosat_ray.stages.dedupe import _rect_union_areas, dedupe_survivors
from tests.test_general_polygons import _poly_table


def _rect_rings(x0, y0, x1, y1):
    return [(
        np.array([x0, x1, x1, x0, x0], dtype=np.float64),
        np.array([y0, y0, y1, y1, y0], dtype=np.float64),
    )]


def _grid_union_iou(pred_rings, ref_ring_sets, n=600):
    """Independent approximation: dense point sampling of the
    indicator functions over the combined bbox."""
    from robosat_ray.geo.polygon import point_in_rings

    def opened(rings):
        return [(np.asarray(xs)[:-1], np.asarray(ys)[:-1]) for xs, ys in rings]

    all_rings = [pred_rings] + list(ref_ring_sets)
    xs = np.concatenate([np.asarray(r[0]) for rings in all_rings for r in rings])
    ys = np.concatenate([np.asarray(r[1]) for rings in all_rings for r in rings])
    gx = np.linspace(xs.min(), xs.max(), n)
    gy = np.linspace(ys.min(), ys.max(), n)
    px, py = np.meshgrid(gx, gy)
    px, py = px.ravel(), py.ravel()
    in_pred = point_in_rings(px, py, opened(pred_rings))
    in_refs = [point_in_rings(px, py, opened(r)) for r in ref_ring_sets]
    # intersectors: refs sharing sampled area with pred
    inters = [m for m in in_refs if (m & in_pred).sum() > 0]
    if not inters:
        return 0.0
    in_u = np.logical_or.reduce(inters)
    inter = (in_pred & in_u).sum()
    union = (in_pred | in_u).sum()
    return inter / union


def test_rect_disagreement_corpus(ray_session):
    """pred [0,2]x[0,1]; refs A [0,1]x[0,1], B [0.5,1.5]x[0,1] overlap
    each other. Pairwise IoU is 0.5 each (< 0.6 -> old rule keeps);
    union U = [0,1.5]x[0,1] gives IoU 0.75 (>= 0.6 -> reference rule
    drops). A far-away pred must survive."""
    import ray.data

    feet = _poly_table([
        (1, "building", _rect_rings(0.0, 0.0, 1.0, 1.0)),
        (2, "building", _rect_rings(0.5, 0.0, 1.5, 1.0)),
    ])
    preds = _poly_table([
        (10, "x", _rect_rings(0.0, 0.0, 2.0, 1.0)),
        (11, "x", _rect_rings(30.0, 0.2, 31.0, 0.4)),
    ]).rename_columns(["pred_id", "kind", "minx", "miny", "maxx", "maxy", "rings"]
    ).drop_columns(["kind"])
    got = sorted(
        r["pred_id"]
        for r in dedupe_survivors(
            ray.data.from_arrow(preds), feet, threshold=0.6
        ).take_all()
    )
    assert got == [11]
    # sanity: the pairwise rule would have kept BOTH
    ious = []
    for rect in [(0.0, 0.0, 1.0, 1.0), (0.5, 0.0, 1.5, 1.0)]:
        u = union_iou(_rect_rings(0.0, 0.0, 2.0, 1.0), [_rect_rings(*rect)])
        ious.append(u)
    assert max(ious) < 0.6


def test_union_iou_general_overlapping_intersectors():
    """Two overlapping L-shapes vs a rect pred: exact union_iou must
    match dense grid sampling (the two rules disagree here too)."""
    def L(ox, oy, w=2.0, h=2.0):
        xs = np.array([ox, ox + w, ox + w, ox + w / 2, ox + w / 2, ox, ox])
        ys = np.array([oy, oy, oy + h / 2, oy + h / 2, oy + h, oy + h, oy])
        return [(xs, ys)]

    pred = _rect_rings(0.0, 0.0, 3.0, 2.0)
    refs = [L(0.0, 0.0), L(0.8, 0.0)]
    exact = union_iou(pred, refs)
    approx = _grid_union_iou(pred, refs)
    assert exact > 0.0
    assert abs(exact - approx) < 0.02


def test_rect_scanline_matches_inclusion_exclusion():
    """_rect_union_areas (coordinate compression) and union_iou
    (subset inclusion-exclusion) agree to float precision on random
    overlapping rect sets."""
    rng = np.random.RandomState(7)
    for _ in range(25):
        k = rng.randint(1, 6)
        fx0 = rng.uniform(0, 4, k)
        fy0 = rng.uniform(0, 4, k)
        fx1 = fx0 + rng.uniform(0.5, 3, k)
        fy1 = fy0 + rng.uniform(0.5, 3, k)
        px0, py0, px1, py1 = 1.0, 1.0, 4.0, 4.0
        # keep only rects that positively intersect the pred
        m = (fx0 < px1) & (px0 < fx1) & (fy0 < py1) & (py0 < fy1)
        if not m.any():
            continue
        fx0, fy0, fx1, fy1 = fx0[m], fy0[m], fx1[m], fy1[m]
        area_u, inter_u = _rect_union_areas(px0, py0, px1, py1, fx0, fy0, fx1, fy1)
        area_p = (px1 - px0) * (py1 - py0)
        got = inter_u / (area_p + area_u - inter_u)
        want = union_iou(
            _rect_rings(px0, py0, px1, py1),
            [_rect_rings(a, b, c, d) for a, b, c, d in zip(fx0, fy0, fx1, fy1)],
        )
        assert abs(got - want) < 1e-9, (got, want)


def test_union_iou_no_intersectors_is_zero():
    assert union_iou(_rect_rings(0, 0, 1, 1), []) == 0.0


def test_union_iou_hole_polygon():
    """Intersector with a hole: union area must exclude the hole."""
    outer = _rect_rings(0.0, 0.0, 4.0, 4.0)[0]
    hole = _rect_rings(1.0, 1.0, 3.0, 3.0)[0]
    ref = [outer, hole]  # area 16 - 4 = 12
    pred = _rect_rings(0.0, 0.0, 4.0, 4.0)
    v = union_iou(pred, [ref])
    # inter = 12, union = 16 + 12 - 12 = 16
    assert abs(v - 12.0 / 16.0) < 1e-12
    assert abs(polygon_area(ref) - 12.0) < 1e-12


def test_union_iou_high_k_raster_fallback():
    """Above max_k the exact inclusion-exclusion hands off to the
    deterministic raster approximation instead of failing — the
    many-intersector value must track the exact small-k value."""
    rects = [_rect_rings(0.1 * i, 0.0, 0.1 * i + 0.5, 1.0) for i in range(25)]
    pred = _rect_rings(0.0, 0.0, 3.0, 1.0)
    approx = union_iou(pred, rects)          # k=25 -> raster path
    exact = union_iou(pred, rects[:6], max_k=20)  # overlapping chain subset
    # union of all 25 rects = [0, 2.9]x[0,1]; inter = 2.9; union = 3.0
    assert abs(approx - 2.9 / 3.0) < 0.02, approx
    assert 0 < exact < 1


def test_dedupe_shuffle_path_equals_broadcast(ray_session):
    """Forcing strategy='shuffle' routes dedupe through the cell
    co-partition plan (no broadcast reference table); the survivor set
    must equal the broadcast DedupeProber path exactly."""
    from robosat_ray.stages.dedupe import dedupe_survivors
    from robosat_ray.synth.footprints import (
        footprints_dataset,
        footprints_table,
        predicted_dataset,
    )

    sf = "/root/testdata/sf0.001"
    feet_t = footprints_table(sf)
    base = dedupe_survivors(
        predicted_dataset(sf), feet_t, strategy="broadcast"
    ).to_pandas()
    shuf = dedupe_survivors(
        predicted_dataset(sf), feet_t, strategy="shuffle",
        feet_ds=footprints_dataset(sf),
    ).to_pandas()
    assert sorted(base["pred_id"]) == sorted(shuf["pred_id"])
    assert len(base) > 0
