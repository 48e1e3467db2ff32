"""Exact segment x rectangle intersection join — road-crossing
detection, the line-geometry join the PIP/bbox family doesn't cover
(reference parity: robosat derives road LINES and buffers them into
polygons, /root/reference/robosat/robosat/features wiring; here each
road's extended centerline segment is tested DIRECTLY against the
other roads' rects with an exact separating-axis predicate).

Geometry (mirrored bit-for-bit in oracle.SEG_INTERSECT):
- segment of road i = its rect diagonal extended 3x about the center:
  (2*minx - maxx, 2*miny - maxy) -> (2*maxx - minx, 2*maxy - miny),
  IEEE-exact in both engines; rect side = the UNexpanded road rects;
  ordered pairs with road_id <> other_id.
- coordinates quantized to the integer lattice (lon * 1e6, my * 1e8);
  predicate = inclusive bbox overlap AND the segment's line cuts the
  rect (NOT all four corners strictly on one side — int64 cross
  products, overflow-safe at |cross| <= ~7e16).

Scale shape: both sides explode to their covered Z_JOIN cells and meet
in ONE cell co-partition equi-join; each qualifying pair is emitted
EXACTLY ONCE by the owner-cell rule (the cell containing the overlap
bbox's min corner — guaranteed to be a shared cell), so there is no
pair-dedupe shuffle. No broadcast side: both inputs scale with the
corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import robosat_ray.constants as C
from robosat_ray.geo import tiles as T

XSCALE = 1_000_000.0
YSCALE = 100_000_000.0
_N = float(1 << C.Z_JOIN)
_NI = np.int64(1 << C.Z_JOIN)


def _tile_x(lon: np.ndarray) -> np.ndarray:
    return np.floor((lon + 180.0) / 360.0 * _N).astype(np.int64)


def _tile_y(my: np.ndarray) -> np.ndarray:
    return np.floor(my * _N).astype(np.int64)


def _explode_cells(minx, miny, maxx, maxy, cols: dict) -> pa.Table:
    """One row per covered Z_JOIN cell per box; carries `cols`."""
    tx0, ty0, tx1, ty1 = T.tile_range(minx, miny, maxx, maxy, C.Z_JOIN)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    nx = (tx1 - tx0 + 1).astype(np.int64)
    reps = nx * ny
    idx = np.repeat(np.arange(len(minx)), reps)
    # vectorized per-rect cartesian cell enumeration
    local = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps
    )
    cx = np.repeat(tx0, reps) + local // np.repeat(ny, reps)
    cy = np.repeat(ty0, reps) + local % np.repeat(ny, reps)
    out = {"cell": pa.array(cx * _NI + cy)}
    for name, arr in cols.items():
        out[name] = pa.array(arr[idx])
    return pa.table(out)


def seg_intersect(feet_ds):
    """footprints -> ordered (road_id, other_id) pairs whose extended
    road segment intersects the other road's rect (inclusive)."""
    from robosat_ray.stages.join import copartition_join

    def segs(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch.column("kind"), "road")
        b = batch.filter(m)
        minx = b.column("minx").to_numpy()
        miny = b.column("miny").to_numpy()
        maxx = b.column("maxx").to_numpy()
        maxy = b.column("maxy").to_numpy()
        exa = 2.0 * minx - maxx
        eya = 2.0 * miny - maxy
        exb = 2.0 * maxx - minx
        eyb = 2.0 * maxy - miny
        return _explode_cells(
            exa, eya, exb, eyb,
            {
                "road_id": b.column("feature_id").to_numpy(),
                "r_minx": exa,
                "r_miny": eya,
                "ax": np.floor(exa * XSCALE + 0.5).astype(np.int64),
                "ay": np.floor(eya * YSCALE + 0.5).astype(np.int64),
                "bx": np.floor(exb * XSCALE + 0.5).astype(np.int64),
                "by_": np.floor(eyb * YSCALE + 0.5).astype(np.int64),
            },
        )

    def rects(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch.column("kind"), "road")
        b = batch.filter(m)
        minx = b.column("minx").to_numpy()
        miny = b.column("miny").to_numpy()
        maxx = b.column("maxx").to_numpy()
        maxy = b.column("maxy").to_numpy()
        return _explode_cells(
            minx, miny, maxx, maxy,
            {
                "other_id": b.column("feature_id").to_numpy(),
                "b_minx": minx,
                "b_miny": miny,
                "bminx": np.floor(minx * XSCALE + 0.5).astype(np.int64),
                "bminy": np.floor(miny * YSCALE + 0.5).astype(np.int64),
                "bmaxx": np.floor(maxx * XSCALE + 0.5).astype(np.int64),
                "bmaxy": np.floor(maxy * YSCALE + 0.5).astype(np.int64),
            },
        )

    r = feet_ds.map_batches(segs, batch_format="pyarrow")
    g = feet_ds.map_batches(rects, batch_format="pyarrow")
    hints = {
        "left": {
            "cell": pa.int64(), "road_id": pa.int64(),
            "r_minx": pa.float64(), "r_miny": pa.float64(),
            "ax": pa.int64(), "ay": pa.int64(),
            "bx": pa.int64(), "by_": pa.int64(),
        },
        "right": {
            "cell": pa.int64(), "other_id": pa.int64(),
            "b_minx": pa.float64(), "b_miny": pa.float64(),
            "bminx": pa.int64(), "bminy": pa.int64(),
            "bmaxx": pa.int64(), "bmaxy": pa.int64(),
        },
    }
    cand = copartition_join(r, g, on="cell", schema_hints=hints)

    def verify(batch: pa.Table) -> pa.Table:
        ax = batch.column("ax").to_numpy()
        ay = batch.column("ay").to_numpy()
        bx = batch.column("bx").to_numpy()
        by = batch.column("by_").to_numpy()
        x0 = batch.column("bminx").to_numpy()
        y0 = batch.column("bminy").to_numpy()
        x1 = batch.column("bmaxx").to_numpy()
        y1 = batch.column("bmaxy").to_numpy()
        # inclusive bbox overlap (diagonal => seg bbox == road rect)
        bb = (ax <= x1) & (bx >= x0) & (ay <= y1) & (by >= y0)
        dx, dy = bx - ax, by - ay
        c1 = dx * (y0 - ay) - dy * (x0 - ax)
        c2 = dx * (y0 - ay) - dy * (x1 - ax)
        c3 = dx * (y1 - ay) - dy * (x0 - ax)
        c4 = dx * (y1 - ay) - dy * (x1 - ax)
        pos = (c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0)
        neg = (c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)
        hit = bb & ~pos & ~neg
        hit &= (
            batch.column("road_id").to_numpy()
            != batch.column("other_id").to_numpy()
        )
        # owner-cell rule: emit only in the cell of the overlap bbox's
        # min corner (float tile math, identical in the SQL twin)
        ox = np.maximum(
            batch.column("r_minx").to_numpy(), batch.column("b_minx").to_numpy()
        )
        oy = np.maximum(
            batch.column("r_miny").to_numpy(), batch.column("b_miny").to_numpy()
        )
        owner = _tile_x(ox) * _NI + _tile_y(oy)
        hit &= owner == batch.column("cell").to_numpy()
        keep = pa.array(hit)
        return pa.table(
            {
                "road_id": batch.column("road_id").filter(keep),
                "other_id": batch.column("other_id").filter(keep),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")
