"""Featurize stage: binary masks -> vector polygons (SURVEY.md
M8-M15; reference robosat/features/core.py + features/parking.py:
threshold -> denoise (open) -> grow (close) -> contours+hierarchy ->
Douglas-Peucker simplify -> pixel->world featurize -> ring assembly).

Embarrassingly parallel map_batches: contours never cross tile borders
by construction (reference behavior; cross-tile union is merge's job).
Output geometry is in the engine (lon, my) plane.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo.contours import find_contours
from robosat_ray.geo.morphology import closing, opening
from robosat_ray.geo.polygon import shoelace_area
from robosat_ray.geo.simplify import simplify_ring


def featurize_mask(
    mask: np.ndarray,
    tx: int,
    ty: int,
    z: int,
    denoise_px: int = 0,
    grow_px: int = 0,
    simplify_ratio: float = 0.0,
    min_ring_px: int = 3,
):
    """One mask -> list of polygons [{'rings': [(lon, my) rings],
    'area_px': float}] following the reference's stage order
    (features/parking.py:19-100)."""
    size = mask.shape[0]
    m = (mask != 0).astype(np.uint8)  # threshold (tools/features.py:46-47)
    if denoise_px > 1:
        m = opening(m, denoise_px)
    if grow_px > 1:
        m = closing(m, grow_px)
    comps = find_contours(m)
    n = float(1 << z)
    west = tx / n * 360.0 - 180.0
    east = (tx + 1) / n * 360.0 - 180.0
    north = ty / n
    south = (ty + 1) / n
    fx = (east - west) / size
    fy = (south - north) / size
    out = []
    for comp in comps:
        rings_px = [comp["outer"]] + comp["holes"]
        rings_w = []
        area_px = 0.0
        for i, (xs, ys) in enumerate(rings_px):
            if simplify_ratio > 0:
                xs, ys = simplify_ring(xs, ys, simplify_ratio)
            if len(xs) < min_ring_px + 1:
                if i == 0:
                    rings_w = []
                    break
                continue  # drop degenerate holes (reference skips <3-vertex rings)
            a = abs(shoelace_area(xs[:-1], ys[:-1]))
            area_px += a if i == 0 else -a
            lon = west + xs * fx
            my = north + ys * fy
            rings_w.append((lon, my))
        if rings_w:
            out.append({"rings": rings_w, "area_px": area_px})
    return out


def _rings_to_arrow(all_rings):
    """list of polygons (list of (xs, ys) rings) -> Arrow
    list<list<struct<x,y>>> column."""
    pts_x, pts_y, ring_off, poly_off = [], [], [0], [0]
    for rings in all_rings:
        for xs, ys in rings:
            pts_x.append(xs)
            pts_y.append(ys)
            ring_off.append(ring_off[-1] + len(xs))
        poly_off.append(poly_off[-1] + len(rings))
    xs = np.concatenate(pts_x) if pts_x else np.array([], dtype=np.float64)
    ys = np.concatenate(pts_y) if pts_y else np.array([], dtype=np.float64)
    pts = pa.StructArray.from_arrays(
        [pa.array(xs, type=pa.float64()), pa.array(ys, type=pa.float64())],
        names=["x", "y"],
    )
    ring = pa.ListArray.from_arrays(pa.array(ring_off, type=pa.int32()), pts)
    return pa.ListArray.from_arrays(pa.array(poly_off, type=pa.int32()), ring)


def featurize_batch(
    batch: pa.Table,
    z: int,
    denoise_px: int = 0,
    grow_px: int = 0,
    simplify_ratio: float = 0.0,
) -> pa.Table:
    """masks batch (tile_x, tile_y, size, data) -> features batch
    (tile_x, tile_y, poly_idx, n_rings, n_vertices, area_px, bbox,
    rings)."""
    txs = batch.column("tile_x").to_numpy()
    tys = batch.column("tile_y").to_numpy()
    from robosat_ray.geo.raster import binary_views

    sizes = batch.column("size").to_numpy()
    datas = binary_views(batch.column("data"))  # zero-copy views
    rows = {k: [] for k in ("tile_x", "tile_y", "poly_idx", "n_rings", "n_vertices", "area_px", "minx", "miny", "maxx", "maxy")}
    all_rings = []
    for tx, ty, size, data in zip(txs, tys, sizes, datas):
        mask = np.frombuffer(data, dtype=np.uint8).reshape(size, size)
        polys = featurize_mask(
            mask, int(tx), int(ty), z, denoise_px, grow_px, simplify_ratio
        )
        for k, poly in enumerate(polys):
            rings = poly["rings"]
            rows["tile_x"].append(int(tx))
            rows["tile_y"].append(int(ty))
            rows["poly_idx"].append(k)
            rows["n_rings"].append(len(rings))
            rows["n_vertices"].append(int(sum(len(r[0]) for r in rings)))
            rows["area_px"].append(poly["area_px"])
            rows["minx"].append(float(rings[0][0].min()))
            rows["miny"].append(float(rings[0][1].min()))
            rows["maxx"].append(float(rings[0][0].max()))
            rows["maxy"].append(float(rings[0][1].max()))
            all_rings.append(rings)
    t = pa.table(
        {
            "tile_x": pa.array(rows["tile_x"], pa.int64()),
            "tile_y": pa.array(rows["tile_y"], pa.int64()),
            "poly_idx": pa.array(rows["poly_idx"], pa.int64()),
            "n_rings": pa.array(rows["n_rings"], pa.int64()),
            "n_vertices": pa.array(rows["n_vertices"], pa.int64()),
            "area_px": pa.array(rows["area_px"], pa.float64()),
            "minx": pa.array(rows["minx"], pa.float64()),
            "miny": pa.array(rows["miny"], pa.float64()),
            "maxx": pa.array(rows["maxx"], pa.float64()),
            "maxy": pa.array(rows["maxy"], pa.float64()),
            "rings": _rings_to_arrow(all_rings),
        }
    )
    return t


def featurize(masks_ds, z: int = C.Z_JOIN, denoise_px: int = 0, grow_px: int = 0, simplify_ratio: float = 0.0):
    return masks_ds.map_batches(
        lambda b: featurize_batch(b, z, denoise_px, grow_px, simplify_ratio),
        batch_format="pyarrow",
    )


def _moments_batch(batch: pa.Table, z: int, size: int) -> pa.Table:
    """One featurize-output batch -> per-polygon integer pixel moments
    of the region enclosed by the OUTPUT rings: world coords -> inverse
    px->world affine -> even-odd fill -> (n, Σi, Σj, Σi², Σj², Σij).
    Vectorized nested-list decode (flat values + offsets); the per-
    polygon loop is over fills, not vertices."""
    from robosat_ray.geo.raster import fill_rings

    txs = batch.column("tile_x").to_numpy()
    tys = batch.column("tile_y").to_numpy()
    col = batch.column("rings")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ring_arr = col.values
    pts = ring_arr.values
    flat_x = pts.field("x").to_numpy()
    flat_y = pts.field("y").to_numpy()
    poly_off = np.asarray(col.offsets)
    ring_off = np.asarray(ring_arr.offsets)

    n = float(1 << z)
    out = {k: np.empty(len(batch), dtype=np.int64) for k in ("n_px", "si", "sj", "sii", "sjj", "sij")}
    for r in range(len(batch)):
        tx, ty = int(txs[r]), int(tys[r])
        west = tx / n * 360.0 - 180.0
        east = (tx + 1) / n * 360.0 - 180.0
        north = ty / n
        south = (ty + 1) / n
        fx = (east - west) / size
        fy = (south - north) / size
        rings_px = []
        for k in range(poly_off[r], poly_off[r + 1]):
            lon = flat_x[ring_off[k] : ring_off[k + 1]]
            my = flat_y[ring_off[k] : ring_off[k + 1]]
            rings_px.append(((lon - west) / fx, (my - north) / fy))
        grid = fill_rings(rings_px, size)
        jj, ii = np.nonzero(grid)
        ii = ii.astype(np.int64)
        jj = jj.astype(np.int64)
        out["n_px"][r] = len(ii)
        out["si"][r] = ii.sum()
        out["sj"][r] = jj.sum()
        out["sii"][r] = (ii * ii).sum()
        out["sjj"][r] = (jj * jj).sum()
        out["sij"][r] = (ii * jj).sum()
    return pa.table(
        {
            "tile_x": batch.column("tile_x"),
            "tile_y": batch.column("tile_y"),
            **{k: pa.array(v) for k, v in out.items()},
        }
    )


def _edges_batch(batch: pa.Table, z: int, size: int) -> pa.Table:
    """One featurize-output batch -> canonical boundary-edge rows, the
    LOSSLESS serialization of the ring geometry: every output ring is a
    rectilinear path on integer pixel corners, so decomposing its
    segments into unit edges recovers exactly the boundary-edge SET of
    the component's pixel region (rings <-> edge set up to traversal
    order, which is non-semantic). Rows: (tile_x, tile_y, ckey, x0,
    y0, x1, y1) with each edge's lexicographically-(y,x)-smaller corner
    first and ckey = the component's smallest boundary corner — the
    same rows the FEATURIZE_EDGES SQL oracle derives from its
    recursive-CTE component pixels, so the driver's sorted value-hash
    pins the full geometry (incl. holes), not just invariants."""
    txs = batch.column("tile_x").to_numpy()
    tys = batch.column("tile_y").to_numpy()
    col = batch.column("rings")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ring_arr = col.values
    pts = ring_arr.values
    flat_x = pts.field("x").to_numpy()
    flat_y = pts.field("y").to_numpy()
    poly_off = np.asarray(col.offsets)
    ring_off = np.asarray(ring_arr.offsets)

    n = float(1 << z)
    out_tx, out_ty, out_ck = [], [], []
    out_x0, out_y0, out_x1, out_y1 = [], [], [], []
    for r in range(len(batch)):
        tx, ty = int(txs[r]), int(tys[r])
        west = tx / n * 360.0 - 180.0
        east = (tx + 1) / n * 360.0 - 180.0
        north = ty / n
        south = (ty + 1) / n
        fx = (east - west) / size
        fy = (south - north) / size
        seg_x0, seg_y0, seg_x1, seg_y1 = [], [], [], []
        for k in range(poly_off[r], poly_off[r + 1]):
            lon = flat_x[ring_off[k] : ring_off[k + 1]]
            my = flat_y[ring_off[k] : ring_off[k + 1]]
            xs = np.round((lon - west) / fx).astype(np.int64)
            ys = np.round((my - north) / fy).astype(np.int64)
            seg_x0.append(xs[:-1])
            seg_y0.append(ys[:-1])
            seg_x1.append(xs[1:])
            seg_y1.append(ys[1:])
        if not seg_x0:
            continue
        X0 = np.concatenate(seg_x0)
        Y0 = np.concatenate(seg_y0)
        X1 = np.concatenate(seg_x1)
        Y1 = np.concatenate(seg_y1)
        dx = np.sign(X1 - X0)
        dy = np.sign(Y1 - Y0)
        L = np.abs(X1 - X0) + np.abs(Y1 - Y0)  # axis-aligned segments
        idx = np.repeat(np.arange(len(L)), L)
        off = np.arange(int(L.sum()), dtype=np.int64) - np.repeat(np.cumsum(L) - L, L)
        ex0 = X0[idx] + dx[idx] * off
        ey0 = Y0[idx] + dy[idx] * off
        ex1 = ex0 + dx[idx]
        ey1 = ey0 + dy[idx]
        k0 = ey0 * 1024 + ex0
        k1 = ey1 * 1024 + ex1
        swap = k1 < k0
        cx0 = np.where(swap, ex1, ex0)
        cy0 = np.where(swap, ey1, ey0)
        cx1 = np.where(swap, ex0, ex1)
        cy1 = np.where(swap, ey0, ey1)
        ck = int(np.minimum(k0, k1).min())
        m = len(ex0)
        out_tx.append(np.full(m, tx, dtype=np.int64))
        out_ty.append(np.full(m, ty, dtype=np.int64))
        out_ck.append(np.full(m, ck, dtype=np.int64))
        out_x0.append(cx0)
        out_y0.append(cy0)
        out_x1.append(cx1)
        out_y1.append(cy1)

    def cat(parts):
        return pa.array(
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )

    return pa.table(
        {
            "tile_x": cat(out_tx),
            "tile_y": cat(out_ty),
            "ckey": cat(out_ck),
            "x0": cat(out_x0),
            "y0": cat(out_y0),
            "x1": cat(out_x1),
            "y1": cat(out_y1),
        }
    )


def featurize_edges(feats_ds, z: int = C.Z_JOIN, size: int = 64):
    """Featurize output -> canonical boundary-edge serialization (see
    _edges_batch) — the hash-hard driver form of the ring geometry."""
    return feats_ds.select_columns(["tile_x", "tile_y", "rings"]).map_batches(
        lambda b: _edges_batch(b, z, size), batch_format="pyarrow"
    )


def ring_pixel_moments(feats_ds, z: int = C.Z_JOIN, size: int = 64):
    """Featurize output -> per-polygon pixel moments of the ring-
    enclosed region (holes subtracted by the even-odd fill). The
    matching DuckDB oracle (FEATURIZE_MOMENTS) takes the same moments
    over recursive-CTE component pixels, pinning the ring geometry."""
    return feats_ds.select_columns(["tile_x", "tile_y", "rings"]).map_batches(
        lambda b: _moments_batch(b, z, size), batch_format="pyarrow"
    )
