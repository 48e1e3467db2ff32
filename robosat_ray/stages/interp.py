"""Inverse-distance-weighted (IDW) interpolation of a page metric to
tile centers — the raster-interpolation analog of the reference's
per-tile statistics tooling (robosat computes per-tile class stats in
robosat/tools/weights.py:23-41 and treats the slippy-map tile lattice
as its raster grid in robosat/tools/cover.py:18-27; IDW extends that
lattice stat to a smooth surface estimate the way GIS rasterizers do).

Each page contributes to the 9 tiles of its 3x3 tile neighborhood (a
halo exchange — the same adjacent-tile pattern as scorer.py's border
handling): weight w = IDW_WSCALE // (d2 + 1), where d2 is the squared
pixel distance (z tiles of 256 px) from the page to the neighbor
tile's center. After the ONE float floor() that quantizes the page
onto the global pixel lattice (mirrored expression-tree-identically
in the SQL twin), everything is integer arithmetic, so engine and
oracle agree bit-for-bit. Output covers exactly the OCCUPIED tiles
(n_own > 0); per tile the IDW estimate is the exact floor ratio
idw_milli = (sum w*v * 1000) // sum w.

Scale shape: the per-batch combiner compacts each block to
(tile, num, den, n_own) partial rows (<= 9 x unique tiles per block)
before ONE tile-bounded groupby Sum — the raw pages never shuffle.
int64 headroom: w <= 2^24 and v = n_chars < 2^12, so each point-tile
contribution is < 2^36; a single tile would need ~2^27 contributing
pages to threaten int64, an order beyond the hottest city tile at
10^12 docs. No antimeridian wrap: qx=-1 never matches qx=4095
(planar-lattice treatment, consistent with the join/knn family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import robosat_ray.constants as C

# integer IDW weight scale: w = IDW_WSCALE // (d2_px + 1)
IDW_WSCALE = 1 << 24
_PIX = 256  # slippy-map tile edge in pixels (reference tile size)


def page_pixels(ids: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """doc_id -> global integer pixel coords at zoom z (256px tiles).
    Exact-op chain (mirrored in oracle.IDW_INTERP): xf = (lon + 180) /
    360 * 2^z ; px = floor(xf * 256) — the standard tile id is then
    px // 256 (floor(256x)//256 == floor(x) for x >= 0)."""
    from robosat_ray.synth.pages import page_coords

    lon, my = page_coords(ids)
    n = float(1 << z)
    xf = (lon + 180.0) / 360.0 * n
    yf = my * n
    px = np.floor(xf * 256.0).astype(np.int64)
    py = np.floor(yf * 256.0).astype(np.int64)
    return px, py


def idw_tile_interp(docs_ds, z: int = C.Z_JOIN, value_col: str = "n_chars"):
    """-> Dataset (tile_x, tile_y, n_own, wsum, idw_milli) over the
    occupied tiles at zoom z. docs_ds needs (doc_id, value_col)."""
    from ray.data.aggregate import Sum

    ni = 1 << z

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        v = batch.column(value_col).to_numpy().astype(np.int64)
        px, py = page_pixels(ids, z)
        tx = px // _PIX
        ty = py // _PIX
        keys, nums, dens, owns = [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                qx = tx + dx
                qy = ty + dy
                ddx = px - (qx * _PIX + _PIX // 2)
                ddy = py - (qy * _PIX + _PIX // 2)
                w = IDW_WSCALE // (ddx * ddx + ddy * ddy + 1)
                keys.append(qx * ni + qy)
                nums.append(w * v)
                dens.append(w)
                owns.append(
                    np.full(len(ids), 1 if dx == 0 and dy == 0 else 0, np.int64)
                )
        key = np.concatenate(keys)
        num = np.concatenate(nums)
        den = np.concatenate(dens)
        own = np.concatenate(owns)
        uniq, codes = np.unique(key, return_inverse=True)
        ns = np.zeros(len(uniq), np.int64)
        ds_ = np.zeros(len(uniq), np.int64)
        os_ = np.zeros(len(uniq), np.int64)
        np.add.at(ns, codes, num)
        np.add.at(ds_, codes, den)
        np.add.at(os_, codes, own)
        return pa.table(
            {
                "tkey": pa.array(uniq),
                "num": pa.array(ns),
                "den": pa.array(ds_),
                "n_own": pa.array(os_),
            }
        )

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tkey")
        .aggregate(
            Sum("num", alias_name="num"),
            Sum("den", alias_name="den"),
            Sum("n_own", alias_name="n_own"),
        )
        .filter(expr="n_own > 0")
    )

    def finish(batch: pa.Table) -> pa.Table:
        tk = batch.column("tkey").to_numpy()
        num = batch.column("num").to_numpy()
        den = batch.column("den").to_numpy()
        # occupied-tile-bounded table: exact Python-int ratio (the
        # num*1000 step is the only place int64 could clip first)
        milli = np.fromiter(
            (int(a) * 1000 // int(b) for a, b in zip(num, den)),
            dtype=np.int64,
            count=len(num),
        )
        # post-filter keys are all >= 0 (an occupied tile has a page
        # in it, and pages live on the non-negative lattice)
        return pa.table(
            {
                "tile_x": pa.array(tk // ni),
                "tile_y": pa.array(tk % ni),
                "n_own": batch.column("n_own"),
                "wsum": pa.array(den),
                "idw_milli": pa.array(milli),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
