"""Rasterize stage: footprint polygons -> per-tile binary masks
(SURVEY.md J2 + M3 + A3; reference robosat/tools/rasterize.py:86-141:
driver-RAM feature→tile inverted map + per-tile burn + max-merge with
existing PNGs). Here: a flat-map explode to covered tiles, a
groupby-tile shuffle, and a scanline burn per group; left-outer
semantics (tiles with no features get all-zero masks) via union with
an empty-payload tile list, and multi-feature tiles max-merge inside
the group (associative & idempotent, so resume/rerun is safe).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo import tiles as T
from robosat_ray.geo.raster import fill_rings


def _explode_to_tiles(batch: pa.Table, z: int) -> pa.Table:
    """One row per (footprint, covered tile): carries the rect bounds
    (geometry transport for burn; general rings would ride along the
    same way but rects keep the shuffle payload minimal)."""
    minx = batch.column("minx").to_numpy()
    miny = batch.column("miny").to_numpy()
    maxx = batch.column("maxx").to_numpy()
    maxy = batch.column("maxy").to_numpy()
    tx0, ty0, tx1, ty1 = T.tile_range(minx, miny, maxx, maxy, z)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    reps = (tx1 - tx0 + 1).astype(np.int64) * ny
    row = np.repeat(np.arange(len(minx)), reps)
    offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
    tx = tx0[row] + offs // ny[row]
    ty = ty0[row] + offs % ny[row]
    return pa.table(
        {
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
            "minx": pa.array(minx[row]),
            "miny": pa.array(miny[row]),
            "maxx": pa.array(maxx[row]),
            "maxy": pa.array(maxy[row]),
        }
    )


def rasterize(footprints_ds, z: int = C.Z_JOIN, size: int = 256, tiles_ds=None):
    """footprints -> masks Dataset (tile_x, tile_y, size, fg, data).

    tiles_ds (optional, columns tile_x/tile_y) adds left-outer
    semantics: listed tiles with no covering feature yield all-zero
    masks (reference rasterize.py:120-124)."""
    exploded = footprints_ds.map_batches(
        lambda b: _explode_to_tiles(b, z), batch_format="pyarrow"
    )
    if tiles_ds is not None:
        def pad(batch: pa.Table) -> pa.Table:
            m = len(batch)
            return pa.table(
                {
                    "tile_x": batch.column("tile_x"),
                    "tile_y": batch.column("tile_y"),
                    "minx": pa.nulls(m, pa.float64()),
                    "miny": pa.nulls(m, pa.float64()),
                    "maxx": pa.nulls(m, pa.float64()),
                    "maxy": pa.nulls(m, pa.float64()),
                }
            )

        exploded = exploded.union(tiles_ds.map_batches(pad, batch_format="pyarrow"))

    # groupby a bucket of the tile key (64 groups) rather than the tile
    # itself (thousands of single-tile pandas groups pay more per-group
    # overhead than the burn); per-tile split happens inside the group
    def tag(b: pa.Table) -> pa.Table:
        tx = b.column("tile_x").to_numpy()
        ty = b.column("tile_y").to_numpy()
        from robosat_ray.functions.hashing import hash_bucket2

        bucket = hash_bucket2(tx, ty, 64)
        return b.append_column("bucket", pa.array(bucket))

    def burn_bucket(group, z=z, size=size):
        # All features covering each tile -> one (size, size) uint8
        # mask, max-merged. Axis-aligned rects take a vectorized direct
        # fill with the SAME pixel-center rule as the scanline kernel
        # (a = first center >= edge; identical for rects, tested).
        # Tile grouping is a numpy lexsort + boundary scan — a pandas
        # sub-groupby with a per-tile DataFrame paid more per-group
        # overhead than the burn itself (same fix as the scorer
        # stitch/pair kernels).
        import pandas as pd

        txa = group["tile_x"].to_numpy(np.int64)
        tya = group["tile_y"].to_numpy(np.int64)
        minx = group["minx"].to_numpy(np.float64)
        miny = group["miny"].to_numpy(np.float64)
        maxx = group["maxx"].to_numpy(np.float64)
        maxy = group["maxy"].to_numpy(np.float64)
        order = np.lexsort((tya, txa))
        txa, tya = txa[order], tya[order]
        minx, miny, maxx, maxy = minx[order], miny[order], maxx[order], maxy[order]
        m = len(txa)
        change = np.empty(m, dtype=bool)
        if m:
            change[0] = True
            change[1:] = (txa[1:] != txa[:-1]) | (tya[1:] != tya[:-1])
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], m)
        n = float(1 << z)
        out_x, out_y, out_fg, out_data = [], [], [], []
        for s, e in zip(starts, ends):
            tx, ty = int(txa[s]), int(tya[s])
            west = tx / n * 360.0 - 180.0
            east = (tx + 1) / n * 360.0 - 180.0
            north = ty / n
            south = (ty + 1) / n
            sx = size / (east - west)
            sy = size / (south - north)
            mask = np.zeros((size, size), dtype=np.uint8)
            sel = ~np.isnan(minx[s:e])
            if sel.any():
                x0 = np.clip(np.ceil((minx[s:e][sel] - west) * sx - 0.5).astype(np.int64), 0, size)
                x1 = np.clip(np.ceil((maxx[s:e][sel] - west) * sx - 0.5).astype(np.int64), 0, size)
                y0 = np.clip(np.ceil((miny[s:e][sel] - north) * sy - 0.5).astype(np.int64), 0, size)
                y1 = np.clip(np.ceil((maxy[s:e][sel] - north) * sy - 0.5).astype(np.int64), 0, size)
                for a, b, c, d in zip(x0, x1, y0, y1):
                    if b > a and d > c:
                        mask[c:d, a:b] = 1
            out_x.append(tx)
            out_y.append(ty)
            out_fg.append(int(np.count_nonzero(mask)))
            out_data.append(mask.tobytes())
        return pd.DataFrame(
            {
                "tile_x": np.array(out_x, dtype=np.int64),
                "tile_y": np.array(out_y, dtype=np.int64),
                "size": np.full(len(out_x), size, dtype=np.int64),
                "fg": np.array(out_fg, dtype=np.int64),
                "data": pd.Series(out_data, dtype=object),
            }
        )

    return (
        exploded.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(burn_bucket, batch_format="pandas")
    )


def mask_png_stats(masks_ds):
    """masks -> the reference's on-disk mask layout and back: encode
    each burned mask as a paletted PNG (denim/orange PLTE, the
    tools/masks.py:62-69 writer semantics re-expressed in the
    from-scratch codecs/png.py) and immediately re-parse the BYTES;
    fg count and a positional pixel checksum are recomputed from the
    DECODED class indices, so any container bug breaks the oracle
    row. Pure streaming map — one row per tile in and out."""

    def enc_dec(batch: pa.Table) -> pa.Table:
        from robosat_ray.codecs.palette import decode_mask_png, encode_mask_png

        sizes = batch.column("size").to_numpy()
        datas = batch.column("data").to_pylist()
        fg = np.zeros(len(datas), np.int64)
        ps = np.zeros(len(datas), np.int64)
        for k, (s, d) in enumerate(zip(sizes, datas)):
            s = int(s)
            mask = np.frombuffer(d, np.uint8).reshape(s, s)
            idx, pal = decode_mask_png(encode_mask_png(mask))
            assert pal.shape == (2, 3)
            fg[k] = int(np.count_nonzero(idx))
            ys, xs = np.nonzero(idx)
            ps[k] = int((ys.astype(np.int64) * s + xs).sum())
        return pa.table(
            {
                "tile_x": batch.column("tile_x"),
                "tile_y": batch.column("tile_y"),
                "fg": pa.array(fg),
                "pixsum": pa.array(ps),
            }
        )

    return masks_ds.map_batches(enc_dec, batch_format="pyarrow")
