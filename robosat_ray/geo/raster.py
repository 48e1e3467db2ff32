"""Rasterization: scanline polygon fill on numpy grids, from scratch.

Replaces rasterio.features.rasterize as used by the reference's burn
(robosat/tools/rasterize.py:64-83: polygons in tile-mercator space ->
(size, size) uint8 mask, value 1). Convention: pixel (row j, col i)
covers [i, i+1) x [j, j+1) in pixel space; a pixel is set when its
CENTER (i+0.5, j+0.5) is inside the polygon (rasterio's default
all-touched=False center rule).
"""

from __future__ import annotations

import numpy as np


def fill_rings(rings, size: int, out: np.ndarray | None = None) -> np.ndarray:
    """Even-odd scanline fill of `rings` (list of (xs, ys) closed or
    open rings, coordinates in pixel space [0, size]) into a uint8
    (size, size) grid. Holes = nested rings (even-odd)."""
    if out is None:
        out = np.zeros((size, size), dtype=np.uint8)
    ys_c = np.arange(size, dtype=np.float64) + 0.5  # scanline y = row center
    # accumulate crossings per row in a parity grid
    for rxs, rys in rings:
        rxs = np.asarray(rxs, dtype=np.float64)
        rys = np.asarray(rys, dtype=np.float64)
        if len(rxs) >= 2 and rxs[0] == rxs[-1] and rys[0] == rys[-1]:
            rxs, rys = rxs[:-1], rys[:-1]
        x1, y1 = rxs, rys
        x2, y2 = np.roll(rxs, -1), np.roll(rys, -1)
        # edges x scanlines: edge crosses row j iff (y1 > yc) != (y2 > yc)
        cond = (y1[None, :] > ys_c[:, None]) != (y2[None, :] > ys_c[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (ys_c[:, None] - y1[None, :]) * (x2 - x1)[None, :] / (
                y2 - y1
            )[None, :]
        # for each row: sorted crossing xs -> fill between pairs
        for j in range(size):
            xs = np.sort(xint[j][cond[j]])
            for k in range(0, len(xs) - 1, 2):
                a = int(np.ceil(xs[k] - 0.5))
                b = int(np.ceil(xs[k + 1] - 0.5))  # first center >= xs[k+1]
                if b > a:
                    out[j, max(a, 0) : min(b, size)] ^= 1
    return out


def fill_rings_accumulate(ring_groups, size: int) -> np.ndarray:
    """Burn several polygons (each a list of rings) into one mask with
    max-merge semantics (value 1 where ANY polygon covers — matches the
    reference's np.maximum merge at robosat/tools/rasterize.py:131)."""
    out = np.zeros((size, size), dtype=np.uint8)
    for rings in ring_groups:
        m = fill_rings(rings, size)
        np.maximum(out, m, out=out)
    return out


def max_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Associative idempotent mask merge (reference rasterize.py:131-133)."""
    return np.maximum(a, b)


def fg_pixel_count(mask: np.ndarray) -> int:
    return int(np.count_nonzero(mask))


def binary_views(col) -> list:
    """Zero-copy numpy uint8 views into an Arrow binary column's flat
    buffer (one view per row) — replaces to_pylist() bytes copies in
    mask-consuming stages."""
    import pyarrow as pa

    out = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        odt = np.int64 if pa.types.is_large_binary(chunk.type) else np.int32
        offs = np.frombuffer(
            chunk.buffers()[1], dtype=odt, count=len(chunk) + 1,
            offset=chunk.offset * np.dtype(odt).itemsize,
        )
        data = np.frombuffer(chunk.buffers()[2], dtype=np.uint8)
        for i in range(len(chunk)):
            out.append(data[offs[i]:offs[i + 1]])
    return out


def binary_flat_chunks(col):
    """Zero-copy flat uint8 array per chunk of an Arrow binary column
    (all rows concatenated) — for whole-column reductions (bincount)."""
    import pyarrow as pa

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        if len(chunk) == 0:
            continue
        odt = np.int64 if pa.types.is_large_binary(chunk.type) else np.int32
        offs = np.frombuffer(
            chunk.buffers()[1], dtype=odt, count=len(chunk) + 1,
            offset=chunk.offset * np.dtype(odt).itemsize,
        )
        data = np.frombuffer(chunk.buffers()[2], dtype=np.uint8)
        yield data[offs[0]:offs[-1]]
