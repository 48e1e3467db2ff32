"""Tile cover + exact distinct (SURVEY.md §2 O2/J2; reference:
robosat/tools/cover.py:23-37 — per-feature burntiles.burn then a
driver-side `set()`); here: a vectorized flat-map explode with
per-batch partial dedup, then a groupby distinct (shuffle #1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo import tiles as T


def explode_cover_batch(batch: pa.Table, z: int) -> pa.Table:
    """footprint rows (minx..maxy bbox) -> covered (tile_x, tile_y)
    rows, pre-deduped within the batch (combiner before the shuffle)."""
    minx = batch.column("minx").to_numpy()
    miny = batch.column("miny").to_numpy()
    maxx = batch.column("maxx").to_numpy()
    maxy = batch.column("maxy").to_numpy()
    tx0, ty0, tx1, ty1 = T.tile_range(minx, miny, maxx, maxy, z)
    nx = (tx1 - tx0 + 1).astype(np.int64)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    reps = nx * ny
    # vectorized cartesian explode: for row i, offsets 0..reps[i]-1
    row = np.repeat(np.arange(len(minx)), reps)
    offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
    tx = tx0[row] + offs // ny[row]
    ty = ty0[row] + offs % ny[row]
    cells = tx * np.int64(1 << z) + ty
    uniq = np.unique(cells)
    return pa.table(
        {
            "tile_x": pa.array(uniq // np.int64(1 << z), type=pa.int64()),
            "tile_y": pa.array(uniq % np.int64(1 << z), type=pa.int64()),
        }
    )


def cover_tiles(footprints_ds, z: int = C.Z_JOIN):
    """Distinct covering tiles of all footprints at zoom z."""
    from ray.data.aggregate import Count

    exploded = footprints_ds.map_batches(
        lambda b: explode_cover_batch(b, z), batch_format="pyarrow"
    )
    distinct = exploded.groupby(["tile_x", "tile_y"]).aggregate(Count(alias_name="_n"))
    return distinct.drop_columns(["_n"])
