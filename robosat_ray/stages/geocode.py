"""Geocode + tile-assignment stage (the role burntiles/mercantile play
at reference robosat/tools/cover.py:30 and robosat/tiles.py:98):
each page gets (lon, my) coordinates and a Web-Mercator z/x/y tile.

Geocoding here is deterministic synthesis (hash of doc_id — sandbox has
no geocoder); at 100 TB scale this stage would parse coordinates out of
the page (the html embeds a geo.position meta tag) or call a model —
either way a stateless vectorized map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo import tiles as T
from robosat_ray.synth.pages import page_coords


def geocode_batch(batch: pa.Table, z: int = C.Z_JOIN) -> pa.Table:
    """Adds lon, my, tile_x, tile_y, cell columns keyed off doc_id."""
    ids = batch.column("doc_id").to_numpy()
    lon, my = page_coords(ids)
    tx, ty = T.lonmy_to_tile(lon, my, z)
    cell = T.cell_id(tx, ty, z)
    return (
        batch.append_column("lon", pa.array(lon, type=pa.float64()))
        .append_column("my", pa.array(my, type=pa.float64()))
        .append_column("tile_x", pa.array(tx, type=pa.int64()))
        .append_column("tile_y", pa.array(ty, type=pa.int64()))
        .append_column("cell", pa.array(cell, type=pa.int64()))
    )


def add_geocode(ds, z: int = C.Z_JOIN):
    return ds.map_batches(lambda b: geocode_batch(b, z=z), batch_format="pyarrow")
