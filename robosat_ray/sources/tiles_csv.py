"""Tiles-CSV source/sink, matching the reference's line format
`x,y,z` (robosat/tiles.py:103-120 parses `mercantile.Tile(*map(int,
row))` with x,y,z column order; writer at tools/cover.py:35-37).
Blank lines are skipped like the reference's `if row` guard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def tiles_from_csv(path: str):
    """-> Dataset (tile_x, tile_y, z) from an x,y,z CSV (no header)."""
    import ray.data

    ds = ray.data.read_csv(
        path,
        read_options=__import__("pyarrow.csv", fromlist=["ReadOptions"]).ReadOptions(
            column_names=["x", "y", "z"]
        ),
    )

    def clean(batch: pa.Table) -> pa.Table:
        x = batch.column("x")
        valid = pa.compute.is_valid(x)
        batch = batch.filter(valid)
        return pa.table(
            {
                "tile_x": batch.column("x").cast(pa.int64()),
                "tile_y": batch.column("y").cast(pa.int64()),
                "z": batch.column("z").cast(pa.int64()),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def tiles_to_csv(ds, path: str):
    """Write (tile_x, tile_y[, z]) rows as x,y,z CSV (single file,
    deterministic order — the reference's small-artifact format; big
    tile sets go to parquet via runtime.resume.write_partitioned)."""
    pdf = ds.to_pandas()
    if "z" not in pdf.columns:
        from robosat_ray import constants as C

        pdf["z"] = C.Z_JOIN
    pdf = pdf.sort_values(["z", "tile_x", "tile_y"], kind="stable")
    with open(path, "w") as f:
        for r in pdf.itertuples():
            f.write(f"{int(r.tile_x)},{int(r.tile_y)},{int(r.z)}\n")
