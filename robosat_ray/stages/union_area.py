"""Exact polygon-union (dissolve) AREA per region — the GIS dissolve
step as arithmetic: the union area of each region's building rects on
the integer lattice, computed by an x-strip scanline with per-strip
y-interval union (reference parity: robosat's merge tool unions
overlapping predicted polygons, /root/reference/robosat/tools/
merge.py; this computes the union's AREA exactly instead of its
outline).

Spec (mirrored bit-for-bit in oracle.UNION_AREA):
- rects = kind='building' footprints, corners quantized to
  (lon * 1e6, my * 1e8) with floor(+0.5); region = hull.region_group;
- x-boundaries = distinct x0/x1 per region; for each strip
  [xb_i, xb_{i+1}) the covering rects' y-intervals are unioned with
  the gaps-and-islands rule (new island when y0 > max of previous
  y1 — touching intervals MERGE), identical to the INTERVAL_UNION
  oracle; area = sum of strip_width x island_length. Total area is
  bounded by the world box (3.6e16), int64-safe.

Scale shape: ONE region-group shuffle; inside a group the strip
expansion is a vectorized repeat (incidences = sum of strips spanned
per rect — bounded by overlap density, the scanline's contract), the
island sweep is one lexsort + C-speed grouped cummax, zero per-strip
Python. Group count is fixed; shuffle volume is rect-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

XSCALE = 1_000_000.0
YSCALE = 100_000_000.0


def _region_area(g: pd.DataFrame) -> pd.DataFrame:
    x0 = g["x0"].to_numpy(np.int64)
    x1 = g["x1"].to_numpy(np.int64)
    y0 = g["y0"].to_numpy(np.int64)
    y1 = g["y1"].to_numpy(np.int64)
    gid = int(g["g"].iloc[0])
    xb = np.unique(np.concatenate([x0, x1]))
    if len(xb) < 2:
        return pd.DataFrame({"g": [gid], "area": np.array([0], np.int64)})
    # strip i = [xb[i], xb[i+1]); rect covers strips [pos(x0), pos(x1))
    lo = np.searchsorted(xb, x0)
    hi = np.searchsorted(xb, x1)
    reps = hi - lo
    idx = np.repeat(np.arange(len(x0)), reps)
    local = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps
    )
    strip = np.repeat(lo, reps) + local
    sy0, sy1 = y0[idx], y1[idx]
    order = np.lexsort((sy1, sy0, strip))
    strip, sy0, sy1 = strip[order], sy0[order], sy1[order]
    n = len(strip)
    if n == 0:
        return pd.DataFrame({"g": [gid], "area": np.array([0], np.int64)})
    # per-strip EXCLUSIVE running max of y1 (grouped cummax + shift)
    sgrp = pd.Series(strip)
    incl = pd.Series(sy1).groupby(sgrp).cummax()
    prevmax = incl.groupby(sgrp).shift(1)
    new_island = (prevmax.isna() | (pd.Series(sy0) > prevmax)).to_numpy()
    isl = np.cumsum(new_island) - 1
    n_isl = int(isl[-1]) + 1
    first = np.flatnonzero(new_island)
    st = sy0[first]  # islands start at their min y0 (sorted ascending)
    en = np.zeros(n_isl, dtype=np.int64)
    np.maximum.at(en, isl, sy1)
    width = (xb[1:] - xb[:-1])[strip[first]]
    area = int(((en - st) * width).sum())
    return pd.DataFrame({"g": [gid], "area": np.array([area], np.int64)})


def union_area(feet_ds):
    """footprints -> (g, area): exact union area of building rects per
    region group on the integer lattice."""
    from robosat_ray.stages.hull import region_group

    def prep(b: pa.Table) -> pa.Table:
        m = pa.compute.equal(b.column("kind"), "building")
        t = b.filter(m)
        k = t.column("feature_id").to_numpy()
        return pa.table(
            {
                "g": pa.array(region_group(k)),
                "x0": pa.array(
                    np.floor(t.column("minx").to_numpy() * XSCALE + 0.5).astype(
                        np.int64
                    )
                ),
                "y0": pa.array(
                    np.floor(t.column("miny").to_numpy() * YSCALE + 0.5).astype(
                        np.int64
                    )
                ),
                "x1": pa.array(
                    np.floor(t.column("maxx").to_numpy() * XSCALE + 0.5).astype(
                        np.int64
                    )
                ),
                "y1": pa.array(
                    np.floor(t.column("maxy").to_numpy() * YSCALE + 0.5).astype(
                        np.int64
                    )
                ),
            }
        )

    return (
        feet_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("g")
        .map_groups(_region_area, batch_format="pandas")
    )
