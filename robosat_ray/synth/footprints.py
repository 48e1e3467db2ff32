"""Synthesize the `footprints` polygon table (role of robosat's OSM
extract output — reference robosat/osm/{parking,building,road}.py emit
GeoJSON polygon features) deterministically from the driver's `part`
table.

Round-1 footprints are axis-aligned rectangles in the (lon, my) plane,
carried as general closed rings so every downstream kernel (PIP,
STRtree, IoU, union-merge) runs its general-polygon code path while the
DuckDB oracle can express the same predicates as range comparisons.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C


def footprint_rects(partkey: np.ndarray, p_size: np.ndarray):
    """p_partkey, p_size -> (minx, miny, maxx, maxy) rect in (lon, my).

    Exact-op chain (mirrored in SQL):
      g1 = (k * G1_MUL + G1_ADD) % 2^32 ; v1 = g1 / 2^32
      g2 = (k * G2_MUL + G2_ADD) % 2^32 ; v2 = g2 / 2^32
      city rows (k % 10 < 6): cx = CITY_LON[k % 8] + (v1 - 0.5) * 0.2
                              cy = CITY_MY[k % 8] + (v2 - 0.5) * 0.0005
      background:             cx = v1 * 360.0 - 180.0 ; cy = 0.2 + v2 * 0.6
      hw = FOOT_HW_BASE + (p_size % 10) * FOOT_HW_STEP
      hh = FOOT_HH_BASE + (p_size % 10) * FOOT_HH_STEP
      rect = (cx - hw, cy - hh, cx + hw, cy + hh)
    """
    k = np.asarray(partkey, dtype=np.int64)
    sz = np.asarray(p_size, dtype=np.int64)
    cx, cy = footprint_centers(k)
    hw = C.FOOT_HW_BASE + (sz % 10).astype(np.float64) * C.FOOT_HW_STEP
    hh = C.FOOT_HH_BASE + (sz % 10).astype(np.float64) * C.FOOT_HH_STEP
    return cx - hw, cy - hh, cx + hw, cy + hh


def footprint_centers(partkey: np.ndarray):
    """p_partkey -> exact footprint center (cx, cy) in (lon, my) —
    the cx/cy sub-chain of footprint_rects, exposed separately because
    (minx+maxx)/2 does NOT round back to cx in IEEE arithmetic (both
    the map-matching stage and its SQL twin must recompute the center
    from scratch with this exact op order)."""
    k = np.asarray(partkey, dtype=np.int64)
    g1 = (k.astype(np.uint64) * np.uint64(C.G1_MUL) + np.uint64(C.G1_ADD)) % np.uint64(C.MOD32)
    g2 = (k.astype(np.uint64) * np.uint64(C.G2_MUL) + np.uint64(C.G2_ADD)) % np.uint64(C.MOD32)
    v1 = g1.astype(np.float64) / float(C.MOD32)
    v2 = g2.astype(np.float64) / float(C.MOD32)
    is_city = (k % 10) < 6
    city = (k % 8).astype(np.int64)
    clon = np.asarray(C.CITY_LON, dtype=np.float64)[city]
    cmy = np.asarray(C.CITY_MY, dtype=np.float64)[city]
    cx = np.where(is_city, clon + (v1 - 0.5) * C.CITY_LON_SPAN, v1 * 360.0 - 180.0)
    cy = np.where(is_city, cmy + (v2 - 0.5) * C.CITY_MY_SPAN, C.BG_MY_LO + v2 * C.BG_MY_RANGE)
    return cx, cy


def rect_rings(minx, miny, maxx, maxy):
    """Vectorized: rects -> Arrow list<list<struct<x,y>>> closed rings
    (single exterior ring each, wound CCW-on-screen in a y-down plane)."""
    n = len(minx)
    # ring vertex order: (minx,miny) (maxx,miny) (maxx,maxy) (minx,maxy) close
    xs = np.stack([minx, maxx, maxx, minx, minx], axis=1).reshape(-1)
    ys = np.stack([miny, miny, maxy, maxy, miny], axis=1).reshape(-1)
    pts = pa.StructArray.from_arrays(
        [pa.array(xs, type=pa.float64()), pa.array(ys, type=pa.float64())],
        names=["x", "y"],
    )
    ring = pa.ListArray.from_arrays(pa.array(np.arange(n + 1) * 5, type=pa.int32()), pts)
    rings = pa.ListArray.from_arrays(pa.array(np.arange(n + 1), type=pa.int32()), ring)
    return rings


def make_footprints_batch(batch: pa.Table) -> pa.Table:
    k = batch.column("p_partkey").to_numpy()
    sz = batch.column("p_size").to_numpy()
    minx, miny, maxx, maxy = footprint_rects(k, sz)
    kinds = np.asarray(C.FOOT_KINDS, dtype=object)[(k % 4).astype(np.int64)]
    return pa.table(
        {
            "feature_id": pa.array(k, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "minx": pa.array(minx, type=pa.float64()),
            "miny": pa.array(miny, type=pa.float64()),
            "maxx": pa.array(maxx, type=pa.float64()),
            "maxy": pa.array(maxy, type=pa.float64()),
            "rings": rect_rings(minx, miny, maxx, maxy),
        }
    )


def footprints_dataset(sf_dir: str, **read_kwargs):
    """Streaming footprints Dataset from `{sf_dir}/part.parquet`."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"], **read_kwargs
    )
    return ds.map_batches(make_footprints_batch, batch_format="pyarrow")


# predicted-shape jitter: mode = p_partkey % 3 shifts the rect by
# shift_frac[mode] * half_width in +x => pairwise IoU (2-s)/(2+s):
# mode 0 -> 0.818 (dropped at threshold 0.5), 1 -> 0.429 (kept),
# 2 -> disjoint (kept). Mirrored in SQL (oracle.py preds_cte).
PRED_SHIFT = [0.2, 0.8, 2.5]


def predicted_rects(partkey: np.ndarray, p_size: np.ndarray):
    """Synthesize 'predicted' rects (role of the model's featurized
    output) as deterministic jitters of the reference footprints —
    controlled IoU levels for dedupe threshold tests (FIXTURES.md §2)."""
    minx, miny, maxx, maxy = footprint_rects(partkey, p_size)
    k = np.asarray(partkey, dtype=np.int64)
    sz = np.asarray(p_size, dtype=np.int64)
    hw = C.FOOT_HW_BASE + (sz % 10).astype(np.float64) * C.FOOT_HW_STEP
    shift = np.asarray(PRED_SHIFT, dtype=np.float64)[(k % 3).astype(np.int64)] * hw
    return minx + shift, miny, maxx + shift, maxy


def make_predicted_batch(batch: pa.Table) -> pa.Table:
    k = batch.column("p_partkey").to_numpy()
    sz = batch.column("p_size").to_numpy()
    minx, miny, maxx, maxy = predicted_rects(k, sz)
    return pa.table(
        {
            "pred_id": pa.array(k, type=pa.int64()),
            "minx": pa.array(minx, type=pa.float64()),
            "miny": pa.array(miny, type=pa.float64()),
            "maxx": pa.array(maxx, type=pa.float64()),
            "maxy": pa.array(maxy, type=pa.float64()),
            "rings": rect_rings(minx, miny, maxx, maxy),
        }
    )


def predicted_dataset(sf_dir: str, **read_kwargs):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"], **read_kwargs
    )
    return ds.map_batches(make_predicted_batch, batch_format="pyarrow")


def footprints_table(sf_dir: str) -> pa.Table:
    """Driver/test helper: the full footprints table via pyarrow (small)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    return make_footprints_batch(t)
